"""Multi-channel charges: species-resolved potentials in one pass.

Counterpart of reference example 01: pass one-hot species encodings as
"charges" with several channels to get per-species potential contributions —
the building block for long-range ML features.
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme
from torchpme_tpu.utils.neighbors import neighbor_list

jax.config.update("jax_enable_x64", True)

# NaCl cubic cell: 4 Na+ (type 0), 4 Cl- (type 1)
positions = jnp.asarray(
    [[0.0, 0, 0], [1, 1, 0], [1, 0, 1], [0, 1, 1],
     [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]]
)
types = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1])
cell = 2 * jnp.eye(3)

# channel 0 = Na sublattice, channel 1 = Cl sublattice (one-hot)
onehot = jax.nn.one_hot(types, 2)
indices, distances, _ = map(
    jnp.asarray, neighbor_list(np.asarray(positions), np.asarray(cell), 0.99)
)

calc = tpme.EwaldCalculator(tpme.CoulombPotential(smearing=0.2), lr_wavelength=0.1)
per_species = calc(onehot, cell, positions, indices, distances)
print("potential from Na / from Cl at each atom:")
print(np.asarray(per_species))

# physical potential = (+1)·channel_Na + (−1)·channel_Cl
physical = per_species @ jnp.asarray([1.0, -1.0])
charges = (onehot @ jnp.asarray([1.0, -1.0]))[:, None]
ref = calc(charges, cell, positions, indices, distances)
assert np.allclose(physical[:, None], ref)
print("channel combination matches the physical potential ✓")
