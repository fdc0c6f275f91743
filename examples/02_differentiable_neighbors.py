"""Forces through a precomputed neighbor list.

Counterpart of reference example 02: neighbor lists are *inputs* — to get
forces, recompute the pair distances from positions and cell shifts inside
the differentiated function so gradients flow.
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme
from torchpme_tpu.utils.neighbors import compute_distances, neighbor_list

jax.config.update("jax_enable_x64", True)

rng = np.random.default_rng(0)
box = 6.0
positions = jnp.asarray(rng.uniform(0, box, (16, 3)))
charges = jnp.asarray(np.tile([1.0, -1.0], 8).reshape(-1, 1))
cell = jnp.eye(3) * box

indices_np, _, shifts_np = neighbor_list(np.asarray(positions), np.asarray(cell), 2.5)
indices, shifts = jnp.asarray(indices_np), jnp.asarray(shifts_np)

calc = tpme.EwaldCalculator(tpme.CoulombPotential(smearing=0.5), lr_wavelength=0.25)
ns_k = calc.get_ns_kvectors(cell)


def total_energy(positions, cell):
    # THE key pattern: distances recomputed here, not precomputed outside
    d = compute_distances(positions, indices, cell=cell, neighbor_shifts=shifts)
    pot = calc(charges, cell, positions, indices, d, ns_kvectors=ns_k)
    return jnp.sum(pot * charges)


energy, forces = jax.value_and_grad(total_energy)(positions, cell)
forces = -forces
print(f"energy: {float(energy):.6f}")
print(f"net force (should vanish): {np.abs(np.asarray(forces.sum(0))).max():.2e}")
