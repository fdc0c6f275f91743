"""Serializing calculators: pytree checkpoints with orbax.

Counterpart of reference example 09 (metatomic MD-model export): the
serialization story here is standard JAX — calculators are pytrees, so orbax
(or pickle) round-trips them, including trainable CombinedPotential weights.
"""

import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

import torchpme_tpu as tpme

jax.config.update("jax_enable_x64", True)

smearing = 0.8
model = tpme.CombinedPotential(
    [
        tpme.CoulombPotential(smearing=smearing),
        tpme.InversePowerLawPotential(exponent=3, smearing=smearing),
    ],
    initial_weights=jnp.asarray([0.9, 0.1]),
    smearing=smearing,
)
calc = tpme.EwaldCalculator(model, lr_wavelength=0.4)

# save only the numeric state (leaves); the structure is code
leaves, treedef = jax.tree_util.tree_flatten(calc)
with tempfile.TemporaryDirectory() as tmp:
    path = Path(tmp) / "ckpt"
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, [np.asarray(leaf) for leaf in leaves])
    restored_leaves = ckpt.restore(path)
    ckpt.close()

restored = jax.tree_util.tree_unflatten(treedef, restored_leaves)

# the restored calculator computes identically
positions = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
charges = jnp.asarray([[1.0], [-1.0]])
cell = jnp.eye(3)
idx = jnp.asarray([[0, 1]])
d = jnp.asarray([0.866])
np.testing.assert_allclose(
    restored(charges, cell, positions, idx, d),
    calc(charges, cell, positions, idx, d),
)
print("orbax round trip ✓ — weights:", np.asarray(restored.potential.weights))
