"""Tuning deep dive: error maps over the parameter grid.

Counterpart of reference example 10: the error-bound estimators are pure
jittable functions, so scanning smearing × mesh-spacing maps is a vectorized
evaluation (the reference needs a Python loop of module calls).
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchpme_tpu.tuning import PMEErrorBounds

jax.config.update("jax_enable_x64", True)

charges = jnp.asarray(np.tile([1.0, -1.0], 32).reshape(-1, 1))
cell = jnp.eye(3) * 8.0
rng = np.random.default_rng(0)
positions = jnp.asarray(rng.uniform(0, 8, (64, 3)))

bounds = PMEErrorBounds(charges, cell, positions)

smearings = jnp.linspace(0.4, 2.0, 17)
spacings = jnp.linspace(0.2, 1.6, 15)

# fully vectorized error map — one vmap-of-vmap over the pure bound
error_map = jax.vmap(
    lambda s: jax.vmap(
        lambda h: bounds.err_kspace(s, h, 4)
    )(spacings)
)(smearings)

total_map = jnp.sqrt(error_map**2 + jax.vmap(lambda s: bounds.err_rspace(s, 4.0))(smearings)[:, None] ** 2)

best = jnp.unravel_index(jnp.argmin(total_map), total_map.shape)
print(f"error map shape: {total_map.shape}")
print(
    f"best (smearing, spacing) = ({float(smearings[best[0]]):.2f}, "
    f"{float(spacings[best[1]]):.2f}) with bound {float(total_map[best]):.2e}"
)
# gradients of the bound itself (impossible in the float-only reference API)
dsmear = jax.grad(lambda s: bounds.err_kspace(s, 0.5, 4))(1.0)
print(f"d(err_k)/d(smearing) at σ=1: {float(dsmear):.3e}")
