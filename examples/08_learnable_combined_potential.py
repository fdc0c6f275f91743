"""Optimizing the weights of a CombinedPotential with optax.

Counterpart of reference example 08: the combination weights are ordinary
pytree leaves, so a standard JAX training loop (here optax SGD) fits them to
target energies — no special "parameter" machinery.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import torchpme_tpu as tpme
from torchpme_tpu.utils.neighbors import neighbor_list

jax.config.update("jax_enable_x64", True)

rng = np.random.default_rng(1)
box, smearing = 5.0, 0.8
positions = jnp.asarray(rng.uniform(0, box, (12, 3)))
charges = jnp.asarray(np.tile([1.0, -1.0], 6).reshape(-1, 1))
cell = jnp.eye(3) * box
indices, distances, _ = map(
    jnp.asarray, neighbor_list(np.asarray(positions), np.asarray(cell), 2.0)
)

# "ground truth": pure Coulomb (weights [1, 0])
target_pot = tpme.CoulombPotential(smearing=smearing)
target_calc = tpme.EwaldCalculator(target_pot, lr_wavelength=smearing / 2)
kv = target_calc.compute_kvectors(cell)
target = jnp.sum(target_calc(charges, cell, positions, indices, distances, kvectors=kv) * charges)

# model: learnable mix of 1/r and 1/r²
model = tpme.CombinedPotential(
    [
        tpme.CoulombPotential(smearing=smearing),
        tpme.InversePowerLawPotential(exponent=2, smearing=smearing),
    ],
    initial_weights=jnp.asarray([0.3, 0.7]),
    smearing=smearing,
)


def loss_fn(weights):
    pot = tpme.CombinedPotential(
        list(model.potentials), initial_weights=weights, smearing=smearing
    )
    calc = tpme.EwaldCalculator(pot, lr_wavelength=smearing / 2)
    pred = jnp.sum(calc(charges, cell, positions, indices, distances, kvectors=kv) * charges)
    return (pred - target) ** 2


optimizer = optax.adam(5e-2)
weights = model.weights
opt_state = optimizer.init(weights)
step = jax.jit(jax.value_and_grad(loss_fn))
for it in range(200):
    loss, grads = step(weights)
    updates, opt_state = optimizer.update(grads, opt_state)
    weights = optax.apply_updates(weights, updates)

print(f"final loss {float(loss):.3e}, learned weights {np.asarray(weights)}")
