"""Dipolar Ewald: magnetostatics / polarization energies and fields.

Point dipoles interact through the 1/r³ tensor kernel; the calculator
returns per-atom potential *vectors* (the local field), and autodiff gives
forces and dipole gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torchpme_tpu import CalculatorDipole, PotentialDipole

jax.config.update("jax_enable_x64", True)

# three parallel dipoles along a line
positions = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 4.0, 0.0]])
dipoles = jnp.asarray([[1.0, 1.0, 0.0]] * 3)
cell = jnp.eye(3) * 10.0
indices = jnp.asarray([[0, 1], [1, 2], [0, 2]])

calc = CalculatorDipole(
    PotentialDipole(smearing=(1 / 2) ** 0.5),  # espressomd alpha = 1
    lr_wavelength=0.1,
)


def energy(positions, dipoles):
    vectors = positions[indices[:, 1]] - positions[indices[:, 0]]
    field = calc(dipoles, cell, positions, indices, vectors)
    return jnp.sum(field * dipoles)


E, (forces, dipole_grads) = jax.value_and_grad(energy, argnums=(0, 1))(
    positions, dipoles
)
print(f"dipolar Ewald energy: {float(E):.10f}  (espressomd DipolarP3M: -0.30848575)")
print("forces on atoms:\n", -np.asarray(forces))
print("local field (dE/dμ):\n", np.asarray(dipole_grads))
