"""Splined potentials: numerical kernels from tabulated values.

Counterpart of reference example 06: build a ``SplinePotential`` from (r, y)
samples of a Yukawa (screened-Coulomb) potential; the Fourier-domain kernel
is computed automatically by the analytic radial spline FT, so the splined
potential works in any k-space calculator.
"""

import jax.numpy as jnp
import numpy as np

from torchpme_tpu import SplinePotential

kappa = 1.2  # screening length⁻¹
r = jnp.geomspace(0.05, 30.0, 512)
y = jnp.exp(-kappa * r) / r  # Yukawa

pot = SplinePotential(r, y, reciprocal=True, y_at_zero=float(y[0]))

r_test = jnp.linspace(0.2, 10.0, 8)
print("splined vs exact Yukawa:")
for ri, vs in zip(r_test, pot.lr_from_dist(r_test)):
    exact = float(jnp.exp(-kappa * ri) / ri)
    print(f"  r={float(ri):5.2f}  spline={float(vs):.6f}  exact={exact:.6f}")

# the automatically computed k-space kernel matches the analytic Yukawa FT
k_sq = jnp.linspace(0.5, 20.0, 6)
exact_ft = 4 * jnp.pi / (k_sq + kappa**2)
print("\nk-space kernel vs analytic 4π/(k²+κ²):")
print(np.stack([np.asarray(pot.lr_from_k_sq(k_sq)), np.asarray(exact_ft)]))
