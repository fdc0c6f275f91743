"""TIP4P-style virtual sites: forces on real atoms via the chain rule.

Counterpart of reference example 11: charge sites (the "M site") are a
differentiable function of the real atom positions; autodiff pushes the
forces from the virtual sites back onto the physical atoms automatically.
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme
from torchpme_tpu.utils.neighbors import neighbor_list

jax.config.update("jax_enable_x64", True)

# two rigid water-like molecules: O, H, H per molecule
rng = np.random.default_rng(0)
box = 6.0
o_pos = jnp.asarray([[1.5, 1.5, 1.5], [4.0, 4.0, 4.0]])
h_off = jnp.asarray([[0.76, 0.59, 0.0], [-0.76, 0.59, 0.0]])
cell = jnp.eye(3) * box
GAMMA = 0.73  # M-site displacement fraction along the bisector
Q_M, Q_H = -1.04, 0.52


def site_positions(o_pos):
    """Real atoms -> charge sites (O replaced by the M site)."""
    h1 = o_pos + h_off[0]
    h2 = o_pos + h_off[1]
    m = o_pos + GAMMA * ((h1 + h2) / 2 - o_pos)
    return jnp.concatenate([m, h1, h2], axis=0)


sites0 = site_positions(o_pos)
charges = jnp.asarray([[Q_M], [Q_M], [Q_H], [Q_H], [Q_H], [Q_H]])
indices, _, shifts = neighbor_list(np.asarray(sites0), np.asarray(cell), 2.9)
indices, shifts = jnp.asarray(indices), jnp.asarray(shifts)

calc = tpme.EwaldCalculator(tpme.CoulombPotential(smearing=0.6), lr_wavelength=0.3)
ns_k = calc.get_ns_kvectors(cell)


def energy(o_pos):
    sites = site_positions(o_pos)
    vec = sites[indices[:, 1]] - sites[indices[:, 0]] + shifts.astype(cell.dtype) @ cell
    d = jnp.linalg.norm(vec, axis=1)
    pot = calc(charges, cell, sites, indices, d, ns_kvectors=ns_k)
    return jnp.sum(pot * charges)


e, forces_on_oxygens = jax.value_and_grad(energy)(o_pos)
print(f"energy: {float(e):.6f}")
print("forces on the real O atoms (chain rule through the M sites):")
print(-np.asarray(forces_on_oxygens))
