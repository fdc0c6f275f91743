"""Dipolar PME: O(N log N) k-space for point dipoles.

The dipolar Ewald calculator's structure-factor sum is O(N·n_k), which
caps dipolar MD around 10k atoms.  `PMECalculatorDipole` replaces it with a
mesh pipeline (gradient-stencil spread → scalar k-filter → gradient-stencil
gather) — a capability the reference library does not have — and is a
drop-in for `CalculatorDipole`, so the dipolar MD fast path composes with
it unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme
from torchpme_tpu.ops.rspace_cells import compute_cell_list

jax.config.update("jax_enable_x64", True)

rng = np.random.default_rng(0)
n, box = 400, 14.0
positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
dipoles = jnp.asarray(rng.normal(size=(n, 3)))
cell = jnp.eye(3) * box
cutoff, smearing = 3.5, 1.0

pme = tpme.PMECalculatorDipole(
    tpme.PotentialDipole(smearing=smearing), mesh_spacing=0.5
)
ewald = tpme.CalculatorDipole(
    tpme.PotentialDipole(smearing=smearing), lr_wavelength=0.6
)

# the dipolar MD fast path runs unchanged on the mesh calculator: its
# `get_ns_kvectors` hook serves the static mesh shape instead of Ewald
# k-space extents, and the k-space term becomes O(mesh) instead of O(N·n_k)
fp = tpme.MDFastPathDipole.create(pme, positions, cell, cutoff)
rows = fp.bucket(positions)
step = jax.jit(jax.value_and_grad(fp.energy, argnums=2))
E, force_rows = step(dipoles, cell, rows)
forces = -fp.unbucket(force_rows)

# cross-check against the O(N·n_k) Ewald dipolar calculator (default
# cost-model capacity + spill — the fast path's spill-mode capacity is a
# *tight* per-cell bound and must not be reused as a no-spill capacity)
clist = compute_cell_list(positions, cell, cutoff)
E_ew = ewald.energy(
    dipoles, cell, positions, cell_list=clist,
    ns_kvectors=ewald.get_ns_kvectors(cell),
)
rel = abs(float(E - E_ew)) / abs(float(E_ew))
print(f"dipolar PME MD step:  E = {float(E):+.8f}")
print(f"dipolar Ewald check:  E = {float(E_ew):+.8f}  (rel diff {rel:.2e})")
assert rel < 5e-5
print(f"max |force| = {float(jnp.max(jnp.abs(forces))):.4f}")
