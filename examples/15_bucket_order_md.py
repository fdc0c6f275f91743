"""Bucket-order MD states: zero-gather steps, GROMACS-style.

The fast path of ``example 14`` still takes atom-order positions, so every
step pays one O(atoms) row gather into bucket order (plus its scatter
transpose in the force pass).  Production MD loops avoid this by *storing*
the state in bucket order and re-sorting only when the neighbor structure
is rebuilt:

* :class:`~torchpme_tpu.MDFastPath` — charges/PME.  ``mesh_impl="auto"``
  additionally picks the *tile-aligned* state on TPU when the geometry
  allows (one 8-mesh-cell tile per x/y cell-list cell): the cell-bucket
  rows then double as mesh-tile slots, so the step performs **no** mesh
  gather or scatter at all and the density is spread by a single fused
  Pallas kernel with a derivative-stencil force VJP.
* :class:`~torchpme_tpu.MDFastPathDipole` — point dipoles, same row
  discipline over the dipolar window engine.

Both NaN-poison when an atom drifts out of its cell, and
``rebucket()`` rebuilds like a neighbor-list refresh.
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme

rng = np.random.default_rng(0)
n, box = 240, 14.0
cell = jnp.asarray(np.eye(3) * box, jnp.float32)
positions = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
charges = jnp.asarray(
    np.tile([1.0, -1.0], n // 2).reshape(-1, 1), jnp.float32
)

calc = tpme.PMECalculator(
    tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.9,
    interpolation_nodes=4,
)
# tile edge = 14/ (32/8) = 3.5 >= cutoff 3.0: the aligned state qualifies
# ("auto" picks it on TPU; force it here so the example exercises it even
# on CPU, where the kernels run in interpret mode)
fp = tpme.MDFastPath.create(
    calc, positions, cell, cutoff=3.0, ns_mesh=(32, 32, 32),
    mesh_impl="aligned",
)
rows = fp.bucket(positions)

step = jax.jit(jax.value_and_grad(fp.energy, argnums=2))

# a few steepest-descent steps, all in row layout (padded rows get zero
# force and never move)
dt = 1e-4
for _ in range(3):
    e, g = step(charges, cell, rows)
    rows = rows - dt * g
print(f"energy after 3 row-layout steps: {float(e):.4f}")
assert np.isfinite(float(e))

# drift an atom out of its cell: the step NaN-poisons, rebucket recovers
bad = rows.at[fp.row_of_atom[0]].add(jnp.asarray([4.0, 0, 0], jnp.float32))
e_stale, _ = step(charges, cell, bad)
print("stale step is NaN:", bool(np.isnan(float(e_stale))))
fp2 = fp.rebucket(bad, cell)
e_fresh = fp2.energy(charges, cell, fp2.bucket(fp.unbucket(bad)))
print("rebucketed energy finite:", bool(np.isfinite(float(e_fresh))))

# the dipolar twin
dipoles = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
dcalc = tpme.CalculatorDipole(
    tpme.PotentialDipole(smearing=1.0), lr_wavelength=2.0
)
dfp = tpme.MDFastPathDipole.create(dcalc, positions, cell, cutoff=3.0)
drows = dfp.bucket(positions)
e_d, f_d = jax.jit(jax.value_and_grad(dfp.energy, argnums=2))(
    dipoles, cell, drows
)
print(f"dipolar energy: {float(e_d):.6f}, |F|max: {float(jnp.abs(f_d).max()):.4f}")
assert np.isfinite(float(e_d))
