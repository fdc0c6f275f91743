"""Multi-chip MD: the slab-sharded fast path over a device mesh.

The single-chip fast path (examples 14/15) becomes SPMD by slab-decomposing
both engines along x (``parallel/sharded_md.py``):

* **real space** — each device runs the cell-list window on its x-slab of
  cells plus ONE ``ppermute``-fetched halo cell plane;
* **k space** — per-slab tile-GEMM spread, ring skirt folds, and the
  distributed Parseval quadratic form (one ``all_to_all`` spectrum swap);
* collectives are O(atoms/slab-surface) and O(mesh/D) — nothing carries the
  full mesh, and there is no pair or element scatter on any device.

Two entries:

* ``sharded_md_energy`` — replicated atom-order positions (simple, but each
  step pays a per-device gather and a cross-device force all-reduce);
* ``sharded_md_energy_rows`` — positions *live* device-sharded in bucket-row
  layout (``state.bucket``), forces come back in the same sharded layout
  with **no global reduction**: the production multi-chip layout.

With ``aligned=True`` (tile edge ≥ cutoff, ``nx/8`` divisible by the device
count, float32 state) the rows entry additionally drops every mesh-side
gather: each device's bucket rows double as its mesh-tile slots and the
fused Pallas spread runs per slab — the sharded analog of the single-chip
``mesh_impl="aligned"`` state of example 15.

Run under pytest (8 virtual CPU devices from ``tests/conftest.py``) or any
host with ≥ 8 JAX devices.
"""

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme
from torchpme_tpu.parallel import (
    compute_sharded_md_state,
    sharded_md_energy,
    sharded_md_energy_rows,
)

if len(jax.devices()) < 8:
    print(
        "sharded MD example needs >= 8 devices (run under pytest, which "
        f"provisions 8 virtual CPU devices); found {len(jax.devices())}"
    )
    raise SystemExit(0)

from jax.sharding import Mesh

mesh = Mesh(np.array(jax.devices()[:8]), ("atoms",))

rng = np.random.default_rng(7)
n, box, cutoff = 200, 10.0, 1.0
positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
charges = jnp.asarray(np.tile([1.0, -1.0], n // 2).reshape(-1, 1))
cell = jnp.eye(3) * box
ns_mesh = (128, 16, 16)  # nx/8 = 16 mesh planes per device slab

calc = tpme.PMECalculator(
    tpme.CoulombPotential(smearing=0.45), interpolation_nodes=4
)

# host-side slab bucketing (refresh like a neighbor list); rows=True also
# builds the bucket-row tables for the sharded rows entry
state = compute_sharded_md_state(
    calc, positions, cell, cutoff, ns_mesh, n_devices=8, rows=True
)

# --- atom-order entry ------------------------------------------------------
e_atom, forces_atom = jax.jit(
    jax.value_and_grad(
        lambda p: sharded_md_energy(calc, mesh, charges, cell, p, state),
    )
)(positions)

# --- rows entry: positions sharded, forces sharded -------------------------
rows = state.bucket(positions)
step = jax.jit(
    jax.value_and_grad(
        lambda r: sharded_md_energy_rows(calc, mesh, charges, cell, r, state)
    )
)
e_rows, f_rows = step(rows)

# single-chip oracle
clist = tpme.ops.compute_cell_list(positions, cell, cutoff)
e_ref = calc.energy(charges, cell, positions, cell_list=clist, ns_mesh=ns_mesh)

print(f"atom-order sharded energy: {float(e_atom):+.10f}")
print(f"rows       sharded energy: {float(e_rows):+.10f}")
print(f"single-chip reference:     {float(e_ref):+.10f}")
assert abs(float(e_rows) - float(e_ref)) < 1e-10 * abs(float(e_ref))

f_unbucketed = state.unbucket(f_rows)
print(
    "force agreement (rows vs atom-order):",
    float(jnp.max(jnp.abs(f_unbucketed - forces_atom))),
)

# a few Verlet-flavored steps entirely in the sharded row layout
dt = 1e-4
r = rows
for i in range(3):
    e, g = step(r)
    r = r - dt * g  # steepest descent, for brevity
    print(f"step {i}: E = {float(e):+.8f}")
print("drifted rows stay finite:", bool(jnp.all(jnp.isfinite(r))))

# --- tile-ALIGNED rows: zero mesh-side gathers (float32 state) --------------
# This 10.0 box cannot align a 128-plane mesh (tile edge 10/16 < cutoff), so
# demonstrate on a 16.0 box where tile edge = 16/16 = 1.0 = cutoff.
box_al = 16.0
pos_al = jnp.asarray(rng.uniform(0, box_al, (n, 3)), jnp.float32)
cell_al = jnp.eye(3, dtype=jnp.float32) * box_al
q_al = charges.astype(jnp.float32)
state_al = compute_sharded_md_state(
    calc, pos_al, cell_al, cutoff, ns_mesh, n_devices=8, aligned=True
)
rows_al = state_al.bucket(pos_al)
e_al, f_al = jax.jit(
    jax.value_and_grad(
        lambda r: sharded_md_energy_rows(calc, mesh, q_al, cell_al, r, state_al)
    )
)(rows_al)
clist_al = tpme.ops.compute_cell_list(pos_al, cell_al, cutoff)
e_al_ref = calc.energy(
    q_al.astype(jnp.float64),
    cell_al.astype(jnp.float64),
    pos_al.astype(jnp.float64),
    cell_list=clist_al,
    ns_mesh=ns_mesh,
)
print(f"aligned rows sharded energy: {float(e_al):+.8f} (f64 ref {float(e_al_ref):+.8f})")
assert abs(float(e_al) - float(e_al_ref)) < 1e-4 * max(1.0, abs(float(e_al_ref)))
assert bool(jnp.all(jnp.isfinite(f_al)))
