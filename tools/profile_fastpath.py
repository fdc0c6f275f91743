"""Component timing of the current production step (MDFastPath, bucket rows).

Chained-fori_loop pattern, one host sync per chain (see profile_step.py for
why).  ~2.5 ms chain floor on the axon tunnel: standalone components timed
below ~3 ms are floored — only deltas on the full step are meaningful there.

    python tools/profile_fastpath.py          # TPU (default env)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

N_ATOMS = int(os.environ.get("BENCH_N", 102_000))
CUTOFF = 5.0
CHAIN = 10
REPS = 3


def timed(name, fn, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(REPS):
        t0 = time.monotonic()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.monotonic() - t0) / CHAIN)
    ms = float(np.median(times) * 1e3)
    print(f"{name:<44s} {ms:8.2f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    import torchpme_tpu as tpme
    from bench import build_system, choose_parameters
    from torchpme_tpu.ops.mesh_tiled import (
        refresh_tiled_interpolation,
        tiled_points_to_mesh,
    )
    from torchpme_tpu.ops.kspace import (
        compute_kspace_filter,
        kspace_filter_quadratic_dft,
    )
    from torchpme_tpu.ops.rspace_cells import cell_list_rspace_energy_rows

    print(f"device={jax.devices()[0]} N={N_ATOMS}")
    positions, charges, cell, idx, dist, shifts, box = build_system(N_ATOMS, neighbors=False)
    smearing, nodes, spacing, err = choose_parameters(charges, cell, positions)

    dtype = jnp.float32
    q = jnp.asarray(charges, dtype)
    cell_j = jnp.asarray(cell, dtype)
    pos = jnp.asarray(positions, dtype)
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=smearing),
        mesh_spacing=spacing,
        interpolation_nodes=nodes,
    )
    ns = calc.get_ns_mesh(cell_j)
    fp = tpme.MDFastPath.create(calc, pos, cell_j, CUTOFF, ns)
    rows0 = fp.bucket(pos)
    n_cells, cap = fp.clist.slot_mask.shape
    print(f"mesh={ns} nodes={nodes} cells={n_cells} cap={cap} rows={fp.n_rows}")
    inv = jnp.linalg.inv(cell_j)

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    # null body: the chain floor
    run, init = chain(lambda c: c + 1e-30, rows0)
    floor = timed("NULL body (chain floor)", run, init)

    # FULL step
    def body_full(r):
        e, g = jax.value_and_grad(
            lambda rr: fp.energy(q, cell_j, rr)
        )(r)
        return r - 1e-9 * g

    run, init = chain(body_full, rows0)
    full = timed("FULL fp.energy value+grad", run, init)

    # rspace only
    def body_rs(r):
        e, g = jax.value_and_grad(
            lambda rr: cell_list_rspace_energy_rows(
                calc.potential, q, rr, cell_j, fp.clist
            )
        )(r)
        return r - 1e-9 * g

    run, init = chain(body_rs, rows0)
    rs = timed("rspace rows value+grad", run, init)

    # kspace only (refresh + spread + Parseval + corrections)
    def body_ks(r):
        e, g = jax.value_and_grad(
            lambda rr: fp.calc._compute_kspace_energy(
                q, cell_j, rr, ns_mesh=fp.ns_mesh, tiled_interp=fp.tiled
            )
        )(r)
        return r - 1e-9 * g

    run, init = chain(body_ks, rows0)
    ks = timed("kspace quad value+grad", run, init)

    # kspace sub-blocks (forward only; floored individually)
    def body_refresh(r):
        new, ok = refresh_tiled_interpolation(fp.tiled, r, inv, calc._method)
        return r + 1e-30 * jnp.mean(new.weights)

    run, init = chain(body_refresh, rows0)
    timed("  tile refresh fwd", run, init)

    kfilter = compute_kspace_filter(calc.potential.lr_from_k_sq, cell_j, ns)

    def body_spread(r):
        new, ok = refresh_tiled_interpolation(fp.tiled, r, inv, calc._method)
        rho = tiled_points_to_mesh(new, q)
        return r + 1e-30 * jnp.mean(rho)

    run, init = chain(body_spread, rows0)
    timed("  refresh+spread fwd", run, init)

    def body_quad(r):
        new, ok = refresh_tiled_interpolation(fp.tiled, r, inv, calc._method)
        rho = tiled_points_to_mesh(new, q)
        e = kspace_filter_quadratic_dft(rho, kfilter)
        return r + 1e-30 * e

    run, init = chain(body_quad, rows0)
    timed("  refresh+spread+quadDFT fwd", run, init)

    print(
        f"\nsummary: full={full:.2f}  rspace={rs:.2f}  kspace={ks:.2f}  "
        f"floor={floor:.2f}  overlap={(rs + ks - floor) - full:.2f}"
    )


if __name__ == "__main__":
    main()
