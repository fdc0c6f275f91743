"""Component timing of the ALIGNED MD fast path (the headline bench config).

Chained-fori_loop pattern, one host sync per chain; prints the null-chain
floor first — subtract it per-session (it has ranged 0.0–3 ms depending on
the tunnel's mood; see docs/performance.md "Timing on TPU correctly").

    python tools/profile_aligned.py                 # TPU (default env)
    BENCH_N=33000 python tools/profile_aligned.py
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
CHAIN = int(os.environ.get("BENCH_CHAIN", 20))
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
    print(f"{name:<46s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    import torchpme_tpu as tpme
    from bench import build_system, choose_parameters
    from torchpme_tpu.ops.rspace_cells import cell_list_rspace_energy_rows

    print(f"device={jax.devices()[0]} N={N_ATOMS} chain={CHAIN}")
    positions, charges, cell, *_, box = build_system(N_ATOMS, neighbors=False)
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
    n_extra = (
        0 if fp.clist.extra_mask is None else int(np.asarray(fp.clist.extra_mask).sum())
    )
    print(
        f"mesh={ns} nodes={nodes} mesh_impl={fp.mesh_impl} "
        f"window_impl={fp.window_impl} cells={fp.clist.n_axis} cap={cap} "
        f"extras={n_extra} rows={fp.n_rows}"
    )

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    run, init = chain(lambda c: c * 0.9999999 + 1e-30, rows0)
    timed("NULL body (chain floor)", run, init)

    def body_full(r):
        e, g = jax.value_and_grad(lambda rr: fp.energy(q, cell_j, rr))(r)
        return r - 1e-9 * g

    run, init = chain(body_full, rows0)
    timed("FULL fp.energy value+grad", run, init)

    def body_rs(r):
        e, g = jax.value_and_grad(
            lambda rr: cell_list_rspace_energy_rows(
                calc.potential, q, rr, cell_j, fp.clist
            )
        )(r)
        return r - 1e-9 * g

    run, init = chain(body_rs, rows0)
    timed("rspace rows value+grad", run, init)

    # k-space alone = FULL minus rspace is unreliable (overlap); time it as
    # the aligned spread + quadratic-DFT branch of fp.energy
    if fp.mesh_impl == "aligned":
        from torchpme_tpu.ops.pallas.spread_fused import aligned_tiled_density

        q_rows = (
            jnp.zeros((fp.n_rows, q.shape[-1]), dtype).at[fp.row_of_atom].set(q)
        )

        def kspace_only(rr):
            rho = aligned_tiled_density(
                rr,
                q_rows,
                jnp.linalg.inv(cell_j),
                fp.ns_mesh,
                calc.interpolation_nodes,
                calc._method,
                fp.cell_grid,
            )
            return fp.calc._kspace_energy_from_rho(
                rho, cell_j, q, rr, None, fp.ns_mesh
            )

        def body_ks(r):
            e, g = jax.value_and_grad(kspace_only)(r)
            return r - 1e-9 * g

        run, init = chain(body_ks, rows0)
        timed("kspace aligned value+grad", run, init)

        def body_ks_fwd(r):
            e = kspace_only(r)
            return r + 1e-30 * e

        run, init = chain(body_ks_fwd, rows0)
        timed("kspace aligned fwd only", run, init)


if __name__ == "__main__":
    main()
