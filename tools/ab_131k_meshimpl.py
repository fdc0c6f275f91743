"""A/B the MD fast-path mesh_impl at 131k atoms (the scaling-table tail).

The aligned mode pins the x/y cell grid to the 16x16 mesh-tile grid, so the
cell edge stretches with the box (6.87 A vs the 5 A cutoff at 131k ->
occupancy 24.4/32 and a 932-atom spill tail).  This measures whether the
un-pinned modes (natural ~cutoff cell grid + tile-table mesh) win at this
geometry.

    BENCH_N=131072 python tools/ab_131k_meshimpl.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

N_ATOMS = int(os.environ.get("BENCH_N", 131_072))
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
    print(f"{name:<52s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    import torchpme_tpu as tpme
    from bench import build_system, choose_parameters

    print(f"device={jax.devices()[0]} N={N_ATOMS} chain={CHAIN}", flush=True)
    positions, charges, cell, *_, box = build_system(N_ATOMS, neighbors=False)
    smearing, nodes, spacing, err = choose_parameters(charges, cell, positions)
    print(f"params: smearing={smearing:.3f} nodes={nodes} spacing={spacing:.3f}")

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
    print(f"mesh={ns} box={box:.1f}", flush=True)

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    run, init = chain(lambda c: c * 0.9999999 + 1e-30, pos)
    timed("NULL body (chain floor)", run, init)

    results = {}
    for impl in ("aligned", "fused", "tiled"):
        try:
            fp = tpme.MDFastPath.create(
                calc, pos, cell_j, CUTOFF, ns, mesh_impl=impl
            )
        except ValueError as e:
            print(f"{impl}: skipped ({e})", flush=True)
            continue
        ncells, cap = fp.clist.slot_mask.shape
        extras = (
            int(fp.clist.extra_mask.sum()) if fp.clist.extra_mask is not None else 0
        )
        print(
            f"{impl}: cells={fp.clist.n_axis} cap={cap} extras={extras}",
            flush=True,
        )
        rows0 = fp.bucket(pos)

        def body(r, fp=fp):
            e, g = jax.value_and_grad(lambda rr: fp.energy(q, cell_j, rr))(r)
            return r - 1e-9 * g

        run, init = chain(body, rows0)
        results[impl] = timed(f"{impl} energy+force /step", run, init)

    print({k: round(v, 2) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
