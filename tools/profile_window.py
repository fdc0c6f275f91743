"""A/B timing of the real-space window engines (XLA roll/matmul vs fused
Pallas VMEM kernel) on the current device, full-step and rspace-only.

Chained-fori_loop pattern, one host sync per chain (see profile_step.py).

    python tools/profile_window.py               # TPU (default env)
    BENCH_N=65000 python tools/profile_window.py
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
    print(f"{name:<44s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    import torchpme_tpu as tpme
    from bench import build_system, choose_parameters
    from torchpme_tpu.ops.rspace_cells import cell_list_rspace_energy_rows

    print(f"device={jax.devices()[0]} N={N_ATOMS}", flush=True)
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

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    results = {}
    for wimpl in ("xla", "pallas"):
        fp = tpme.MDFastPath.create(
            calc, pos, cell_j, CUTOFF, ns, window_impl=wimpl
        )
        rows0 = fp.bucket(pos)
        if wimpl == "xla":
            n_cells, cap = fp.clist.slot_mask.shape
            print(
                f"mesh={ns} nodes={nodes} mesh_impl={fp.mesh_impl} "
                f"cells={n_cells} cap={cap} rows={fp.n_rows}",
                flush=True,
            )
            run, init = chain(lambda c: c + 1e-30, rows0)
            results["floor"] = timed("NULL body (chain floor)", run, init)

        def body_full(r, fp=fp):
            e, g = jax.value_and_grad(lambda rr: fp.energy(q, cell_j, rr))(r)
            return r - 1e-9 * g

        run, init = chain(body_full, rows0)
        results[f"full/{wimpl}"] = timed(
            f"FULL step value+grad  [{wimpl}]", run, init
        )

        def body_rs(r, fp=fp):
            e, g = jax.value_and_grad(
                lambda rr: cell_list_rspace_energy_rows(
                    calc.potential, q, rr, cell_j, fp.clist,
                    window_impl=fp.window_impl,
                )
            )(r)
            return r - 1e-9 * g

        run, init = chain(body_rs, rows0)
        results[f"rspace/{wimpl}"] = timed(
            f"rspace rows value+grad [{wimpl}]", run, init
        )

        # one-shot value check between engines
        e = cell_list_rspace_energy_rows(
            calc.potential, q, rows0, cell_j, fp.clist, window_impl=wimpl
        )
        results[f"e/{wimpl}"] = float(e)

    rel = abs(results["e/pallas"] - results["e/xla"]) / abs(results["e/xla"])
    print(f"\nenergy agreement: rel {rel:.3e}")
    print(
        f"summary: full xla={results['full/xla']:.2f} "
        f"pallas={results['full/pallas']:.2f} | rspace "
        f"xla={results['rspace/xla']:.2f} pallas={results['rspace/pallas']:.2f} "
        f"floor={results['floor']:.2f}"
    )


if __name__ == "__main__":
    main()
