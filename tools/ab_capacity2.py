"""A/B the aligned window capacity: the cost model's spill coefficients
predate the analytic-VJP extras path — measure whether a tight capacity
(more spill, 1.78x less window work at cap 24 vs 32) now wins.

    python tools/ab_capacity2.py            # TPU (default env)
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
    print(f"{name:<52s} {ms:8.2f} ms", flush=True)
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

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    run, init = chain(lambda c: c * 0.9999999 + 1e-30, jnp.zeros((256, 3)))
    floor = timed("NULL body (chain floor)", run, init)

    results = {}
    e_vals = {}
    for cap in (None, 24, 16):
        fp = tpme.MDFastPath.create(
            calc, pos, cell_j, CUTOFF, ns, cell_capacity=cap,
            _spill=True if cap is not None else None,
        )
        rows0 = fp.bucket(pos)
        n_cells, cap_got = fp.clist.slot_mask.shape
        n_extra = (
            0
            if fp.clist.extra_mask is None
            else int(np.asarray(fp.clist.extra_mask).sum())
        )
        label = f"cap={cap_got} extras={n_extra}"
        print(f"--- requested={cap} -> {label} rows={fp.n_rows}")

        def body_rs(r, fp=fp):
            e, g = jax.value_and_grad(
                lambda rr: cell_list_rspace_energy_rows(
                    calc.potential, q, rr, cell_j, fp.clist
                )
            )(r)
            return r - 1e-9 * g

        run, init = chain(body_rs, rows0)
        results[f"rspace {label}"] = timed(f"rspace rows v+g {label}", run, init)

        def body_full(r, fp=fp):
            e, g = jax.value_and_grad(lambda rr: fp.energy(q, cell_j, rr))(r)
            return r - 1e-9 * g

        run, init = chain(body_full, rows0)
        results[f"full {label}"] = timed(f"FULL fp.energy v+g {label}", run, init)
        e_vals[label] = float(fp.energy(q, cell_j, rows0))

    print()
    vals = list(e_vals.values())
    for k, v in e_vals.items():
        print(f"energy[{k}] = {v:.6f}  rel-vs-first {abs(v - vals[0]) / abs(vals[0]):.2e}")
    print(f"floor = {floor:.2f} ms (subtract from every row)")


if __name__ == "__main__":
    main()
