"""A/B the fused f32 ``(V, V'/d)``-of-d² window hook vs the exact path.

Arms (same system, same cell list, chained fori_loop, one sync per chain):
  - rspace rows value+grad, hook ON (``CoulombPotential.sr_window_math``)
  - rspace rows value+grad, hook OFF (exact erfc/exp + sr_pair_force)
  - FULL MDFastPath step, hook ON / OFF

The hook is gated inside ``rspace_cells._resolve_window_math``; the OFF arm
monkeypatches it to return ``None`` before tracing, which restores the
round-4 code path bit-for-bit.

    python tools/ab_window_math.py                 # TPU (default env)
    BENCH_N=131072 python tools/ab_window_math.py
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
    from torchpme_tpu.ops import rspace_cells as rc
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
    print(
        f"mesh={ns} nodes={nodes} mesh_impl={fp.mesh_impl} "
        f"cells={fp.clist.n_axis} cap={fp.clist.slot_mask.shape[-1]}"
    )

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    run, init = chain(lambda c: c * 0.9999999 + 1e-30, rows0)
    floor = timed("NULL body (chain floor)", run, init)

    def body_rs(r):
        e, g = jax.value_and_grad(
            lambda rr: cell_list_rspace_energy_rows(
                calc.potential, q, rr, cell_j, fp.clist
            )
        )(r)
        return r - 1e-9 * g

    def body_full(r):
        e, g = jax.value_and_grad(lambda rr: fp.energy(q, cell_j, rr))(r)
        return r - 1e-9 * g

    orig = rc._resolve_window_math
    results = {}
    grads = {}
    for arm, resolver in (("ON ", orig), ("OFF", lambda *a: None)):
        rc._resolve_window_math = resolver
        try:
            # correctness cross-check: one un-chained gradient per arm
            _, g = jax.value_and_grad(
                lambda rr: cell_list_rspace_energy_rows(
                    calc.potential, q, rr, cell_j, fp.clist
                )
            )(rows0)
            grads[arm] = np.asarray(g, np.float64)
            run, init = chain(body_rs, rows0)
            results[f"rs_{arm}"] = timed(f"rspace rows v+g  hook {arm}", run, init)
            run, init = chain(body_full, rows0)
            results[f"full_{arm}"] = timed(f"FULL step v+g    hook {arm}", run, init)
        finally:
            rc._resolve_window_math = orig

    scale = np.max(np.abs(grads["OFF"]))
    rms = np.sqrt(np.mean((grads["ON "] - grads["OFF"]) ** 2)) / scale
    print(f"force agreement ON vs OFF (rel RMS): {rms:.3e}")
    print(
        f"floor {floor:.2f} | rspace {results['rs_ON ']:.2f} vs {results['rs_OFF']:.2f}"
        f" | full {results['full_ON ']:.2f} vs {results['full_OFF']:.2f}"
    )


if __name__ == "__main__":
    main()
