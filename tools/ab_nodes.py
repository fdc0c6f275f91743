"""A/B the interpolation order on the aligned MD step: the error bound at
the ACTUAL (power-of-2-rounded) mesh passes down to nodes=3, and the spread
stencil is nodes^3 (125 -> 27 slots/atom from 5 -> 3).

    python tools/ab_nodes.py            # TPU (default env)
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

    print(f"device={jax.devices()[0]} N={N_ATOMS} chain={CHAIN}")
    positions, charges, cell, *_, box = build_system(N_ATOMS, neighbors=False)
    smearing, _nodes, spacing, err = choose_parameters(charges, cell, positions)

    dtype = jnp.float32
    q = jnp.asarray(charges, dtype)
    cell_j = jnp.asarray(cell, dtype)
    pos = jnp.asarray(positions, dtype)

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    run, init = chain(lambda c: c * 0.9999999 + 1e-30, jnp.zeros((256, 3)))
    floor = timed("NULL body (chain floor)", run, init)

    e_vals = {}
    for nodes in (5, 4, 3):
        calc = tpme.PMECalculator(
            tpme.CoulombPotential(smearing=smearing),
            mesh_spacing=spacing,
            interpolation_nodes=nodes,
        )
        ns = calc.get_ns_mesh(cell_j)
        fp = tpme.MDFastPath.create(calc, pos, cell_j, CUTOFF, ns)
        rows0 = fp.bucket(pos)

        def body_full(r, fp=fp):
            e, g = jax.value_and_grad(lambda rr: fp.energy(q, cell_j, rr))(r)
            return r - 1e-9 * g

        run, init = chain(body_full, rows0)
        timed(f"FULL fp.energy v+g nodes={nodes} mesh={ns[0]}", run, init)
        e_vals[nodes] = float(fp.energy(q, cell_j, rows0))

    print()
    for k, v in e_vals.items():
        print(f"energy[nodes={k}] = {v:.4f}")
    print(f"floor = {floor:.2f} ms")


if __name__ == "__main__":
    main()
