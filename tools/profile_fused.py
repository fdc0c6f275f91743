"""Time the fused Pallas spread against the XLA tiled mesh block, and the
full MD step with either backend, on the current default device.

Chained-fori_loop timing with one host sync per chain (axon tunnel latency
pattern — see bench.py).  Usage:

    python tools/profile_fused.py              # TPU (default env)
    BENCH_N=102000 python tools/profile_fused.py
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
    from torchpme_tpu.ops.mesh_tiled import (
        compute_tiled_interpolation,
        refresh_tiled_interpolation,
        tiled_points_to_mesh,
    )
    from torchpme_tpu.ops.pallas.spread_fused import fused_tiled_density

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
    inv = jnp.linalg.inv(cell_j)
    interp = compute_tiled_interpolation(pos, inv, ns, nodes, "Lagrange")
    print(f"mesh={ns} nodes={nodes} tiles={interp.local_x.shape}", flush=True)

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    # --- isolated mesh block: refresh+spread fwd ---------------------------
    def body_xla(p):
        new, _ = refresh_tiled_interpolation(interp, p, inv, "Lagrange")
        rho = tiled_points_to_mesh(new, q, impl="xla")
        return p + 1e-30 * jnp.mean(rho)

    run, init = chain(body_xla, pos)
    timed("refresh+spread fwd [xla]", run, init)

    def body_fused(p):
        rho, _ = fused_tiled_density(interp, p, inv, q, "Lagrange")
        return p + 1e-30 * jnp.mean(rho)

    run, init = chain(body_fused, pos)
    timed("density fwd [fused]", run, init)

    # --- isolated mesh block fwd+bwd ---------------------------------------
    def loss_xla(p):
        new, _ = refresh_tiled_interpolation(interp, p, inv, "Lagrange")
        rho = tiled_points_to_mesh(new, q, impl="xla")
        return jnp.sum(rho**2)

    def body_xla_g(p):
        _, g = jax.value_and_grad(loss_xla)(p)
        return p - 1e-12 * g

    run, init = chain(body_xla_g, pos)
    timed("refresh+spread fwd+bwd [xla]", run, init)

    def loss_fused(p):
        rho, _ = fused_tiled_density(interp, p, inv, q, "Lagrange")
        return jnp.sum(rho**2)

    def body_fused_g(p):
        _, g = jax.value_and_grad(loss_fused)(p)
        return p - 1e-12 * g

    run, init = chain(body_fused_g, pos)
    timed("density fwd+bwd [fused]", run, init)

    # --- full MD step ------------------------------------------------------
    for impl in ("tiled", "fused", "aligned"):
        fp = tpme.MDFastPath.create(
            calc, pos, cell_j, CUTOFF, ns, mesh_impl=impl
        )
        rows0 = fp.bucket(pos)
        grad_step = jax.value_and_grad(
            lambda r, fp=fp: fp.energy(q, cell_j, r)
        )

        def body_md(carry, grad_step=grad_step):
            p, acc = carry
            e, gp = grad_step(p)
            return (p - 1e-7 * gp, acc + e)

        @jax.jit
        def chained(rows):
            return jax.lax.fori_loop(
                0, CHAIN, lambda _, c: body_md(c), (rows, jnp.float32(0))
            )

        out = chained(rows0)
        jax.block_until_ready(out)
        times = []
        for _ in range(REPS):
            t0 = time.monotonic()
            out = chained(rows0)
            _ = float(out[1])
            times.append((time.monotonic() - t0) / CHAIN)
        print(
            f"{'MD step [' + impl + ']':<44s} "
            f"{float(np.median(times) * 1e3):8.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
