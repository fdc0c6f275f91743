"""Component timing of the tiled-mesh k-space block on the current device.

    python tools/profile_mesh.py            # TPU (default env)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

N_ATOMS = int(os.environ.get("BENCH_N", 102_000))
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
    print(f"{name:<46s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    import torchpme_tpu as tpme
    from bench import build_system, choose_parameters
    from torchpme_tpu.ops.kspace import apply_kspace_filter_dft, compute_kspace_filter
    from torchpme_tpu.ops.mesh_tiled import (
        compute_tiled_interpolation,
        refresh_tiled_interpolation,
        tiled_mesh_to_points,
        tiled_points_to_mesh,
    )

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
    inv = jnp.linalg.inv(cell_j)
    interp = compute_tiled_interpolation(pos, inv, ns, nodes, "Lagrange")
    n_tiles, capacity = interp.local_x.shape
    print(f"mesh={ns} nodes={nodes} tiles={n_tiles} capacity={capacity}")
    kfilter = compute_kspace_filter(calc.potential.lr_from_k_sq, cell_j, ns)

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    # full k-space block: refresh + spread + filter + gather, fwd+bwd
    def kspace_energy(p):
        new, _ = refresh_tiled_interpolation(interp, p, inv, "Lagrange")
        rho = tiled_points_to_mesh(new, q)
        phi = apply_kspace_filter_dft(rho, kfilter)
        vals = tiled_mesh_to_points(new, phi)
        return jnp.sum(vals * q)

    def body_full(p):
        e, g = jax.value_and_grad(kspace_energy)(p)
        return p - 1e-9 * g

    run, init = chain(body_full, pos)
    timed("kspace block fwd+bwd", run, init)

    def body_fwd(p):
        e = kspace_energy(p)
        return p + 1e-30 * e

    run, init = chain(body_fwd, pos)
    timed("kspace block fwd only", run, init)

    # refresh alone fwd / fwd+bwd
    def body_r(p):
        new, _ = refresh_tiled_interpolation(interp, p, inv, "Lagrange")
        return p + 1e-30 * jnp.mean(new.weights)

    run, init = chain(body_r, pos)
    timed("refresh fwd", run, init)

    def body_rb(p):
        def f(pp):
            new, _ = refresh_tiled_interpolation(interp, pp, inv, "Lagrange")
            return jnp.sum(new.weights**2)

        e, g = jax.value_and_grad(f)(p)
        return p - 1e-9 * g

    run, init = chain(body_rb, pos)
    timed("refresh fwd+bwd", run, init)

    # spread fwd (fixed interp)
    def body_s(c):
        rho = tiled_points_to_mesh(interp, c)
        return c + 1e-30 * jnp.mean(rho)

    run, init = chain(body_s, q)
    timed("spread fwd", run, init)

    rho0 = tiled_points_to_mesh(interp, q)

    def body_g(c):
        vals = tiled_mesh_to_points(interp, c)
        return c + 1e-30 * jnp.mean(vals)

    run, init = chain(body_g, rho0)
    timed("gather fwd", run, init)

    def body_f(c):
        out = apply_kspace_filter_dft(c, kfilter)
        return c + 1e-30 * out

    run, init = chain(body_f, rho0)
    timed("DFT filter fwd", run, init)


if __name__ == "__main__":
    main()


def profile_quadratic():
    """Appended: time the quadratic-form k-space energy block (fwd+bwd)."""
    import jax
    import jax.numpy as jnp

    import torchpme_tpu as tpme
    from bench import build_system, choose_parameters
    from torchpme_tpu.ops.kspace import compute_kspace_filter, kspace_filter_quadratic_dft
    from torchpme_tpu.ops.mesh_tiled import (
        compute_tiled_interpolation,
        refresh_tiled_interpolation,
        tiled_points_to_mesh,
    )

    positions, charges, cell, idx, dist, shifts, box = build_system(N_ATOMS, neighbors=False)
    smearing, nodes, spacing, err = choose_parameters(charges, cell, positions)
    dtype = jnp.float32
    q = jnp.asarray(charges, dtype)
    cell_j = jnp.asarray(cell, dtype)
    pos = jnp.asarray(positions, dtype)
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=smearing),
        mesh_spacing=spacing, interpolation_nodes=nodes,
    )
    ns = calc.get_ns_mesh(cell_j)
    inv = jnp.linalg.inv(cell_j)
    interp = compute_tiled_interpolation(pos, inv, ns, nodes, "Lagrange")
    kfilter = compute_kspace_filter(calc.potential.lr_from_k_sq, cell_j, ns)

    def chain(body, init):
        @jax.jit
        def run(x):
            import jax as _j
            return _j.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)
        return run, init

    def kq_energy(p):
        new, _ = refresh_tiled_interpolation(interp, p, inv, "Lagrange")
        rho = tiled_points_to_mesh(new, q)
        return kspace_filter_quadratic_dft(rho, kfilter)

    def body(p):
        e, g = jax.value_and_grad(kq_energy)(p)
        return p - 1e-12 * g

    run, init = chain(body, pos)
    timed("QUADRATIC kspace energy fwd+bwd", run, init)

    def body_f(p):
        e = kq_energy(p)
        return p + 1e-30 * e

    run, init = chain(body_f, pos)
    timed("QUADRATIC kspace energy fwd only", run, init)


if __name__ == "__main__" and __import__("os").environ.get("QUAD"):
    profile_quadratic()
