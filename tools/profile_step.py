"""Component-level timing of the 102k-atom PME step on the current device.

Each component is timed with the chained-fori_loop pattern (data-dependent
carry, ONE host sync per chain) because per-call timing through the axon
tunnel measures mostly host round-trip latency.  Usage:

    python tools/profile_step.py            # TPU (default env)
    BENCH_N=102000 python tools/profile_step.py
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
    """fn must be a jitted chained function returning something syncable."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    times = []
    for _ in range(REPS):
        t0 = time.monotonic()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.monotonic() - t0) / CHAIN)
    ms = float(np.median(times) * 1e3)
    print(f"{name:<38s} {ms:8.2f} ms")
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
    from torchpme_tpu.utils.neighbors import (
        compute_distances_dense,
        dense_neighbor_format,
    )

    print(f"device={jax.devices()[0]} N={N_ATOMS}")
    positions, charges, cell, idx, dist, shifts, box = build_system(N_ATOMS)
    smearing, nodes, spacing, err = choose_parameters(charges, cell, positions)
    dense = dense_neighbor_format(idx, dist, N_ATOMS, neighbor_shifts=shifts)

    dtype = jnp.float32
    q = jnp.asarray(charges, dtype)
    cell_j = jnp.asarray(cell, dtype)
    pos = jnp.asarray(positions, dtype)
    nbr = jnp.asarray(dense["indices"])
    dist_d = jnp.asarray(dense["distances"], dtype)
    mask = jnp.asarray(dense["mask"])
    shifts_d = jnp.asarray(dense["shifts"], jnp.int8)

    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=smearing),
        mesh_spacing=spacing,
        interpolation_nodes=nodes,
    )
    ns = calc.get_ns_mesh(cell_j)
    inv = jnp.linalg.inv(cell_j)
    interp = compute_tiled_interpolation(pos, inv, ns, nodes, "Lagrange")
    n_tiles, capacity = interp.local_x.shape
    print(
        f"mesh={ns} nodes={nodes} tiles={n_tiles} capacity={capacity} "
        f"pairs={idx.shape[0]} dense_cap={nbr.shape[1]}"
    )

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    # --- spread / gather forward -------------------------------------------
    flat_q = jnp.zeros((n_tiles * capacity + 1, 1), dtype).at[
        interp.slot_of_atom
    ].set(q)
    b_q = flat_q[:-1].reshape(n_tiles, capacity)

    for impl in ("xla", "pallas"):
        def body(c, impl=impl):
            rho = tiled_points_to_mesh(interp, c[:, None].reshape(-1, 1)[: N_ATOMS], impl=impl)  # noqa: E501
            return c + 1e-30 * jnp.mean(rho)

        # spread takes per-atom charges; keep carry per-atom
        def body_q(c, impl=impl):
            rho = tiled_points_to_mesh(interp, c, impl=impl)
            return c + 1e-30 * jnp.mean(rho)

        run, init = chain(body_q, q)
        timed(f"spread fwd [{impl}]", run, init)

    rho0 = tiled_points_to_mesh(interp, q)

    for impl in ("xla", "pallas"):
        def body_g(c, impl=impl):
            vals = tiled_mesh_to_points(interp, c, impl=impl)
            return c + 1e-30 * jnp.mean(vals)

        run, init = chain(body_g, rho0)
        timed(f"gather fwd [{impl}]", run, init)

    # --- spread+gather fwd+bwd (the mesh block of the step) ----------------
    kfilter = compute_kspace_filter(calc.potential.lr_from_k_sq, cell_j, ns)

    for impl in ("xla", "pallas"):
        def loss(p, impl=impl):
            new, _ = refresh_tiled_interpolation(interp, p, inv, "Lagrange")
            rho = tiled_points_to_mesh(new, q, impl=impl)
            vals = tiled_mesh_to_points(new, rho, impl=impl)
            return jnp.sum(vals * q)

        def body_sg(p, impl=impl):
            e, g = jax.value_and_grad(lambda pp: loss(pp, impl))(p)
            return p - 1e-9 * g

        run, init = chain(body_sg, pos)
        timed(f"refresh+spread+gather fwd+bwd [{impl}]", run, init)

    # --- refresh alone ------------------------------------------------------
    def body_r(p):
        new, _ = refresh_tiled_interpolation(interp, p, inv, "Lagrange")
        return p + 1e-30 * jnp.mean(new.weights)

    run, init = chain(body_r, pos)
    timed("refresh fwd", run, init)

    # --- k-space filter ------------------------------------------------------
    def body_f(c):
        out = apply_kspace_filter_dft(c, kfilter)
        return c + 1e-30 * out

    run, init = chain(body_f, rho0)
    timed("DFT filter fwd", run, init)

    # --- real space: static dist vs recomputed dist --------------------------
    def rspace_static(d):
        pot = calc._compute_rspace(q, nbr, d, pair_mask=mask)
        return jnp.sum(pot * q)

    def body_rs(d):
        e, g = jax.value_and_grad(rspace_static)(d)
        return d - 1e-9 * g

    run, init = chain(body_rs, dist_d)
    timed("rspace fwd+bwd (static dist)", run, init)

    def rspace_md(p):
        d = compute_distances_dense(p, nbr, cell=cell_j, neighbor_shifts=shifts_d)
        pot = calc._compute_rspace(q, nbr, d, pair_mask=mask)
        return jnp.sum(pot * q)

    def body_rm(p):
        e, g = jax.value_and_grad(rspace_md)(p)
        return p - 1e-9 * g

    run, init = chain(body_rm, pos)
    timed("rspace fwd+bwd (recomputed dist)", run, init)

    from torchpme_tpu.utils.neighbors import compute_distances_dense_symmetric

    def rspace_sym(p):
        d = compute_distances_dense_symmetric(
            p, nbr, cell=cell_j, neighbor_shifts=shifts_d
        )
        pot = calc._compute_rspace(q, nbr, d, pair_mask=mask)
        return jnp.sum(pot * q)

    def body_rsym(p):
        e, g = jax.value_and_grad(rspace_sym)(p)
        return p - 1e-9 * g

    run, init = chain(body_rsym, pos)
    timed("rspace fwd+bwd (symmetric-VJP dist)", run, init)

    def body_dist_only(p):
        def f(pp):
            d = compute_distances_dense_symmetric(
                pp, nbr, cell=cell_j, neighbor_shifts=shifts_d
            )
            return jnp.sum(d * mask)

        e, g = jax.value_and_grad(f)(p)
        return p - 1e-9 * g

    run, init = chain(body_dist_only, pos)
    timed("dist-only fwd+bwd (symmetric VJP)", run, init)

    # --- full step, static dist vs honest MD step ---------------------------
    def energy_static(p, d):
        pot = calc(q, cell_j, p, nbr, d, pair_mask=mask, ns_mesh=ns, tiled_interp=interp)
        return jnp.sum(pot * q)

    def body_fs(c):
        p, d = c
        e, (gp, gd) = jax.value_and_grad(energy_static, argnums=(0, 1))(p, d)
        return (p - 1e-9 * gp, d - 1e-9 * gd)

    run, init = chain(body_fs, (pos, dist_d))
    timed("FULL step (static dist)", run, init)

    def energy_md(p):
        d = compute_distances_dense_symmetric(
            p, nbr, cell=cell_j, neighbor_shifts=shifts_d
        )
        pot = calc(q, cell_j, p, nbr, d, pair_mask=mask, ns_mesh=ns, tiled_interp=interp)
        return jnp.sum(pot * q)

    def body_fm(p):
        e, g = jax.value_and_grad(energy_md)(p)
        return p - 1e-9 * g

    run, init = chain(body_fm, pos)
    timed("FULL step (honest MD: dist from pos)", run, init)


if __name__ == "__main__":
    main()
