"""Component timing of the cell-list real-space block on the current device.

Chained-fori_loop pattern (one host sync per chain) per verify-skill notes.

    python tools/profile_rspace.py          # TPU (default env)
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
    print(f"{name:<46s} {ms:8.2f} ms")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    import torchpme_tpu as tpme
    from bench import build_system, choose_parameters
    from torchpme_tpu.ops.rspace_cells import (
        cell_list_rspace_energy,
        compute_cell_list,
    )

    print(f"device={jax.devices()[0]} N={N_ATOMS}")
    positions, charges, cell, idx, dist, shifts, box = build_system(N_ATOMS, neighbors=False)
    smearing, nodes, spacing, err = choose_parameters(charges, cell, positions)

    dtype = jnp.float32
    q = jnp.asarray(charges, dtype)
    cell_j = jnp.asarray(cell, dtype)
    pos = jnp.asarray(positions, dtype)
    pot = tpme.CoulombPotential(smearing=smearing)

    clist = compute_cell_list(positions, cell, CUTOFF)
    n_cells, cap = clist.slot_mask.shape
    occ = int(np.asarray(clist.slot_mask).sum())
    print(
        f"cells={clist.n_axis} n_cells={n_cells} cap={cap} "
        f"occupancy={occ / (n_cells * cap):.2f}"
    )

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    # full rspace energy fwd+bwd
    def body_e(p):
        e, g = jax.value_and_grad(
            lambda pp: cell_list_rspace_energy(pot, q, pp, cell_j, clist)
        )(p)
        return p - 1e-9 * g

    run, init = chain(body_e, pos)
    timed("rspace energy fwd+bwd", run, init)

    # forward only
    def body_f(p):
        e = cell_list_rspace_energy(pot, q, p, cell_j, clist)
        return p + 1e-30 * e

    run, init = chain(body_f, pos)
    timed("rspace energy fwd only", run, init)

    # bucket gather alone (fwd+bwd through the gather)
    def gather_only(p):
        both = jnp.concatenate([p, q.astype(dtype)], axis=1)
        both_b = both[clist.atom_index]
        return jnp.sum(both_b * clist.slot_mask[..., None])

    def body_g(p):
        e, g = jax.value_and_grad(gather_only)(p)
        return p - 1e-9 * g

    run, init = chain(body_g, pos)
    timed("bucket gather fwd+bwd", run, init)

    # staleness guard alone (on pre-bucketed positions)
    both = jnp.concatenate([pos, q.astype(dtype)], axis=1)
    pos_b0 = both[clist.atom_index][..., :3] - jnp.matmul(
        clist.atom_wrap.astype(dtype), cell_j, precision="highest"
    )

    def guard(pb):
        nx, ny, nz = clist.n_axis
        n_axis = jnp.asarray([nx, ny, nz], dtype)
        inv_cell = jnp.linalg.inv(cell_j)
        f = jnp.matmul(pb, inv_cell, precision="highest") * n_axis
        home = jnp.arange(n_cells, dtype=jnp.int32)
        home3 = jnp.stack(
            [home // (ny * nz), (home // nz) % ny, home % nz], axis=-1
        ).astype(dtype)[:, None, :]
        tol = 1e-4
        inside = jnp.all((f > home3 - tol) & (f < home3 + 1 + tol), axis=-1)
        return jnp.all(inside | ~clist.slot_mask)

    def body_s(pb):
        v = guard(pb)
        return pb + 1e-30 * v.astype(dtype)

    run, init = chain(body_s, pos_b0)
    timed("staleness guard fwd", run, init)

    # pair kernel alone on pre-bucketed state (no gather, no guard): time the
    # _bucket_potentials core by calling it on already-bucketed inputs is not
    # separable; instead time fwd with guard removed via a monkeypatch-free
    # subtraction: (energy fwd) - (gather fwd) - (guard) ~= core.

    # erfc throughput scale check
    d_test = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (8, 1024, 1024))) + 0.1

    def body_erfc(d):
        v = jax.scipy.special.erfc(d / 1.4)
        return d + 1e-30 * jnp.mean(v)

    run, init = chain(body_erfc, d_test)
    ms = timed("erfc on 8.4M elems", run, init)
    print(f"  -> {8 * 1024 * 1024 / ms / 1e6:.1f} Gelem/s")


if __name__ == "__main__":
    main()
