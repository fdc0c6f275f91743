"""A/B timing of the DIPOLAR real-space window engines (XLA roll/einsum vs
fused Pallas VMEM kernel) on the current device, rspace-only rows step.

The dipolar k-space term is an Ewald quadratic form (O(N·n_k)) with no mesh
variant, so the window engines are compared on the real-space rows pass
alone — the part they own.  Chained-fori_loop pattern, one host sync per
chain (see profile_step.py).

    python tools/profile_window_dipole.py            # TPU (default env)
    BENCH_N=65000 python tools/profile_window_dipole.py
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
    from torchpme_tpu.ops.rspace_cells import compute_cell_list
    from torchpme_tpu.ops.rspace_cells_dipole import (
        cell_list_rspace_dipole_energy_rows,
    )

    print(f"device={jax.devices()[0]} N={N_ATOMS}", flush=True)
    positions, charges, cell, idx, dist, shifts, box = build_system(N_ATOMS, neighbors=False)
    smearing, nodes, spacing, err = choose_parameters(charges, cell, positions)
    rng = np.random.default_rng(0)

    dtype = jnp.float32
    mu = jnp.asarray(rng.normal(size=(N_ATOMS, 3)), dtype)
    cell_j = jnp.asarray(cell, dtype)
    pos = jnp.asarray(positions, dtype)
    pot = tpme.PotentialDipole(smearing=smearing)

    clist = compute_cell_list(pos, cell_j, CUTOFF, spill=False)
    n_cells, cap = clist.slot_mask.shape
    print(f"smearing={smearing:.3f} cells={n_cells} cap={cap}", flush=True)
    # bucket rows via the same mapping MDFastPathDipole uses
    idx_np = np.asarray(clist.atom_index)
    mask_np = np.asarray(clist.slot_mask)
    flat_rows = np.arange(idx_np.size).reshape(idx_np.shape)
    row_of_atom = np.zeros(N_ATOMS, np.int64)
    row_of_atom[idx_np[mask_np]] = flat_rows[mask_np]
    rows0 = jnp.zeros((n_cells * cap, 3), dtype).at[row_of_atom].set(pos)

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    results = {}
    run, init = chain(lambda c: c + 1e-30, rows0)
    results["floor"] = timed("NULL body (chain floor)", run, init)

    for wimpl in ("xla", "pallas"):
        def body_rs(r, wimpl=wimpl):
            e, g = jax.value_and_grad(
                lambda rr: cell_list_rspace_dipole_energy_rows(
                    pot, mu, rr, cell_j, clist, window_impl=wimpl
                )
            )(r)
            return r - 1e-9 * g

        run, init = chain(body_rs, rows0)
        results[f"rspace/{wimpl}"] = timed(
            f"dipolar rspace rows value+grad [{wimpl}]", run, init
        )
        e = cell_list_rspace_dipole_energy_rows(
            pot, mu, rows0, cell_j, clist, window_impl=wimpl
        )
        results[f"e/{wimpl}"] = float(e)

    rel = abs(results["e/pallas"] - results["e/xla"]) / abs(results["e/xla"])
    print(f"\nenergy agreement: rel {rel:.3e}")
    print(
        f"summary: rspace xla={results['rspace/xla']:.2f} "
        f"pallas={results['rspace/pallas']:.2f} floor={results['floor']:.2f}"
    )


if __name__ == "__main__":
    main()
