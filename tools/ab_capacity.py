"""TPU A/B of cell capacity on the aligned MD fast path.

The capacity cost model (`rspace_cells._choose_capacity`) was tuned when the
spill extras rode plain autodiff (~8x per-candidate cost); with the
analytic-derivative extras VJP the spill passes are cheap and tighter
capacities (fewer window slots: work scales with cap^2) should win.  This
measures the full-step value+grad per capacity so the cost model's
coefficients can be re-fit from hardware.

    python tools/ab_capacity.py            # capacities 16..40 at 102k atoms
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

    print(f"device={jax.devices()[0]} N={N_ATOMS} chain={CHAIN}", flush=True)
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

    e_ref = None
    caps = [
        (None if c == "auto" else int(c))
        for c in os.environ.get("AB_CAPS", "auto,24,40").split(",")
    ]
    for cap in caps:
        try:
            fp = tpme.MDFastPath.create(
                calc, pos, cell_j, CUTOFF, ns,
                cell_capacity=cap, _spill=(cap is not None) or None,
            )
        except ValueError as exc:
            print(f"cap={cap}: {exc}", flush=True)
            continue
        rows0 = fp.bucket(pos)
        n_cells, cap_eff = fp.clist.slot_mask.shape
        n_extra = (
            0
            if fp.clist.extra_mask is None
            else int(np.asarray(fp.clist.extra_mask).sum())
        )
        e0 = float(fp.energy(q, cell_j, rows0))
        if e_ref is None:
            e_ref = e0
        tag = (
            f"cap={cap_eff}{' (auto)' if cap is None else ''} extras={n_extra} "
            f"slots={n_cells * 14 * cap_eff * cap_eff / 1e6:.0f}M "
            f"dE={abs(e0 - e_ref):.2e}"
        )
        if cap is None:
            run, init = chain(lambda c: c * 0.9999999 + 1e-30, rows0)
            timed("NULL body (chain floor)", run, init)

        def body_full(r, fp=fp):
            e, g = jax.value_and_grad(lambda rr: fp.energy(q, cell_j, rr))(r)
            return r - 1e-9 * g

        run, init = chain(body_full, rows0)
        timed(f"FULL v+g {tag}", run, init)

        def body_rs(r, fp=fp):
            e, g = jax.value_and_grad(
                lambda rr: cell_list_rspace_energy_rows(
                    calc.potential, q, rr, cell_j, fp.clist, window_impl="xla"
                )
            )(r)
            return r - 1e-9 * g

        run, init = chain(body_rs, rows0)
        timed(f"rspace v+g {tag}", run, init)


if __name__ == "__main__":
    main()
