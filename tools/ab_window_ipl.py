"""TPU ms of the real-space window per potential family (XLA engine).

History: this began as the XLA-vs-Pallas A/B that retired the monopole
Pallas window kernel (banked table in ops/pallas/window_pallas.py).  Its
first run also exposed jax.scipy's while_loop gammainc serializing the
vector lanes (215-375 ms/window at p = 2..3) — fixed by the closed forms in
ops/math.py:gammainc_over_powerlaw, after which the XLA engine wins every
family and the kernel was removed.

    python tools/ab_window_ipl.py            # 102k atoms, p = 1, 2, 3, 6
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

    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as exc:  # noqa: BLE001
        lines = str(exc).splitlines() or ["?"]
        print(f"{name:<52s} FAILED: {lines[0][:110]}", flush=True)
        return None
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
    fp = tpme.MDFastPath.create(calc, pos, cell_j, CUTOFF, ns)
    clist = fp.clist
    rows_p = fp.bucket(pos)
    n_cells, cap = clist.slot_mask.shape
    print(f"cells={clist.n_axis} cap={cap}", flush=True)

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    run, init = chain(lambda c: c * 0.9999999 + 1e-30, rows_p)
    timed("NULL body (chain floor)", run, init)

    pots = [
        ("coulomb p=1", tpme.CoulombPotential(smearing=smearing)),
        ("ipl p=2", tpme.InversePowerLawPotential(exponent=2, smearing=smearing)),
        ("ipl p=3", tpme.InversePowerLawPotential(exponent=3, smearing=smearing)),
        ("ipl p=6", tpme.InversePowerLawPotential(exponent=6, smearing=smearing)),
    ]
    for pname, pot in pots:

        def body(r, pot=pot):
            def erows(rr):
                return cell_list_rspace_energy_rows(pot, q, rr, cell_j, clist)

            e, g = jax.value_and_grad(erows)(r)
            return r - 1e-12 * g

        run, init = chain(body, rows_p)
        timed(f"rspace rows v+g [{pname}]", run, init)


if __name__ == "__main__":
    main()
