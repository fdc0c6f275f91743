"""TPU A/B: XLA vs Pallas window engines across potential families.

The monopole Pallas window kernel loses on Coulomb (banked r3 + r4: its
Chebyshev pair math replaces one erfc+exp chain, and XLA's fused roll/matmul
engine is already VPU-efficient).  But for the heavier `1/r^p` family the
XLA pair values walk `gammaincc_over_powerlaw` (exp1 / erfc / multiple exp
per candidate slot) while the kernel's Clenshaw evaluation costs the same
~60 FMAs regardless of p — so the kernel should win where the
transcendentals are heavy.  This banks the per-family numbers that set
`md._WINDOW_AUTO_TPU`.

    python tools/ab_window_ipl.py            # 102k atoms, p = 1, 2, 3
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
        vals = {}
        for impl in ("xla", "pallas"):

            def body(r, pot=pot, impl=impl):
                def erows(rr):
                    return cell_list_rspace_energy_rows(
                        pot, q, rr, cell_j, clist, window_impl=impl
                    )

                e, g = jax.value_and_grad(erows)(r)
                return r - 1e-12 * g

            run, init = chain(body, rows_p)
            ms = timed(f"rspace rows v+g [{pname}, {impl}]", run, init)
            vals[impl] = ms
        if vals.get("xla") and vals.get("pallas"):
            print(
                f"  -> {pname}: pallas/xla = "
                f"{vals['pallas'] / vals['xla']:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
