"""TPU ms/step for the other calculator families at the headline size.

The driver metric (BASELINE.json) spans "PME/P3M energy+force ms/step at
1e-4"; bench.py times monopole PME.  This banks the missing rows:

* **P3M** at its own tuned-1e-4 parameters (P3MErrorBounds screen, the same
  coarsest-qualifying-mesh rule as bench.choose_parameters — the reference's
  tune_p3m parameter choice, /root/reference/src/torchpme/tuning/p3m.py);
* **dipolar PME** (no reference counterpart) at the monopole-tuned mesh
  parameters, with a small-system accuracy cross-check against the
  converged dipolar-Ewald oracle printed alongside.

    python tools/bench_family.py          # 102k atoms, chain=20
"""

from __future__ import annotations

import math
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

N_ATOMS = int(os.environ.get("BENCH_N", 102_000))
CUTOFF = 5.0
ACCURACY = 1e-4
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
    print(f"{name:<56s} {ms:8.2f} ms", flush=True)
    return ms


def choose_p3m_parameters(charges, cell, positions):
    """P3M analog of bench.choose_parameters: same smearing rule, coarsest
    mesh/order meeting the 1e-4 P3M error bound."""
    import jax.numpy as jnp

    from torchpme_tpu.tuning import P3MErrorBounds

    n = positions.shape[0]
    volume = float(abs(np.linalg.det(cell)))
    prefac = 2 * float((charges**2).sum()) / math.sqrt(n)
    ratio = math.sqrt(
        -2 * math.log(ACCURACY / 2 / prefac * math.sqrt(CUTOFF * volume))
    )
    smearing = CUTOFF / ratio

    bounds = P3MErrorBounds(
        jnp.asarray(charges), jnp.asarray(cell), jnp.asarray(positions)
    )
    best = None
    min_dim = float(np.min(np.linalg.norm(cell, axis=1)))
    for nodes in (3, 4, 5):
        for ns in range(3, 9):
            spacing = 2 * min_dim / (2**ns - 1)
            err = float(
                bounds(
                    smearing=smearing,
                    mesh_spacing=spacing,
                    cutoff=CUTOFF,
                    interpolation_nodes=nodes,
                )
            )
            if err <= ACCURACY:
                if best is None or spacing > best[2] or (
                    spacing == best[2] and nodes < best[1]
                ):
                    best = (err, nodes, spacing)
                break
    if best is None:
        raise RuntimeError("no P3M parameters meet the accuracy bound")
    return smearing, best[1], best[2], best[0]


def main():
    import jax
    import jax.numpy as jnp

    import torchpme_tpu as tpme
    from bench import build_system, choose_parameters

    print(f"device={jax.devices()[0]} N={N_ATOMS} chain={CHAIN}", flush=True)
    positions, charges, cell, *_, box = build_system(N_ATOMS, neighbors=False)

    dtype = jnp.float32
    q = jnp.asarray(charges, dtype)
    cell_j = jnp.asarray(cell, dtype)
    pos = jnp.asarray(positions, dtype)

    def chain(body, init):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run, init

    run, init = chain(lambda c: c * 0.9999999 + 1e-30, pos)
    timed("NULL body (chain floor)", run, init)

    # ---- P3M at its own tuned-1e-4 parameters ---------------------------
    sm_p, nodes_p, sp_p, err_p = choose_p3m_parameters(charges, cell, positions)
    calc_p3m = tpme.P3MCalculator(
        tpme.CoulombPotential(smearing=sm_p),
        mesh_spacing=sp_p,
        interpolation_nodes=nodes_p,
    )
    ns_p = calc_p3m.get_ns_mesh(cell_j)
    print(
        f"P3M params: smearing={sm_p:.3f} nodes={nodes_p} spacing={sp_p:.3f} "
        f"mesh={ns_p} err_bound={err_p:.2e}",
        flush=True,
    )
    fp_p3m = tpme.MDFastPath.create(calc_p3m, pos, cell_j, CUTOFF, ns_p)
    rows0 = fp_p3m.bucket(pos)
    print(f"P3M fast path: mesh_impl={fp_p3m.mesh_impl}", flush=True)

    def body_p3m(r):
        e, g = jax.value_and_grad(lambda rr: fp_p3m.energy(q, cell_j, rr))(r)
        return r - 1e-9 * g

    run, init = chain(body_p3m, rows0)
    timed(f"P3M energy+force /step (nodes={nodes_p}, mesh={ns_p[0]}^3)", run, init)

    # ---- monopole PME row (same-session reference point) ----------------
    sm, nodes, sp, err = choose_parameters(charges, cell, positions)
    calc_pme = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=sm),
        mesh_spacing=sp,
        interpolation_nodes=nodes,
    )
    ns_m = calc_pme.get_ns_mesh(cell_j)
    fp_pme = tpme.MDFastPath.create(calc_pme, pos, cell_j, CUTOFF, ns_m)
    rows0 = fp_pme.bucket(pos)

    def body_pme(r):
        e, g = jax.value_and_grad(lambda rr: fp_pme.energy(q, cell_j, rr))(r)
        return r - 1e-9 * g

    run, init = chain(body_pme, rows0)
    timed(f"PME energy+force /step (nodes={nodes}, mesh={ns_m[0]}^3)", run, init)

    # ---- IPL p=3 (dispersion-like) at the monopole-tuned parameters -----
    # (exercises the closed-form gammainc window + the f32 exp1 k-filter)
    calc_ipl = tpme.PMECalculator(
        tpme.InversePowerLawPotential(exponent=3, smearing=sm),
        mesh_spacing=sp,
        interpolation_nodes=nodes,
    )
    fp_ipl = tpme.MDFastPath.create(calc_ipl, pos, cell_j, CUTOFF, ns_m)
    rows0 = fp_ipl.bucket(pos)

    def body_ipl(r):
        e, g = jax.value_and_grad(lambda rr: fp_ipl.energy(q, cell_j, rr))(r)
        return r - 1e-9 * g

    run, init = chain(body_ipl, rows0)
    timed("IPL 1/r^3 energy+force /step (monopole-tuned params)", run, init)

    # ---- dipolar PME at the monopole-tuned mesh parameters --------------
    rng = np.random.default_rng(1)
    mu = jnp.asarray(rng.normal(size=(N_ATOMS, 3)), dtype)
    calc_dip = tpme.PMECalculatorDipole(
        tpme.PotentialDipole(smearing=sm), mesh_spacing=sp
    )
    fp_dip = tpme.MDFastPathDipole.create(calc_dip, pos, cell_j, CUTOFF)
    rows0 = fp_dip.bucket(pos)

    def body_dip(r):
        e, g = jax.value_and_grad(
            lambda rr: fp_dip.energy(mu, cell_j, rr), argnums=0
        )(r)
        return r - 1e-9 * g

    run, init = chain(body_dip, rows0)
    timed("dipolar PME energy+force /step", run, init)

    # accuracy cross-check of the dipolar parameter transfer, small system
    n_small, box_s = 3000, float((3000 / 0.1) ** (1 / 3))
    pos_s = jnp.asarray(rng.uniform(0, box_s, (n_small, 3)))
    mu_s = jnp.asarray(rng.normal(size=(n_small, 3)))
    cell_s = jnp.eye(3) * box_s
    fp_s = tpme.MDFastPathDipole.create(
        tpme.PMECalculatorDipole(tpme.PotentialDipole(smearing=sm), mesh_spacing=sp),
        pos_s, cell_s, CUTOFF,
    )
    e_pme = float(fp_s.energy(mu_s, cell_s, fp_s.bucket(pos_s)))
    ew = tpme.CalculatorDipole(
        tpme.PotentialDipole(smearing=sm), lr_wavelength=sm / 2
    )
    from torchpme_tpu.ops.rspace_cells import compute_cell_list

    clist_s = compute_cell_list(pos_s, cell_s, CUTOFF)
    e_ew = float(
        ew.energy(
            mu_s, cell_s, pos_s, cell_list=clist_s,
            ns_kvectors=ew.get_ns_kvectors(cell_s),
        )
    )
    rel = abs(e_pme - e_ew) / abs(e_ew)
    print(
        f"dipolar accuracy (n=3000 oracle): PME {e_pme:+.6f} vs converged "
        f"Ewald {e_ew:+.6f}, rel {rel:.2e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
