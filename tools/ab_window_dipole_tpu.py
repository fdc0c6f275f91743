"""TPU correctness sweep: dipolar window engine 'pallas' vs 'xla'.

The dipolar fused Pallas pair kernel is default-on on TPU
(``md._WINDOW_AUTO_TPU_DIPOLE``); this drives several system shapes the
single profile A/B (tools/profile_window_dipole.py) does not: odd atom
counts, explicit tight capacity with spill, larger/noncubic boxes, and a
smearing sweep.  Pure correctness (energy + every gradient), no timing —
safe to run while the CPU test suite hogs the host.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme


def drive(n, box, cutoff, smearing, seed, capacity=None, spill=None):
    rng = np.random.default_rng(seed)
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)), dtype=jnp.float32)
    dipoles = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    cell = jnp.asarray(np.diag([box, box * 1.1, box * 0.95]), jnp.float32)
    calc = tpme.CalculatorDipole(
        tpme.PotentialDipole(smearing=smearing), lr_wavelength=smearing * 2
    )

    outs = {}
    for impl in ("xla", "pallas"):
        fp = tpme.MDFastPathDipole.create(
            calc,
            positions,
            cell,
            cutoff=cutoff,
            cell_capacity=capacity,
            window_impl=impl,
            _spill=spill,
        )
        rows = fp.bucket(positions)

        def energy(mu, cl, rw, fp=fp):
            return fp.energy(mu, cl, rw)

        e, grads = jax.jit(jax.value_and_grad(energy, argnums=(0, 1, 2)))(
            dipoles, cell, rows
        )
        outs[impl] = (float(e), [np.asarray(g) for g in grads], fp)

    e_x, g_x, fpx = outs["xla"]
    e_p, g_p, _ = outs["pallas"]
    rel_e = abs(e_p - e_x) / max(abs(e_x), 1e-30)
    rels = [
        float(
            np.linalg.norm(gp - gx) / max(np.linalg.norm(gx), 1e-30)
        )
        for gp, gx in zip(g_p, g_x)
    ]
    cap = fpx.clist.slot_mask.shape[1]
    print(
        f"n={n:6d} box={box:6.1f} cut={cutoff} sm={smearing} cap={cap}"
        f" | rel_e={rel_e:.2e} rel_gmu={rels[0]:.2e}"
        f" rel_gcell={rels[1]:.2e} rel_grows={rels[2]:.2e}"
    )
    # Both engines run in f32 with different summation orders; checked
    # against an f64 oracle (2026-08-19): each lands ~1e-5 rel from f64 on
    # a 4k system, so engine-vs-engine energy differences up to a few e-5
    # are accumulation noise, not kernel bugs.  Gradients are per-row (less
    # cancellation) and agree to ~1e-6.
    ok = rel_e < 5e-5 and all(r < 1e-4 for r in rels)
    if not ok:
        print("  MISMATCH", file=sys.stderr)
    return ok


def main():
    ok = True
    ok &= drive(257, 12.0, 3.0, 1.0, seed=1)  # odd count, small box
    ok &= drive(4096, 35.0, 4.0, 1.3, seed=2)  # medium
    ok &= drive(4000, 34.0, 4.0, 1.3, seed=3, capacity=8, spill=True)  # spill
    ok &= drive(20001, 60.0, 5.0, 1.5, seed=4)  # large, odd
    ok &= drive(1000, 22.0, 5.5, 0.8, seed=5)  # small smearing, big cutoff
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
