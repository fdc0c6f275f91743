r"""Shared prep core of the Pallas pair-window kernels.

:func:`_build_window_inputs` pre-rolls the cell-list neighbor blocks into
chunk-concatenated ``(G, n_cells, 3, W)`` VMEM-ready arrays (≥128-wide
trailing axis, per-offset center displacement baked in, self-offset charges
½-scaled, identity diagonal marked) — the torus rolls stay in XLA where they
compile to static copies.  The **dipolar** fused window kernel
(:mod:`.window_dipole_pallas`, the TPU default for dipoles: measured ~2×
over the XLA dipolar window at 102k atoms on a v5e) builds on it.

A *monopole* fused window kernel used to live here and was retired in
round 4: on a v5e at 102k atoms it lost the hardware A/B against the XLA
roll/matmul engine for EVERY supported potential family once the math tier
gained closed-form incomplete-gamma kernels (``ops/math.py:
gammainc_over_powerlaw``) — rspace rows value+grad, chain floor subtracted:

=========  ======  =========
potential    XLA     Pallas
=========  ======  =========
Coulomb    4.1 ms   5.3 ms
1/r²       4.4 ms   5.0 ms
1/r³       5.3 ms   5.8 ms
1/r⁶       4.5 ms   5.7 ms
=========  ======  =========

The monopole pair sum is too arithmetic-light for VMEM residency to pay for
the kernel's j-side cotangent write-backs; the XLA engine's candidate chain
fuses completely and its contractions ride the MXU.  (Before the math fix
the kernel won 16–58× at p ≥ 2 — because ``jax.scipy.special.gammainc``'s
``while_loop`` serialized the vector lanes, the library bug worth fixing
instead.)  See PLAN.md round-4 log for the banked numbers.

No reference counterpart: the reference evaluates per-pair tensors over an
explicit neighbor list (``/root/reference/src/torchpme/calculators/
calculator.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["_build_window_inputs", "_interpret"]


def _interpret():
    return jax.default_backend() != "tpu"


def _build_window_inputs(pc_t, q_g, mf_g, offs, chunks):
    """Pre-rolled, chunk-concatenated neighbor blocks (XLA, tiny copies).

    Returns ``(PJ, QJ, MJ, SELF)`` with shapes ``(G, n_cells, 3, W)``,
    ``(G, n_cells, C, W)``, ``(G, n_cells, W)``, ``(G, cap, W)`` — the
    per-offset displacement is baked into PJ, the self-offset charges carry
    the ½ scale, partial chunks are padded with fully-masked dummy offsets,
    and SELF marks the identity diagonal of the self-offset block.  Charge
    channels ride as ``(C, W)`` minor dims so every kernel read is lane-wide.
    """
    nx, ny, nz, _, cap = pc_t.shape
    n_cells = nx * ny * nz
    n_channels = q_g.shape[-1]
    g_max = max(len(c) for c in chunks)
    W = g_max * cap
    dtype = pc_t.dtype

    PJ, QJ, MJ, SELF = [], [], [], []
    k0 = 0
    for chunk in chunks:
        pjs, qjs, mjs = [], [], []
        self_blk = np.zeros((cap, W), np.float32)
        for t, (dx, dy, dz) in enumerate(chunk):
            off = offs[k0 + t]
            w = 0.5 if (dx, dy, dz) == (0, 0, 0) else 1.0
            pjs.append(
                jnp.roll(pc_t, (-dx, -dy, -dz), axis=(0, 1, 2)) + off[:, None]
            )
            qjs.append(jnp.roll(q_g, (-dx, -dy, -dz), axis=(0, 1, 2)) * w)
            mjs.append(jnp.roll(mf_g, (-dx, -dy, -dz), axis=(0, 1, 2)))
            if (dx, dy, dz) == (0, 0, 0):
                self_blk[:, t * cap : (t + 1) * cap] = np.eye(cap, dtype=np.float32)
        pad_t = g_max - len(chunk)
        if pad_t:
            pjs.append(jnp.zeros((*pc_t.shape[:-1], pad_t * cap), dtype))
            qjs.append(jnp.zeros((*q_g.shape[:3], pad_t * cap, n_channels), dtype))
            mjs.append(jnp.zeros((*mf_g.shape[:3], pad_t * cap), dtype))
        PJ.append(jnp.concatenate(pjs, axis=-1).reshape(n_cells, 3, W))
        QJ.append(
            jnp.moveaxis(jnp.concatenate(qjs, axis=-2), -1, -2).reshape(
                n_cells, n_channels, W
            )
        )
        MJ.append(jnp.concatenate(mjs, axis=-1).reshape(n_cells, W))
        SELF.append(self_blk)
        k0 += len(chunk)
    return (
        jnp.stack(PJ),
        jnp.stack(QJ),
        jnp.stack(MJ),
        jnp.asarray(np.stack(SELF), dtype),
    )
