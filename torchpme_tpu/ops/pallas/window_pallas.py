r"""Fused Pallas pair-window kernel: the cell-list energy+force pass in VMEM.

The XLA window engine (:func:`torchpme_tpu.ops.rspace_cells._we_value_and_grad`)
is HBM-bound, not compute-bound: each offset chunk materializes several
``(n_cells, cap, W)`` candidate tensors (d², masks, pair values, pair forces —
~300 MB each at 102k atoms / cap 32), and the measured 4.0 ms "geometry only"
cost of the window at 102k atoms on a v5e is almost entirely those HBM round
trips (the arithmetic alone is ~0.7 ms of VPU work).

This module computes the WHOLE window pass — energy and every gradient — in
one Pallas kernel whose candidate tensors never leave VMEM:

* the *inputs* of the window are tiny (``pc_t`` is 2 MB at 102k atoms), so the
  torus rolls stay in XLA where they compile to static copies: the prep
  pre-rolls the neighbor blocks into chunk-concatenated ``(G, n_cells, 3, W)``
  arrays (≥128-wide trailing axis, same layout rule as the XLA engine) with
  the per-offset center displacement baked in and the self-offset charges
  ½-scaled (:func:`rspace_cells._chunk_geometry` conventions);
* the kernel grids over cell blocks; per block it forms d², the pair mask,
  the pair energies and the analytic pair-force weights ``s_ij``, and reduces
  them into the energy, the i-side position/charge gradients, and the j-side
  (rolled) position/charge gradients — all in VMEM registers;
* the j-side gradients are written back per chunk and un-rolled OUTSIDE the
  kernel (again tiny XLA copies), reproducing the exact cotangent algebra of
  ``_we_value_and_grad`` — the kernel is a drop-in for the custom-VJP forward,
  so the spill side-list, staleness poison, and the bucket-order rows API are
  untouched.

The pair math itself comes from the potential's ``window_pair_math(cutoff)``
hook.  For the range-separated ``1/r^p`` family (Coulomb is p = 1) that hook
returns **transcendental-free Chebyshev/Clenshaw evaluations**:
``Q(p/2, (αr)²)`` and ``exp(-α²r²)`` are entire functions, so adaptive-degree
(≈14–18) fits on the full ``[0, cutoff]`` domain reach ~2e-7 absolute error —
below f32 roundoff, i.e. numerically indistinguishable from libm on the f32
fast path — while replacing the VPU-expensive transcendentals (erf measured
at ~29 Gelem/s on a v5e) with ~60 fused multiply-adds.  No domain guard is
needed: the fits are valid down to r = 0 and the masked-candidate placeholder
d = 1 lies inside the domain.

No reference counterpart: the reference evaluates per-pair tensors over an
explicit neighbor list (``/root/reference/src/torchpme/calculators/
calculator.py``); this is the TPU formulation of the same pair sum.
float32 on hardware; ``interpret=True`` runs on CPU for correctness tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "can_use_pallas_window",
    "exact_pair_math",
    "pallas_window_value_and_grad",
]


def _interpret():
    return jax.default_backend() != "tpu"


def can_use_pallas_window(potential, cutoff) -> bool:
    """Whether the Pallas window kernel can serve this potential.

    Requires the ``window_pair_math`` hook to produce a kernel-ready pair
    math (concrete parameters, fit within tolerance).  The analytic-derivative
    gate (:func:`rspace_cells._can_use_analytic_derivative`) must ALSO hold —
    the kernel produces no potential-parameter cotangents."""
    hook = getattr(potential, "window_pair_math", None)
    if hook is None:
        return False
    return hook(float(cutoff)) is not None


def exact_pair_math(potential):
    """Kernel pair math calling the potential's own (transcendental) jnp ops.

    Matches the XLA engine bit-for-bit where Mosaic lowers the ops (erf, exp);
    used for interpret-mode plumbing tests and as a hardware A/B reference.
    Requires the analytic hooks (``sr_derivative``/``sr_pair_force``)."""
    from ..rspace_cells import _potential_pair_values

    pair_force = getattr(potential, "sr_pair_force", None)
    deriv = getattr(potential, "sr_derivative", None)

    def pair_math(d, ok, q_pair):
        zero = jnp.zeros((), d.dtype)
        vq = jnp.where(ok, q_pair, zero)
        v_raw = _potential_pair_values(potential, d)
        pair_e = vq * v_raw
        if pair_force is not None:
            dd = pair_force(d, vq, pair_e)
        else:
            dd = vq * deriv(d, v_raw)
        return pair_e, dd / d, jnp.where(ok, v_raw, zero)

    return pair_math


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


def _window_kernel(
    pc_ref, qi_ref, pj_ref, qj_ref, mj_ref, self_ref,
    e_ref, dpc_ref, dqi_ref, dpj_ref, dqj_ref,
    *, pair_math, cutoff_sq, n_chunks,
):
    """One cell block: energy + every gradient of the pair window, in VMEM.

    Shapes (B = cell block, W = chunk width, G = chunks, C = channels):
    ``pc (B,3,cap)``, ``qi (B,C,cap)``, ``pj (G,B,3,W)``, ``qj (G,B,C,W)``,
    ``mj (G,B,W)``, ``self (G,cap,W)`` → ``e (1,1)``, ``dpc (B,3,cap)``,
    ``dqi (B,C,cap)``, ``dpj (G,B,3,W)``, ``dqj (G,B,C,W)``.
    """
    dtype = pc_ref.dtype
    B, _, cap = pc_ref.shape
    n_channels = qi_ref.shape[1]
    zero = jnp.zeros((), dtype)

    e_acc = zero
    dpc = [jnp.zeros((B, cap), dtype) for _ in range(3)]
    dqi = [jnp.zeros((B, cap), dtype) for _ in range(n_channels)]
    pc_c = [pc_ref[:, c, :] for c in range(3)]
    qi_c = [qi_ref[:, c, :] for c in range(n_channels)]

    for g in range(n_chunks):  # static unroll over offset chunks
        pj_c = [pj_ref[g, :, c, :] for c in range(3)]
        dx = [pc_c[c][:, :, None] - pj_c[c][:, None, :] for c in range(3)]
        d_sq = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2]
        ok = (
            (d_sq > zero)
            & (d_sq < cutoff_sq)
            & (mj_ref[g][:, None, :] > 0.5)
            & (self_ref[g][None, :, :] < 0.5)
        )
        d = jnp.sqrt(jnp.where(ok, d_sq, jnp.ones((), dtype)))
        q_pair = zero
        for c in range(n_channels):
            q_pair = q_pair + qi_c[c][:, :, None] * qj_ref[g, :, c, :][:, None, :]
        pair_e, s, v = pair_math(d, ok, q_pair)
        e_acc = e_acc + jnp.sum(pair_e)
        # charge cotangents
        for c in range(n_channels):
            dqi[c] = dqi[c] + jnp.sum(v * qj_ref[g, :, c, :][:, None, :], axis=-1)
            dqj_ref[g, :, c, :] = jnp.sum(v * qi_c[c][:, :, None], axis=1)
        # position cotangents: ∂E/∂pc_i = Σ_j s_ij (pc_i − pj_j), j-side mirrored
        rowsum = jnp.sum(s, axis=-1)  # (B, cap)
        colsum = jnp.sum(s, axis=1)  # (B, W)
        for c in range(3):
            cross_i = jnp.sum(s * pj_c[c][:, None, :], axis=-1)
            cross_j = jnp.sum(s * pc_c[c][:, :, None], axis=1)
            dpc[c] = dpc[c] + pc_c[c] * rowsum - cross_i
            dpj_ref[g, :, c, :] = pj_c[c] * colsum - cross_j

    # Mosaic only accepts SMEM output blocks whose dims equal the array dims,
    # so the per-block energies share one (nb, 1) SMEM buffer: every grid step
    # maps to the same block and writes its own slot.
    e_ref[pl.program_id(0), 0] = e_acc
    for c in range(3):
        dpc_ref[:, c, :] = dpc[c]
    for c in range(n_channels):
        dqi_ref[:, c, :] = dqi[c]


def _pick_block(n_cells: int, cap: int, W: int, n_chunks: int) -> int:
    """Cell-block size targeting ~6 MB of live (B, cap, W) intermediates."""
    budget = 6 * 2**20
    per_cell = 4 * cap * W * 10  # ~10 live candidate planes, f32
    b = max(8, min(128, (budget // per_cell) // 8 * 8))
    return min(b, -(-n_cells // 8) * 8)


def _run_window_kernel(pair_math, cutoff, pc_t, q_g, mf_g, offs, chunks, qi_g):
    """Build inputs, launch the kernel, and un-roll the j-side cotangents.

    Returns ``(e, d_pc, d_q, d_offs, d_qi)`` in the grid layouts of
    ``_we_value_and_grad`` (``d_qi`` is None unless ``qi_g`` was given)."""
    nx, ny, nz, _, cap = pc_t.shape
    n_cells = nx * ny * nz
    n_channels = q_g.shape[-1]
    dtype = pc_t.dtype
    split = qi_g is not None

    PJ, QJ, MJ, SELF = _build_window_inputs(pc_t, q_g, mf_g, offs, chunks)
    G, _, _, W = PJ.shape
    qi = q_g if qi_g is None else qi_g
    pc_flat = pc_t.reshape(n_cells, 3, cap)
    qi_flat = jnp.moveaxis(qi.reshape(n_cells, cap, n_channels), -1, -2)

    B = _pick_block(n_cells, cap, W, G)
    n_pad = -(-n_cells // B) * B
    if n_pad != n_cells:
        pad = [(0, n_pad - n_cells)]
        pc_flat = jnp.pad(pc_flat, pad + [(0, 0)] * 2)
        qi_flat = jnp.pad(qi_flat, pad + [(0, 0)] * 2)
        PJ = jnp.pad(PJ, [(0, 0)] + pad + [(0, 0)] * 2)
        QJ = jnp.pad(QJ, [(0, 0)] + pad + [(0, 0)] * 2)
        MJ = jnp.pad(MJ, [(0, 0)] + pad + [(0, 0)])
    nb = n_pad // B

    kernel = lambda *refs: _window_kernel(  # noqa: E731
        *refs,
        pair_math=pair_math,
        cutoff_sq=jnp.asarray(float(cutoff) ** 2, dtype),
        n_chunks=G,
    )
    e_blk, dpc, dqi, dPJ, dQJ = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B, 3, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (B, n_channels, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, B, 3, W), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, B, n_channels, W),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((G, B, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, cap, W), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 3, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (B, n_channels, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, B, 3, W), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, B, n_channels, W),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1), dtype),
            jax.ShapeDtypeStruct((n_pad, 3, cap), dtype),
            jax.ShapeDtypeStruct((n_pad, n_channels, cap), dtype),
            jax.ShapeDtypeStruct((G, n_pad, 3, W), dtype),
            jax.ShapeDtypeStruct((G, n_pad, n_channels, W), dtype),
        ],
        interpret=_interpret(),
    )(pc_flat, qi_flat, PJ, QJ, MJ, SELF)

    e = jnp.sum(e_blk)
    grid5 = (nx, ny, nz, 3, cap)
    d_pc = dpc[:n_cells].reshape(grid5)
    d_qi_grid = jnp.moveaxis(
        dqi[:n_cells].reshape(nx, ny, nz, n_channels, cap), -2, -1
    )
    dPJ = dPJ[:, :n_cells].reshape(G, nx, ny, nz, 3, W)
    dQJ = jnp.moveaxis(
        dQJ[:, :n_cells].reshape(G, nx, ny, nz, n_channels, W), -2, -1
    )  # (G, x, y, z, W, C)

    # un-roll the j-side cotangents home (the transpose of the prep rolls)
    d_q = jnp.zeros_like(q_g)
    d_offs = jnp.zeros_like(offs)
    k0 = 0
    for g, chunk in enumerate(chunks):
        for t, (dx, dy, dz) in enumerate(chunk):
            w = 0.5 if (dx, dy, dz) == (0, 0, 0) else 1.0
            blk_p = dPJ[g][..., t * cap : (t + 1) * cap]
            blk_q = dQJ[g][..., t * cap : (t + 1) * cap, :]
            d_pc = d_pc + jnp.roll(blk_p, (dx, dy, dz), axis=(0, 1, 2))
            d_q = d_q + jnp.roll(blk_q, (dx, dy, dz), axis=(0, 1, 2)) * w
            d_offs = d_offs.at[k0 + t].add(jnp.sum(blk_p, axis=(0, 1, 2, 4)))
        k0 += len(chunk)
    if split:
        return e, d_pc, d_q, d_offs, d_qi_grid
    return e, d_pc, d_q + d_qi_grid, d_offs, None


def pallas_window_value_and_grad(spec, potential, pc_t, q_g, mf_g, offs, qi_g=None):
    """Drop-in Pallas replacement for ``rspace_cells._we_value_and_grad``.

    Same return structure (value + cotangents for every primal); the
    potential cotangent is the structural-zeros tree of the analytic path
    (the caller's gate guarantees concrete parameters)."""
    cutoff = spec[0]
    chunks = spec[1]
    pair_math = potential.window_pair_math(float(cutoff))
    if pair_math is None:  # pragma: no cover - callers gate on can_use
        raise ValueError("potential has no kernel-ready window pair math")
    e, d_pc, d_q, d_offs, d_qi = _run_window_kernel(
        pair_math, cutoff, pc_t, q_g, mf_g, offs, chunks, qi_g
    )
    d_pot = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(jnp.asarray(x)), potential
    )
    if qi_g is not None:
        return e, (d_pot, d_pc, d_q, jnp.zeros_like(mf_g), d_offs, d_qi)
    return e, (d_pot, d_pc, d_q, jnp.zeros_like(mf_g), d_offs)
