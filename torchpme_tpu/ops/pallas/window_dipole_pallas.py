r"""Fused Pallas dipolar pair-window kernel: energy + every gradient in VMEM.

The dipolar counterpart of :mod:`.window_pallas` — the XLA dipolar window
engine (:func:`torchpme_tpu.ops.rspace_cells_dipole._dw_value_and_grad`)
materializes ~18 ``(n_cells, cap, W)`` candidate planes per offset chunk in
HBM (``mumu``, ``ri``, ``rj``, the pair weight ``s`` and its four cross
contractions); this kernel keeps the whole contraction algebra in VMEM,
streaming only the O(atoms) inputs and cotangents.

Same architecture as the scalar kernel:

* the prep (reused verbatim: :func:`.window_pallas._build_window_inputs`
  with the 3 dipole components riding the charge-channel axis) pre-rolls the
  neighbor blocks into chunk-concatenated ``(G, n_cells, 3, W)`` arrays with
  the per-offset displacement baked into the positions and the self-offset
  dipoles ½-scaled;
* per cell block the kernel forms the pair geometry, evaluates the
  ``(B, C, C')`` scalars via the potential's ``window_scalar_math`` hook
  (transcendental-free Chebyshev/Clenshaw fits of the *entire* SR
  numerators — :func:`torchpme_tpu.ops.polyfit.dipole_window_scalar_math` —
  or exact rational math in direct mode), and reduces the full cotangent
  algebra of ``_dw_value_and_grad`` in VMEM registers;
* the j-side position/dipole cotangents are written back per chunk and
  un-rolled home OUTSIDE the kernel (tiny XLA copies), so the kernel is a
  drop-in for the dipolar custom-VJP forward — staleness poison, the rows
  API, and the sharded split window are untouched.

No reference counterpart: the reference dipolar calculator materializes
per-pair 3×3 tensors over an explicit neighbor list
(``/root/reference/src/torchpme/calculators/calculator_dipole.py``); this is
the TPU formulation of the same pair sum.  float32 on hardware;
``interpret=True`` runs on CPU for correctness tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_pallas import _build_window_inputs, _interpret

__all__ = [
    "can_use_pallas_dipole_window",
    "exact_dipole_scalar_math",
    "pallas_dipole_window_value_and_grad",
]


def can_use_pallas_dipole_window(potential, cutoff) -> bool:
    """Whether the fused dipolar Pallas kernel can serve this potential.

    Requires a kernel-ready ``window_scalar_math`` (concrete parameters, no
    exclusion window, fits within tolerance).  The analytic gate
    (:func:`rspace_cells_dipole._can_use_analytic_dipole`) must ALSO hold —
    the kernel produces no potential-parameter cotangents."""
    hook = getattr(potential, "window_scalar_math", None)
    if hook is None:
        return False
    return hook(float(cutoff)) is not None


def exact_dipole_scalar_math(potential):
    """``d -> (B, C, C')`` calling the potential's own (transcendental) ops.

    Matches the XLA dipolar engine bit-for-bit where Mosaic lowers the ops
    (erfc, exp); used for interpret-mode plumbing tests and as a hardware
    A/B reference."""
    from ..rspace_cells_dipole import _scalar_hooks

    scalars, cderiv = _scalar_hooks(potential)

    def scalar_math(d):
        b, c = scalars(d)
        return b, c, cderiv(d, b, c)

    return scalar_math


def _dipole_window_kernel(
    pc_ref, mui_ref, pj_ref, muj_ref, mj_ref, self_ref,
    e_ref, dpc_ref, dmui_ref, dpj_ref, dmuj_ref,
    *, scalar_math, cutoff_sq, n_chunks,
):
    """One cell block: dipolar window energy + every gradient, in VMEM.

    Shapes (B = cell block, W = chunk width, G = chunks):
    ``pc (B,3,cap)``, ``mui (B,3,cap)``, ``pj (G,B,3,W)``, ``muj (G,B,3,W)``,
    ``mj (G,B,W)``, ``self (G,cap,W)`` → ``e (1,1)``, ``dpc (B,3,cap)``,
    ``dmui (B,3,cap)``, ``dpj (G,B,3,W)``, ``dmuj (G,B,3,W)``.

    Cotangent algebra is term-for-term ``_dw_value_and_grad``'s, unrolled
    over the 3 vector components so every reduction is a lane-wide
    ``(B, cap, W)`` elementwise product + sum."""
    dtype = pc_ref.dtype
    B, _, cap = pc_ref.shape
    zero = jnp.zeros((), dtype)

    e_acc = zero
    dpc = [jnp.zeros((B, cap), dtype) for _ in range(3)]
    dmui = [jnp.zeros((B, cap), dtype) for _ in range(3)]
    pc_c = [pc_ref[:, c, :] for c in range(3)]
    mui_c = [mui_ref[:, c, :] for c in range(3)]

    for g in range(n_chunks):  # static unroll over offset chunks
        pj_c = [pj_ref[g, :, c, :] for c in range(3)]
        muj_c = [muj_ref[g, :, c, :] for c in range(3)]
        # r = p_j − p_i (the per-offset displacement is baked into pj)
        rv = [pj_c[c][:, None, :] - pc_c[c][:, :, None] for c in range(3)]
        d_sq = rv[0] * rv[0] + rv[1] * rv[1] + rv[2] * rv[2]
        ok = (
            (d_sq > zero)
            & (d_sq < cutoff_sq)
            & (mj_ref[g][:, None, :] > 0.5)
            & (self_ref[g][None, :, :] < 0.5)
        )
        d = jnp.sqrt(jnp.where(ok, d_sq, jnp.ones((), dtype)))
        okf = ok.astype(dtype)
        b, c_, cp = scalar_math(d)
        bt = okf * b
        ct = okf * c_
        mumu = zero
        ri = zero
        rj = zero
        for c in range(3):
            mumu = mumu + mui_c[c][:, :, None] * muj_c[c][:, None, :]
            ri = ri + mui_c[c][:, :, None] * rv[c]
            rj = rj + muj_c[c][:, None, :] * rv[c]
        rirj = ri * rj
        e_acc = e_acc + jnp.sum(bt * mumu - ct * rirj)

        # pair weight s = (B'M − C'RiRj)/d with B' = −C·d
        s = -(ct * mumu) - (okf * cp / d) * rirj
        ct_rj = ct * rj
        ct_ri = ct * ri
        rowsum = jnp.sum(s, axis=-1)  # (B, cap)
        colsum = jnp.sum(s, axis=1)  # (B, W)
        row_rj = jnp.sum(ct_rj, axis=-1)  # (B, cap)
        col_ri = jnp.sum(ct_ri, axis=1)  # (B, W)
        for c in range(3):
            cross_i = jnp.sum(s * pj_c[c][:, None, :], axis=-1)
            cross_j = jnp.sum(s * pc_c[c][:, :, None], axis=1)
            dpc[c] = (
                dpc[c]
                + pc_c[c] * rowsum
                - cross_i
                + mui_c[c] * row_rj
                + jnp.sum(ct_ri * muj_c[c][:, None, :], axis=-1)
            )
            dpj_ref[g, :, c, :] = (
                pj_c[c] * colsum
                - cross_j
                - jnp.sum(ct_rj * mui_c[c][:, :, None], axis=1)
                - muj_c[c] * col_ri
            )
            dmui[c] = (
                dmui[c]
                + jnp.sum(bt * muj_c[c][:, None, :], axis=-1)
                - jnp.sum(ct_rj * pj_c[c][:, None, :], axis=-1)
                + pc_c[c] * row_rj
            )
            dmuj_ref[g, :, c, :] = (
                jnp.sum(bt * mui_c[c][:, :, None], axis=1)
                - pj_c[c] * col_ri
                + jnp.sum(ct_ri * pc_c[c][:, :, None], axis=1)
            )

    # Mosaic only accepts SMEM output blocks whose dims equal the array dims,
    # so the per-block energies share one (nb, 1) SMEM buffer: every grid step
    # maps to the same block and writes its own slot.
    e_ref[pl.program_id(0), 0] = e_acc
    for c in range(3):
        dpc_ref[:, c, :] = dpc[c]
        dmui_ref[:, c, :] = dmui[c]


def _pick_block(n_cells: int, cap: int, W: int, n_chunks: int) -> int:
    """Cell-block size targeting ~6 MB of live (B, cap, W) intermediates.

    The dipolar algebra keeps ~26 candidate planes live (geometry, scalars,
    the three dot products, the weight and its four cross reductions) —
    about 2.5× the scalar kernel's footprint."""
    budget = 6 * 2**20
    per_cell = 4 * cap * W * 26
    b = max(8, min(128, (budget // per_cell) // 8 * 8))
    return min(b, -(-n_cells // 8) * 8)


def _run_dipole_window_kernel(
    scalar_math, cutoff, pc_t, mu_g, mf_g, offs, chunks, mui_g
):
    """Build inputs, launch the kernel, and un-roll the j-side cotangents.

    Returns ``(e, d_pc, d_mu, d_offs, d_mui)`` in the grid layouts of
    ``_dw_value_and_grad`` (``d_mui`` is None unless ``mui_g`` was given)."""
    nx, ny, nz, _, cap = pc_t.shape
    n_cells = nx * ny * nz
    dtype = pc_t.dtype
    split = mui_g is not None

    # the scalar prep generalizes verbatim: dipole components ride the
    # charge-channel axis (3 channels), self-offset ½ baked into MUJ
    PJ, MUJ, MJ, SELF = _build_window_inputs(pc_t, mu_g, mf_g, offs, chunks)
    G, _, _, W = PJ.shape
    mui = mu_g if mui_g is None else mui_g
    pc_flat = pc_t.reshape(n_cells, 3, cap)
    mui_flat = jnp.moveaxis(mui.reshape(n_cells, cap, 3), -1, -2)

    B = _pick_block(n_cells, cap, W, G)
    n_pad = -(-n_cells // B) * B
    if n_pad != n_cells:
        pad = [(0, n_pad - n_cells)]
        pc_flat = jnp.pad(pc_flat, pad + [(0, 0)] * 2)
        mui_flat = jnp.pad(mui_flat, pad + [(0, 0)] * 2)
        PJ = jnp.pad(PJ, [(0, 0)] + pad + [(0, 0)] * 2)
        MUJ = jnp.pad(MUJ, [(0, 0)] + pad + [(0, 0)] * 2)
        MJ = jnp.pad(MJ, [(0, 0)] + pad + [(0, 0)])
    nb = n_pad // B

    kernel = lambda *refs: _dipole_window_kernel(  # noqa: E731
        *refs,
        scalar_math=scalar_math,
        cutoff_sq=jnp.asarray(float(cutoff) ** 2, dtype),
        n_chunks=G,
    )
    e_blk, dpc, dmui, dPJ, dMUJ = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((B, 3, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (G, B, 3, W), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, B, 3, W), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((G, B, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, cap, W), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 3, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 3, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (G, B, 3, W), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, B, 3, W), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1), dtype),
            jax.ShapeDtypeStruct((n_pad, 3, cap), dtype),
            jax.ShapeDtypeStruct((n_pad, 3, cap), dtype),
            jax.ShapeDtypeStruct((G, n_pad, 3, W), dtype),
            jax.ShapeDtypeStruct((G, n_pad, 3, W), dtype),
        ],
        interpret=_interpret(),
    )(pc_flat, mui_flat, PJ, MUJ, MJ, SELF)

    e = jnp.sum(e_blk)
    grid5 = (nx, ny, nz, 3, cap)
    d_pc = dpc[:n_cells].reshape(grid5)
    d_mui_grid = jnp.moveaxis(
        dmui[:n_cells].reshape(nx, ny, nz, 3, cap), -2, -1
    )  # (x, y, z, cap, 3) — the mu grid layout
    dPJ = dPJ[:, :n_cells].reshape(G, nx, ny, nz, 3, W)
    dMUJ = jnp.moveaxis(
        dMUJ[:, :n_cells].reshape(G, nx, ny, nz, 3, W), -2, -1
    )  # (G, x, y, z, W, 3)

    # un-roll the j-side cotangents home (the transpose of the prep rolls;
    # the self block's ½ rides w, exactly like the XLA engine)
    d_mu = jnp.zeros_like(mu_g)
    d_offs = jnp.zeros_like(offs)
    k0 = 0
    for g, chunk in enumerate(chunks):
        for t, (dx, dy, dz) in enumerate(chunk):
            w = 0.5 if (dx, dy, dz) == (0, 0, 0) else 1.0
            blk_p = dPJ[g][..., t * cap : (t + 1) * cap]
            blk_mu = dMUJ[g][..., t * cap : (t + 1) * cap, :]
            d_pc = d_pc + jnp.roll(blk_p, (dx, dy, dz), axis=(0, 1, 2))
            d_mu = d_mu + jnp.roll(blk_mu, (dx, dy, dz), axis=(0, 1, 2)) * w
            d_offs = d_offs.at[k0 + t].add(jnp.sum(blk_p, axis=(0, 1, 2, 4)))
        k0 += len(chunk)
    if split:
        return e, d_pc, d_mu, d_offs, d_mui_grid
    return e, d_pc, d_mu + d_mui_grid, d_offs, None


def pallas_dipole_window_value_and_grad(
    spec, potential, pc_t, mu_g, mf_g, offs, mui_g=None
):
    """Drop-in Pallas replacement for
    ``rspace_cells_dipole._dw_value_and_grad`` — same return structure
    (value + cotangents for every primal); the potential cotangent is the
    structural-zeros tree of the analytic path (the caller's gate guarantees
    concrete parameters)."""
    cutoff = spec[0]
    chunks = spec[1]
    scalar_math = potential.window_scalar_math(float(cutoff))
    if scalar_math is None:  # pragma: no cover - callers gate on can_use
        raise ValueError("potential has no kernel-ready window scalar math")
    e, d_pc, d_mu, d_offs, d_mui = _run_dipole_window_kernel(
        scalar_math, cutoff, pc_t, mu_g, mf_g, offs, chunks, mui_g
    )
    d_pot = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(jnp.asarray(x)), potential
    )
    if mui_g is not None:
        return e, (d_pot, d_pc, d_mu, jnp.zeros_like(mf_g), d_offs, d_mui)
    return e, (d_pot, d_pc, d_mu, jnp.zeros_like(mf_g), d_offs)
