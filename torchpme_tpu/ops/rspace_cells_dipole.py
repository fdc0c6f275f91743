r"""Cell-list window energy for dipolar (3×3 tensor) pair kernels.

Extends the scalar cell-list engine (:mod:`torchpme_tpu.ops.rspace_cells`:
gather-free 27-cell torus windows, batched pair blocks, half-window with the
self block ½-scaled) to point-dipole interactions.  The tensor kernel is
never materialized: every dipolar pair kernel here is
``K(r) = B(r)·I − C(r)·r⊗r``, so the pair energy contracts as

.. math:: \mu_i^T K(r_{ij}) \mu_j
          = B(d)\,(\mu_i\cdot\mu_j) − C(d)\,(\mu_i\cdot r)(\mu_j\cdot r)

with the dot products built from the window's existing position blocks
(``μ·r = μ·p_j − μ·p_i`` — no ``(…, cap, W, 3)`` displacement tensor).

Like the scalar engine, the energy rides a **fused value-and-gradient custom
VJP** when the potential's parameters are concrete: since ``K`` is a gradient
field, ``dB/dr = −C·r`` holds identically, so the analytic pair forces need
only the potential's ``(sr_)scalar_kernel_derivative`` hook (``C′``, one new
``exp``) — per chunk,

.. math:: \partial E/\partial p_i = \sum_j\bigl[-s_{ij}\,r_{ij}
          + C_{ij}(R^j_{ij}\mu_i + R^i_{ij}\mu_j)\bigr],\qquad
          s = \bigl(B'M - C'R^iR^j\bigr)/d,

with every term an MXU-batched contraction and only O(atoms) residuals
(trainable dipolar potentials keep the plain autodiff path automatically).

No reference counterpart: the reference's dipolar calculator is pair-list
only (``/root/reference/src/torchpme/calculators/calculator_dipole.py``);
this is the TPU cell-list fast path applied to it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .math import inv3
from jax import Array

from .rspace_cells import (
    CellList,
    _chunk_geometry,
    _prepare,
    _prepare_extras,
    _prepare_extras_bucketed,
    _we_bwd,
)

__all__ = [
    "cell_list_rspace_dipole_energy",
    "cell_list_rspace_dipole_energy_rows",
]


def cell_list_rspace_dipole_energy(
    potential,
    dipoles: Array,
    positions: Array,
    cell: Array,
    clist: CellList,
    window_impl: str = "xla",
) -> Array:
    r"""Total real-space dipolar energy from a cell list (scalar).

    Each unordered pair within the cutoff is counted exactly once; matches
    ``sum(CalculatorDipole._compute_rspace(...) * dipoles)`` on the same
    pair set.  ``NaN`` when the bucketing is stale, like every bucketed
    fast path.

    :param potential: a :class:`~torchpme_tpu.potentials.PotentialDipole`;
        its ``smearing`` decides the short-range vs direct scalars.
    :param dipoles: ``(N, 3)`` point dipoles.
    :param clist: from :func:`~torchpme_tpu.ops.compute_cell_list`.  The
        overflow side list is not supported here — build with an explicit
        ``capacity`` (``spill=False``) for inhomogeneous systems.
    :param window_impl: ``"xla"`` (the roll/einsum engine) or ``"pallas"``
        (the fused VMEM kernel,
        :mod:`torchpme_tpu.ops.pallas.window_dipole_pallas`).
    """
    pc_t, mu_g, mf_g, offs, valid, chunks = _prepare(
        dipoles, positions, cell, clist
    )
    e0 = _dipole_window_energy(
        potential, pc_t, mu_g, mf_g, offs, chunks, clist, window_impl
    )
    if clist.extra_index is not None:
        pe, pe_abs, mue, valid_e = _prepare_extras(
            dipoles, positions, cell, clist
        )
        e0 = e0 + _extras_dipole_energy(
            potential, pc_t, mu_g, mf_g, pe, pe_abs, mue, clist, cell
        )
        valid = valid & valid_e
    return e0 * jnp.where(valid, 1.0, jnp.nan).astype(e0.dtype)


def cell_list_rspace_dipole_energy_rows(
    potential,
    dipoles: Array,
    pos_rows: Array,
    cell: Array,
    clist: CellList,
    window_impl: str = "xla",
) -> Array:
    r"""Dipolar window energy from positions in bucket-ROW order — the
    dipolar counterpart of
    :func:`~torchpme_tpu.ops.rspace_cells.cell_list_rspace_energy_rows`:
    no O(atoms) gather in the step, force gradient returned in row layout
    with no scatter.  Values and gradients equal
    :func:`cell_list_rspace_dipole_energy` up to the row permutation.
    """
    from .rspace_cells import _prepare_bucketed

    n_cells, cap = clist.slot_mask.shape
    nb = n_cells * cap
    dtype = pos_rows.dtype
    pc_t, mu_g, mf_g, offs, valid, chunks = _prepare_bucketed(
        dipoles.astype(dtype)[clist.atom_index],
        pos_rows[:nb].reshape(n_cells, cap, 3),
        cell,
        clist,
    )
    e0 = _dipole_window_energy(
        potential, pc_t, mu_g, mf_g, offs, chunks, clist, window_impl
    )
    if clist.extra_index is not None:
        pe, pe_abs, mue, valid_e = _prepare_extras_bucketed(
            dipoles.astype(dtype)[clist.extra_index],
            pos_rows[nb:].reshape(-1, 3),
            cell,
            clist,
        )
        e0 = e0 + _extras_dipole_energy(
            potential, pc_t, mu_g, mf_g, pe, pe_abs, mue, clist, cell
        )
        valid = valid & valid_e
    return e0 * jnp.where(valid, 1.0, jnp.nan).astype(e0.dtype)


def _extras_dipole_energy(
    potential, pc_t, mu_g, mf_g, pe, pe_abs, mue, clist, cell
) -> Array:
    r"""Total dipolar energy of the spill pairs (plain autodiff; the extras
    are a few % of the atoms by construction, so the O(E·27·cap + E²)
    geometry stays negligible).

    Same structure as the scalar :func:`rspace_cells._extras_energy` —
    extra↔bucket pairs over the full 27-cell window around each extra's
    home cell (one small row gather), extra↔extra pairs by fractional
    minimum image — with the scalar pair value replaced by the dipolar
    contraction :math:`B\,(\mu_i\cdot\mu_j) − C\,(\mu_i\cdot r)(\mu_j\cdot
    r)` (sign of :math:`r` irrelevant: it enters as a product of two
    projections).  Each extra↔bucket ordered pair is the unordered pair
    counted once; extra↔extra pairs appear in both directions, hence the ½.
    """
    from .rspace_cells import _D27

    scalars = _scalar_hooks(potential)[0]
    dtype = pc_t.dtype
    nx, ny, nz, _, cap = pc_t.shape
    n_cells = nx * ny * nz
    n_axis = jnp.asarray([nx, ny, nz], dtype)
    cut2 = jnp.asarray(clist.cutoff, dtype) ** 2
    e_pad = pe.shape[0]
    w27 = 27 * cap

    d27 = jnp.asarray(_D27, jnp.int32)  # (27, 3)
    nb3 = (clist.extra_cell[:, None, :] + d27[None]) % jnp.asarray(
        [nx, ny, nz], jnp.int32
    )
    ids = (nb3[..., 0] * ny + nb3[..., 1]) * nz + nb3[..., 2]  # (E, 27)
    rows_p = jnp.moveaxis(pc_t.reshape(n_cells, 3, cap)[ids], 2, 1).reshape(
        e_pad, 3, w27
    )
    rows_mu = mu_g.reshape(n_cells, cap, 3)[ids].reshape(e_pad, w27, 3)
    rows_m = mf_g.reshape(n_cells, cap)[ids].reshape(e_pad, w27)
    offv = jnp.matmul(d27.astype(dtype) / n_axis, cell, precision="highest")
    off_flat = jnp.repeat(offv.T, cap, axis=1)  # (3, 27·cap)
    rv = [
        rows_p[:, c, :] + off_flat[c][None, :] - pe[:, c, None]
        for c in range(3)
    ]  # r = p_bucket − p_extra, (E, 27·cap) per component
    d2 = rv[0] ** 2 + rv[1] ** 2 + rv[2] ** 2
    ok = (d2 < cut2) & (rows_m > 0.5) & clist.extra_mask[:, None]
    d = jnp.sqrt(jnp.where(ok, d2, 1.0))
    b, c_ = scalars(d)
    okf = ok.astype(dtype)
    mumu = sum(mue[:, c, None] * rows_mu[..., c] for c in range(3))
    ri = sum(mue[:, c, None] * rv[c] for c in range(3))
    rj = sum(rows_mu[..., c] * rv[c] for c in range(3))
    e_em = jnp.sum(okf * (b * mumu - c_ * ri * rj))

    # extra ↔ extra: fractional minimum image, (E, E) planes per axis
    inv_cell = inv3(cell)
    f = jnp.matmul(pe_abs, inv_cell, precision="highest")  # (E, 3)
    g = []
    for c in range(3):
        df = f[:, c][:, None] - f[:, c][None, :]
        g.append(df - jnp.round(df))
    rvec = [
        g[0] * cell[0, d] + g[1] * cell[1, d] + g[2] * cell[2, d]
        for d in range(3)
    ]
    d2e = rvec[0] ** 2 + rvec[1] ** 2 + rvec[2] ** 2
    m_ee = clist.extra_mask[:, None] & clist.extra_mask[None, :]
    ok_ee = (d2e < cut2) & m_ee & ~jnp.eye(e_pad, dtype=bool)
    d_ee = jnp.sqrt(jnp.where(ok_ee, d2e, 1.0))
    b_ee, c_ee = scalars(d_ee)
    okf_ee = ok_ee.astype(dtype)
    mumu_ee = jnp.matmul(mue, mue.T, precision="highest")
    ri_ee = sum(mue[:, d, None] * rvec[d] for d in range(3))
    rj_ee = sum(mue[None, :, d] * rvec[d] for d in range(3))
    e_ee = 0.5 * jnp.sum(okf_ee * (b_ee * mumu_ee - c_ee * ri_ee * rj_ee))
    return e_em + e_ee


def _scalar_hooks(potential):
    """(B, C) kernels and the C′ hook for the potential's mode."""
    if potential.smearing is None:
        return potential.scalar_kernels, getattr(
            potential, "scalar_kernel_derivative", None
        )
    return potential.sr_scalar_kernels, getattr(
        potential, "sr_scalar_kernel_derivative", None
    )


def _resolve_dipole_window_math(spec, potential, dtype) -> object | None:
    """The potential's fused ``(B, C, C'/d)``-of-d² hook
    (:meth:`PotentialDipole.window_scalar_math_sq`), when the static spec
    allows the analytic path AND the state is float32 — same gating as the
    scalar engine's ``_resolve_window_math``: the A&S erfc rational inside
    sits below f32 roundoff but not below f64, so float64 (the validation
    precision) keeps the exact erfc/exp scalars."""
    use_analytic = spec[2] if len(spec) > 2 else False
    if not use_analytic or dtype != jnp.float32:
        return None
    return getattr(potential, "window_scalar_math_sq", None)


def _can_use_analytic_dipole(potential) -> bool:
    """Same gating discipline as the scalar engine's analytic hook: the C′
    hook must exist, the exclusion window must be off (its extra f(r) terms
    are not covered), and every parameter must be concrete — the fused pass
    produces no potential-parameter cotangents.  Must be evaluated at the
    call site (outer-trace tracers are invisible inside the custom VJP)."""
    if getattr(potential, "exclusion_radius", None) is not None:
        return False
    if _scalar_hooks(potential)[1] is None:
        return False
    return not any(
        isinstance(leaf, jax.core.Tracer)
        for leaf in jax.tree_util.tree_leaves(potential)
    )


def _dipole_window_spec(cutoff, chunks, potential, window_impl="xla"):
    """Static dipolar window spec ``(cutoff, chunks, use_analytic[, pallas])``.

    Mirrors :func:`rspace_cells._window_spec`: ``"pallas"`` additionally
    requires the potential's ``window_scalar_math`` hook to produce a
    kernel-ready ``(B, C, C')`` math for this cutoff *and* the analytic gate
    (concrete parameters) — a hard error otherwise, so callers that
    auto-pick never silently change engines."""
    use_analytic = _can_use_analytic_dipole(potential)
    if window_impl == "xla":
        return (float(cutoff), chunks, use_analytic)
    if window_impl != "pallas":
        raise ValueError(
            f"`window_impl` is {window_impl!r} but must be 'xla' or 'pallas'"
        )
    from .pallas.window_dipole_pallas import can_use_pallas_dipole_window

    if not use_analytic or not can_use_pallas_dipole_window(potential, cutoff):
        raise ValueError(
            "window_impl='pallas' requires a dipolar potential with a "
            "kernel-ready `window_scalar_math(cutoff)` (concrete parameters, "
            "no exclusion window, fit within tolerance); "
            f"{type(potential).__name__} does not provide one here. "
            "Use window_impl='xla'."
        )
    return (float(cutoff), chunks, True, True)


def _dipole_window_energy(
    potential, pc_t, mu_g, mf_g, offs, chunks, clist, window_impl="xla"
) -> Array:
    """Raw window energy (staleness poisoning is the entry points' job —
    they AND the window flag with the extras' before multiplying)."""
    spec = _dipole_window_spec(clist.cutoff, chunks, potential, window_impl)
    if spec[2]:
        return _dw_energy(spec, potential, pc_t, mu_g, mf_g, offs)
    return _dw_math(spec, potential, pc_t, mu_g, mf_g, offs)


def _dw_math(spec, potential, pc_t, mu_g, mf_g, offs, mui_g=None) -> Array:
    """Primal window energy (plain autodiff path for traced potentials).

    ``mui_g`` optionally provides separate i-side dipoles (the sharded slab
    path zeroes them on the halo plane so every pair is owned by exactly one
    device); the j side always rolls from the full ``mu_g`` grid."""
    scalars = _scalar_hooks(potential)[0]
    dtype = pc_t.dtype
    cutoff_sq = jnp.asarray(spec[0], dtype) ** 2
    mui = mu_g if mui_g is None else mui_g
    window_math = _resolve_dipole_window_math(spec, potential, dtype)

    e = jnp.zeros((), dtype)
    k0 = 0
    for chunk in spec[1]:
        pj, muj, pair_ok, d, d_sq_safe = _chunk_geometry(
            chunk, k0, pc_t, mu_g, mf_g, offs, cutoff_sq, scale_self=True
        )
        okf = pair_ok.astype(dtype)
        if window_math is not None:
            b, c, _ = window_math(d_sq_safe)
        else:
            b, c = scalars(d)
        # μi·μj — like the scalar engine's charge outer product
        mumu = jnp.einsum(
            "...ic,...jc->...ij", mui, muj, precision="highest"
        )
        # μ·r_ij = μ·p_j − μ·p_i, assembled from the i/j position blocks
        mur_i = jnp.einsum(
            "...ic,...cj->...ij", mui, pj, precision="highest"
        ) - jnp.einsum(
            "...ic,...ci->...i", mui, pc_t, precision="highest"
        )[..., None]
        mur_j = jnp.einsum(
            "...jc,...cj->...j", muj, pj, precision="highest"
        )[..., None, :] - jnp.einsum(
            "...jc,...ci->...ij", muj, pc_t, precision="highest"
        )
        e = e + jnp.sum(okf * (b * mumu - c * mur_i * mur_j))
        k0 += len(chunk)
    return e


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dw_energy(spec, potential, pc_t, mu_g, mf_g, offs):
    return _dw_math(spec, potential, pc_t, mu_g, mf_g, offs)


def _dw_value_and_grad(spec, potential, pc_t, mu_g, mf_g, offs, mui_g=None):
    """One fused pass: dipolar window energy AND its full analytic gradient.

    Same architecture as ``rspace_cells._we_value_and_grad`` — the energy is
    a scalar, so every cotangent is ``ē × (fixed array)``; the forward
    computes them all (sharing the geometry, ``(B, C)`` kernels and the dot
    products with the value) and the backward is a trivial scale.  Per-chunk
    cotangent algebra, with ``r = p_j − p_i``, ``M = μi·μj``, ``Ri = μi·r``,
    ``Rj = μj·r``, ``s = (B′M − C′RiRj)/d`` and ``B′ = −C·d``:

    * ``∂E/∂p_i = Σ_j −s·r + C(Rj μi + Ri μj)``, mirrored on the j side and
      rolled home (+ the per-offset totals → the ``offs``/cell gradient);
    * ``∂E/∂μ_i = Σ_j B μj − C Rj r``, mirrored on the j side (the j-side
      cotangent carries the self-block ½, like the scalar engine's ``qj``).
    """
    Pr = "highest"
    scalars, cderiv = _scalar_hooks(potential)
    dtype = pc_t.dtype
    cap = pc_t.shape[-1]
    cutoff_sq = jnp.asarray(spec[0], dtype) ** 2
    split = mui_g is not None
    mui = mu_g if mui_g is None else mui_g
    window_math = _resolve_dipole_window_math(spec, potential, dtype)

    e = jnp.zeros((), dtype)
    d_pc = jnp.zeros_like(pc_t)
    d_mu = jnp.zeros_like(mu_g)  # j-side (rolled home)
    d_mui = jnp.zeros_like(mui)  # i-side
    d_offs = jnp.zeros_like(offs)
    mu_t = jnp.moveaxis(mui, -1, -2)  # (…, 3, cap)
    pc_rows = jnp.moveaxis(pc_t, -2, -1)  # (…, cap, 3)
    k0 = 0
    for chunk in spec[1]:
        pj, muj, pair_ok, d, d_sq_safe = _chunk_geometry(
            chunk, k0, pc_t, mu_g, mf_g, offs, cutoff_sq, scale_self=True
        )
        okf = pair_ok.astype(dtype)
        if window_math is not None:
            # fused (B, C, C'/d)-of-d² hook: one shared Gaussian pass, no
            # bare sqrt/divides (A&S-rational erfc, below-f32-roundoff)
            b, c, cp_over_d = window_math(d_sq_safe)
        else:
            b, c = scalars(d)
            cp_over_d = cderiv(d, b, c) / d
        mumu = jnp.einsum("...ic,...jc->...ij", mui, muj, precision=Pr)
        ri = jnp.einsum(
            "...ic,...cj->...ij", mui, pj, precision=Pr
        ) - jnp.einsum("...ic,...ci->...i", mui, pc_t, precision=Pr)[..., None]
        rj = jnp.einsum(
            "...jc,...cj->...j", muj, pj, precision=Pr
        )[..., None, :] - jnp.einsum(
            "...jc,...ci->...ij", muj, pc_t, precision=Pr
        )
        bt = okf * b
        ct = okf * c
        rirj = ri * rj
        e = e + jnp.sum(bt * mumu - ct * rirj)

        # pair weight s = (B'M − C'RiRj)/d with B' = −C·d
        s = -(ct * mumu) - (okf * cp_over_d) * rirj
        ct_rj = ct * rj
        ct_ri = ct * ri
        rowsum = jnp.sum(s, axis=-1)  # (…, cap)
        colsum = jnp.sum(s, axis=-2)  # (…, W)
        row_rj = jnp.sum(ct_rj, axis=-1)  # (…, cap)
        col_ri = jnp.sum(ct_ri, axis=-2)  # (…, W)
        cross_i = jnp.einsum("...ij,...dj->...di", s, pj, precision=Pr)
        cross_j = jnp.einsum("...ij,...di->...dj", s, pc_t, precision=Pr)

        # position cotangents (engine layouts: pc (…,3,cap), pj (…,3,W))
        d_pc = (
            d_pc
            + pc_t * rowsum[..., None, :]
            - cross_i
            + mu_t * row_rj[..., None, :]
            + jnp.einsum("...ij,...jc->...ci", ct_ri, muj, precision=Pr)
        )
        d_pj = (
            pj * colsum[..., None, :]
            - cross_j
            - jnp.einsum("...ij,...ic->...cj", ct_rj, mui, precision=Pr)
            - jnp.moveaxis(muj, -1, -2) * col_ri[..., None, :]
        )

        # dipole cotangents (mu layouts: (…, cap/W, 3))
        d_mui = (
            d_mui
            + jnp.einsum("...ij,...jc->...ic", bt, muj, precision=Pr)
            - jnp.einsum("...ij,...cj->...ic", ct_rj, pj, precision=Pr)
            + pc_rows * row_rj[..., None]
        )
        d_muj = (
            jnp.einsum("...ij,...ic->...jc", bt, mui, precision=Pr)
            - jnp.moveaxis(pj, -2, -1) * col_ri[..., None]
            + jnp.einsum("...ij,...ci->...jc", ct_ri, pc_t, precision=Pr)
        )

        for t, (dx, dy, dz) in enumerate(chunk):
            w = 0.5 if (dx, dy, dz) == (0, 0, 0) else 1.0
            blk_p = d_pj[..., t * cap : (t + 1) * cap]
            blk_mu = d_muj[..., t * cap : (t + 1) * cap, :]
            d_pc = d_pc + jnp.roll(blk_p, (dx, dy, dz), axis=(0, 1, 2))
            d_mu = d_mu + jnp.roll(blk_mu, (dx, dy, dz), axis=(0, 1, 2)) * w
            d_offs = d_offs.at[k0 + t].add(jnp.sum(blk_p, axis=(0, 1, 2, 4)))
        k0 += len(chunk)

    d_pot = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(jnp.asarray(x)), potential
    )
    if split:
        return e, (d_pot, d_pc, d_mu, jnp.zeros_like(mf_g), d_offs, d_mui)
    return e, (d_pot, d_pc, d_mu + d_mui, jnp.zeros_like(mf_g), d_offs)


def _dw_fwd(spec, potential, pc_t, mu_g, mf_g, offs):
    if len(spec) > 3 and spec[3]:
        from .pallas.window_dipole_pallas import (
            pallas_dipole_window_value_and_grad,
        )

        return pallas_dipole_window_value_and_grad(
            spec, potential, pc_t, mu_g, mf_g, offs
        )
    return _dw_value_and_grad(spec, potential, pc_t, mu_g, mf_g, offs)


# the scalar engine's backward is structure-agnostic: it scales every
# cotangent by ē (skipping the structural-zeros potential tree, spec[2])
_dw_energy.defvjp(_dw_fwd, _we_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dw_energy_split(spec, potential, pc_t, mu_g, mf_g, offs, mui_g):
    """Dipolar window energy with separate i-side dipoles (the sharded slab
    fast path zeroes them on the halo plane): same fused value-and-gradient
    custom VJP as :func:`_dw_energy`, with the i- and j-side dipole
    cotangents kept apart so the caller's halo plumbing (differentiable
    ``ppermute``/``concatenate``) routes them."""
    return _dw_math(spec, potential, pc_t, mu_g, mf_g, offs, mui_g)


def _dw_split_fwd(spec, potential, pc_t, mu_g, mf_g, offs, mui_g):
    if len(spec) > 3 and spec[3]:
        from .pallas.window_dipole_pallas import (
            pallas_dipole_window_value_and_grad,
        )

        return pallas_dipole_window_value_and_grad(
            spec, potential, pc_t, mu_g, mf_g, offs, mui_g
        )
    return _dw_value_and_grad(spec, potential, pc_t, mu_g, mf_g, offs, mui_g)


_dw_energy_split.defvjp(_dw_split_fwd, _we_bwd)
