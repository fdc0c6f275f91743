r"""Fused position→mesh spreading: stencil weights computed in VMEM.

The XLA tiled backend (:mod:`torchpme_tpu.ops.mesh_tiled`) evaluates the
per-slot stencil weights in one XLA program (``refresh_tiled_interpolation``,
a ``(T, K, 3, n)`` HBM array), densifies them against local iota grids in
another (~140 MB of dense factors at 102k atoms / 128³ mesh), and contracts
in a third.  The three-kernel Pallas backend (:mod:`.mesh_pallas`) removed
the dense factors from HBM but still reads precomputed weights and pays a
``(T, K, 3, n)`` weight-cotangent round trip in its VJP — measured slower
than XLA end-to-end (``mesh_tiled._use_pallas``).

This module fuses the whole chain into ONE kernel each way:

* forward: scaled fractional coordinates ``rel = (pos @ cell⁻¹)·ns`` in,
  local tile fields out.  Stencil offsets, the 1D weight polynomials
  (Lagrange/P3M coefficient tables as compile-time constants), the dense
  local factors, and the MXU contraction all happen per tile in VMEM; HBM
  sees only ``rel`` (and the charges) in and the tile fields out.
* backward: ``(rel, q, ct_tiles)`` in, ``(ct_rel, ct_q)`` out.  The
  position cotangent is contracted directly against the **derivative**
  stencil polynomials (``d w/d rel``), so no per-node weight cotangent is
  ever materialized; the charge cotangent is the gather contraction in the
  same program.  ``d base/d rel = 0`` (piecewise constant) exactly like XLA
  autodiff through ``round``/``floor``.

The cell/stress cotangent falls out for free: ``rel`` is produced by a
plain XLA einsum, so ``ct_rel`` chains to positions *and* cell outside the
kernel.  Charge channels ride the lane axis channel-major exactly like
:mod:`.mesh_pallas` (Mosaic lane concat, no minor-dim reshapes).

No reference counterpart: the reference spreads by ``index_put_`` scatter
(``/root/reference/src/torchpme/lib/mesh_interpolator.py``); this is the
TPU formulation of the same stencil math (weights: Essmann 1995 / Deserno &
Holm 1998, as in ``ops/mesh.py``).  float32 only; ``interpret=True`` runs
on CPU for correctness tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mesh import _weight_coefficients
from ..mesh_tiled import TILE, TiledInterpolation, _fold_tiles_to_mesh

__all__ = ["fused_spread", "fused_tiled_density", "supports_fused"]


def supports_fused(interp: TiledInterpolation, dtype) -> bool:
    """float32 data, sublane-aligned capacity, bucket→atom indices present."""
    return (
        dtype == jnp.float32
        and interp.local_x.shape[1] % 8 == 0
        and interp.atom_of_slot is not None
    )


def _axis_offsets(rel_row, nodes):
    """(base, offset) per the grid-centering parity rule (``ops/mesh.py``)."""
    if nodes % 2 == 0:
        base = jnp.floor(rel_row).astype(jnp.int32)
        return base, rel_row - (base.astype(rel_row.dtype) + 0.5)
    base = jnp.round(rel_row).astype(jnp.int32)
    return base, rel_row - base.astype(rel_row.dtype)


def _poly(coeffs_row, off):
    """Horner evaluation of one stencil node's weight polynomial."""
    acc = jnp.full_like(off, float(coeffs_row[-1]))
    for c in coeffs_row[-2::-1]:
        acc = acc * off + float(c)
    return acc


def _node_weights(off, coeffs):
    """List of per-node weights, each shaped like ``off``."""
    return [_poly(coeffs[o], off) for o in range(coeffs.shape[0])]


def _dense_e(iota_e, local, w_nodes):
    """(E, K) dense weights from (1, K) local starts and per-node weights."""
    dense = jnp.zeros(iota_e.shape, jnp.float32)
    for o, w in enumerate(w_nodes):
        dense = dense + jnp.where(iota_e == local + o, w, 0.0)
    return dense


def _dense_nz(iota_z, start, w_nodes, nz):
    """(K, nz) dense z weights with the periodic wrap in the select."""
    dense = jnp.zeros(iota_z.shape, jnp.float32)
    for o, w in enumerate(w_nodes):
        dense = dense + jnp.where(iota_z == (start + o) % nz, w, 0.0)
    return dense


def _fmod(a, n):
    """Floor-mod for int32 that is correct for negative ``a`` regardless of
    whether the backend ``%`` lowers to truncated or floor remainder."""
    return (a % n + n) % n


def _geometry(t, rel, nodes, coeffs, ns, ty_count, extent, capacity, lpad=0,
              deriv=None):
    """Shared fwd/bwd geometry: dense (E,K)/(E,K)/(K,nz) weight factors
    (and their rel-derivatives when ``deriv`` coefficients are given).

    ``t`` is the tile index (``pl.program_id`` inside the kernels, a vmapped
    iota on the pure-jnp twin).  ``lpad`` shifts the local window left of the
    tile origin: 0 for stencil-start bucketing (every start lands in
    [0, TILE)), positive for position bucketing (the tile-aligned MD state,
    where an atom near the left tile edge has its stencil start in the
    previous tile)."""
    nx, ny, nz = ns
    shift0 = 1 - (nodes + 1) // 2
    ox = t // ty_count * TILE
    oy = t % ty_count * TILE

    iota_e = lax.broadcasted_iota(jnp.int32, (extent, capacity), 0)
    iota_z = lax.broadcasted_iota(jnp.int32, (capacity, nz), 1)

    bx, offx = _axis_offsets(rel[0], nodes)  # (K,)
    by, offy = _axis_offsets(rel[1], nodes)
    bz, offz = _axis_offsets(rel[2], nodes)
    lx = _fmod(_fmod(bx + shift0, nx) + lpad - ox, nx)
    ly = _fmod(_fmod(by + shift0, ny) + lpad - oy, ny)
    sz = _fmod(bz + shift0, nz)

    wx = _dense_e(iota_e, lx[None, :], _node_weights(offx[None, :], coeffs))
    wy = _dense_e(iota_e, ly[None, :], _node_weights(offy[None, :], coeffs))
    wz = _dense_nz(iota_z, sz[:, None], _node_weights(offz[:, None], coeffs), nz)
    if deriv is None:
        return wx, wy, wz, None
    dwx = _dense_e(iota_e, lx[None, :], _node_weights(offx[None, :], deriv))
    dwy = _dense_e(iota_e, ly[None, :], _node_weights(offy[None, :], deriv))
    dwz = _dense_nz(iota_z, sz[:, None], _node_weights(offz[:, None], deriv), nz)
    return wx, wy, wz, (dwx, dwy, dwz)


def _charge_z(wz, q_ck, n_ch):
    """(K, C·nz) channel-major charge-weighted z factors (lane concat)."""
    blocks = [wz * q_ck[c][:, None] for c in range(n_ch)]
    return blocks[0] if n_ch == 1 else jnp.concatenate(blocks, axis=1)


def _fwd_math(t, rel, q_ck, *, nodes, coeffs, ns, ty_count, extent,
              capacity, n_ch, lpad):
    """One tile's (E², C·nz) local field from its (3, K) rel / (C, K) charges.

    Pure jnp — shared verbatim by the Pallas forward kernel and the vmap
    twin that serves ``shard_map``-traced calls off-TPU (the HLO interpreter
    cannot evaluate kernel jaxprs under the varying-axes type system)."""
    wx, wy, wz, _ = _geometry(
        t, rel, nodes, coeffs, ns, ty_count, extent, capacity, lpad
    )
    wxy = (wx[:, None, :] * wy[None, :, :]).reshape(extent * extent, capacity)
    wzq = _charge_z(wz, q_ck, n_ch)
    return jnp.dot(
        wxy, wzq, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _fwd_kernel(rel_ref, q_ref, out_ref, *, nodes, coeffs, ns, ty_count,
                extent, capacity, n_ch, lpad):
    out_ref[0] = _fwd_math(
        pl.program_id(0), rel_ref[0], q_ref[0], nodes=nodes, coeffs=coeffs,
        ns=ns, ty_count=ty_count, extent=extent, capacity=capacity,
        n_ch=n_ch, lpad=lpad,
    )


def _bwd_math(t, rel, q_ck, field, *, nodes, coeffs, deriv, ns, ty_count,
              extent, capacity, n_ch, lpad):
    """One tile's ``(ct_rel (3, K), ct_q (C, K))`` cotangents (pure jnp,
    shared by the Pallas backward kernel and the vmap twin)."""
    nz = ns[2]
    wx, wy, wz, (dwx, dwy, dwz) = _geometry(
        t, rel, nodes, coeffs, ns, ty_count, extent, capacity, lpad, deriv
    )

    # charge cotangent: the gather contraction
    wxy = (wx[:, None, :] * wy[None, :, :]).reshape(extent * extent, capacity)
    h = jnp.dot(
        wxy.T, field, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (K, C·nz)
    rows = [
        jnp.sum(h[:, c * nz : (c + 1) * nz] * wz, axis=1, keepdims=True).T
        for c in range(n_ch)
    ]
    ct_q = rows[0] if n_ch == 1 else jnp.concatenate(rows, axis=0)

    # rel cotangents against the derivative stencils
    wzq = _charge_z(wz, q_ck, n_ch)
    fz = jnp.dot(
        field, wzq.T, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    ).reshape(extent, extent, capacity)
    a_x = jnp.sum(fz * wy[None, :, :], axis=1)  # (E, K)
    b_y = jnp.sum(fz * wx[:, None, :], axis=0)  # (E, K)
    hq = sum(
        q_ck[c][:, None] * h[:, c * nz : (c + 1) * nz] for c in range(n_ch)
    )  # (K, nz)
    ct_x = jnp.sum(dwx * a_x, axis=0)  # (K,)
    ct_y = jnp.sum(dwy * b_y, axis=0)
    ct_z = jnp.sum(dwz * hq, axis=1)
    return jnp.stack([ct_x, ct_y, ct_z], axis=0), ct_q  # (3, K), (C, K)


def _bwd_kernel(rel_ref, q_ref, ct_ref, drel_ref, dq_ref, *, nodes, coeffs,
                deriv, ns, ty_count, extent, capacity, n_ch, lpad):
    drel_ref[0], dq_ref[0] = _bwd_math(
        pl.program_id(0), rel_ref[0], q_ref[0], ct_ref[0], nodes=nodes,
        coeffs=coeffs, deriv=deriv, ns=ns, ty_count=ty_count, extent=extent,
        capacity=capacity, n_ch=n_ch, lpad=lpad,
    )


def _tables(method, nodes):
    coeffs = np.asarray(_weight_coefficients(method, nodes), np.float64)
    deriv = coeffs[:, 1:] * np.arange(1, nodes)[None, :]
    if deriv.shape[1] == 0:  # nodes == 1: constant weight
        deriv = np.zeros((coeffs.shape[0], 1))
    return tuple(map(tuple, coeffs)), tuple(map(tuple, deriv))


def _interpret():
    return jax.default_backend() != "tpu"


def _trace_vma(*arrays) -> frozenset:
    """Mesh axes the operands vary over (nonempty only inside ``shard_map``
    with ``check_vma=True``).  Pallas outputs must declare this set; the HLO
    interpreter can't evaluate kernel jaxprs under the vma type system at
    all, so a nonempty set routes off-TPU calls to the pure-jnp vmap twin."""
    vma = frozenset()
    for a in arrays:
        vma |= getattr(jax.typeof(a), "vma", frozenset())
    return vma


_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _rel_spec(capacity):
    return pl.BlockSpec((1, 3, capacity), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)


def _q_spec(n_ch, capacity):
    return pl.BlockSpec((1, n_ch, capacity), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)


def _tile_spec(extent, nz, n_ch):
    return pl.BlockSpec(
        (1, extent * extent, nz * n_ch), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )


def aligned_geometry(nodes: int, pad_cells: int = 0) -> tuple[int, int]:
    """(extent, lpad) of the position-bucketed local window: atoms anywhere
    in the tile, so the stencil can reach ``lpad`` cells left of the origin
    and ``TILE - 1 + nodes//2 (+1 for the odd-round overshoot)`` right.

    ``pad_cells`` widens the window by that many mesh cells on each side:
    overflow-balanced cell lists (``compute_cell_list(balance=True)``)
    assign atoms up to the balance slack outside their cell/tile, so their
    stencils reach correspondingly further."""
    lpad = (nodes - 1) // 2 + pad_cells
    extent = TILE + nodes - (1 if nodes % 2 == 0 else 0) + 2 * pad_cells
    return extent, lpad


def _static_geom(static, rel_t):
    ns, nodes, method, n_ch, extent, lpad = static
    n_tiles, _, capacity = rel_t.shape
    ty_count = ns[1] // TILE
    coeffs, deriv = _tables(method, nodes)
    return (ns, nodes, n_ch, n_tiles, capacity, extent, lpad, ty_count,
            coeffs, deriv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_spread(static, rel_t: Array, q_slots: Array) -> Array:
    """Scaled fractional slot coordinates → local tile fields.

    :param static: ``(ns, nodes, method, n_channels, extent, lpad)``
        hashable config — ``(TILE + nodes - 1, 0)`` for stencil-start
        bucketing, :func:`aligned_geometry` for position bucketing.
    :param rel_t: ``(T, 3, K)`` — ``(pos @ cell⁻¹) · ns`` per tile slot.
    :param q_slots: ``(T, C, K)`` per-slot charges (0 in empty slots).
    :return: ``(T, E², C·nz)`` channel-major local tile fields, foldable by
        :func:`torchpme_tpu.ops.mesh_tiled._fold_tiles_to_mesh`.
    """
    (ns, nodes, n_ch, n_tiles, capacity, extent, lpad, ty_count, coeffs,
     _d) = _static_geom(static, rel_t)
    opts = dict(
        nodes=nodes, coeffs=np.asarray(coeffs), ns=ns, ty_count=ty_count,
        extent=extent, capacity=capacity, n_ch=n_ch, lpad=lpad,
    )
    vma = _trace_vma(rel_t, q_slots)
    if vma and _interpret():
        return jax.vmap(functools.partial(_fwd_math, **opts))(
            jnp.arange(n_tiles, dtype=jnp.int32), rel_t, q_slots
        )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, **opts),
        grid=(n_tiles,),
        in_specs=[_rel_spec(capacity), _q_spec(n_ch, capacity)],
        out_specs=_tile_spec(extent, ns[2], n_ch),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, extent * extent, ns[2] * n_ch), jnp.float32, vma=vma
        ),
        interpret=_interpret(),
        compiler_params=_PARAMS,
    )(rel_t, q_slots)


def _fused_fwd(static, rel_t, q_slots):
    return fused_spread(static, rel_t, q_slots), (rel_t, q_slots)


def _fused_bwd(static, residuals, ct_tiles):
    rel_t, q_slots = residuals
    (ns, nodes, n_ch, n_tiles, capacity, extent, lpad, ty_count, coeffs,
     deriv) = _static_geom(static, rel_t)
    opts = dict(
        nodes=nodes, coeffs=np.asarray(coeffs), deriv=np.asarray(deriv),
        ns=ns, ty_count=ty_count, extent=extent, capacity=capacity,
        n_ch=n_ch, lpad=lpad,
    )
    vma = _trace_vma(rel_t, q_slots, ct_tiles)
    if vma and _interpret():
        return jax.vmap(functools.partial(_bwd_math, **opts))(
            jnp.arange(n_tiles, dtype=jnp.int32), rel_t, q_slots, ct_tiles
        )
    ct_rel, ct_q = pl.pallas_call(
        functools.partial(_bwd_kernel, **opts),
        grid=(n_tiles,),
        in_specs=[
            _rel_spec(capacity),
            _q_spec(n_ch, capacity),
            _tile_spec(extent, ns[2], n_ch),
        ],
        out_specs=[_rel_spec(capacity), _q_spec(n_ch, capacity)],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 3, capacity), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct(
                (n_tiles, n_ch, capacity), jnp.float32, vma=vma
            ),
        ],
        interpret=_interpret(),
        compiler_params=_PARAMS,
    )(rel_t, q_slots, ct_tiles)
    return ct_rel, ct_q


fused_spread.defvjp(_fused_fwd, _fused_bwd)


def _slot_validity(rel_t, interp: TiledInterpolation, sentinel: int):
    """Staleness flag recomputed from ``rel`` (cheap XLA int math): every
    occupied slot's stencil start must still lie inside its tile — the same
    criterion as ``refresh_tiled_interpolation``.  Under ``stop_gradient``:
    validity is a diagnostic, not part of the differentiable energy.

    :param sentinel: the one-past-the-end index empty slots hold in
        ``atom_of_slot`` (``len(positions)``, see ``bucketize``).
    """
    ns, nodes = interp.ns, interp.nodes
    nx, ny, _ = ns
    n_tiles, capacity = interp.local_x.shape
    ty_count = ny // TILE
    rel = lax.stop_gradient(rel_t)
    shift0 = 1 - (nodes + 1) // 2
    if nodes % 2 == 0:
        base = jnp.floor(rel[:, :2]).astype(jnp.int32)
    else:
        base = jnp.round(rel[:, :2]).astype(jnp.int32)
    start = (base + shift0) % jnp.asarray([nx, ny], jnp.int32)[None, :, None]
    tile_idx = jnp.arange(n_tiles, dtype=jnp.int32)
    origin = jnp.stack(
        [tile_idx // ty_count * TILE, tile_idx % ty_count * TILE], axis=1
    )
    local = (start - origin[:, :, None]) % jnp.asarray(
        [nx, ny], jnp.int32
    )[None, :, None]
    empty = interp.atom_of_slot == sentinel
    ok = jnp.all(local < TILE, axis=1) | empty
    return jnp.all(ok) & (interp.dropped == 0)


def fused_tiled_density(
    interp: TiledInterpolation,
    positions: Array,
    inverse_cell: Array,
    charges: Array,
    method: str,
):
    """Charge density mesh straight from positions via the fused kernels.

    Drop-in for ``refresh_tiled_interpolation`` + ``tiled_points_to_mesh``
    on the MD fast path: ``positions`` may be in atom order or bucket-row
    order — whatever ``interp.atom_of_slot`` indexes.

    :return: ``(rho_mesh (C, nx, ny, nz), mesh_valid ())``.
    """
    if interp.atom_of_slot is None:
        raise ValueError(
            "This TiledInterpolation does not carry bucket->atom indices; "
            "build it with compute_tiled_interpolation first."
        )
    ns, nodes = interp.ns, interp.nodes
    n_tiles, capacity = interp.local_x.shape
    extent = TILE + nodes - 1
    n_ch = charges.shape[-1]
    dtype = positions.dtype

    padded_pos = jnp.concatenate(
        [positions, jnp.zeros((1, 3), dtype)], axis=0
    )
    pos_slots = padded_pos[interp.atom_of_slot]  # (T, K, 3)
    # rel in the transposed (T, 3, K) kernel layout; HIGHEST precision as in
    # compute_interpolation, and the ns scaling applied AFTER the product in
    # the same order — bit-identical rel keeps floor/round stencil-start
    # decisions in lockstep with the XLA refresh path
    rel_t = (
        jnp.einsum("tkb,ba->tak", pos_slots, inverse_cell, precision="highest")
        * jnp.asarray(ns, dtype)[None, :, None]
    )

    flat_q = jnp.zeros((n_tiles * capacity + 1, n_ch), dtype).at[
        interp.slot_of_atom
    ].set(charges.astype(dtype))
    q_slots = jnp.swapaxes(
        flat_q[:-1].reshape(n_tiles, capacity, n_ch), 1, 2
    )  # (T, C, K)

    static = (ns, nodes, method, n_ch, TILE + nodes - 1, 0)
    tiles = fused_spread(static, rel_t, q_slots)
    tiles = tiles.reshape(n_tiles, extent, extent, n_ch, ns[2])
    rho = _fold_tiles_to_mesh(
        jnp.moveaxis(tiles, 3, 4), ns, nodes
    )
    return rho, _slot_validity(rel_t, interp, positions.shape[0])


def aligned_tiled_density(
    pos_rows: Array,
    q_rows: Array,
    inverse_cell: Array,
    ns: tuple[int, int, int],
    nodes: int,
    method: str,
    cell_grid: tuple[int, int, int, int],
    extras_interp=None,
    pad_cells: int = 0,
) -> Array:
    """Charge density mesh straight from tile-ALIGNED bucket rows — no
    per-step gather in either direction.

    With the cell-list x/y grid pinned to the mesh-tile grid
    (``compute_cell_list(..., xy_cells=(ns[0]//TILE, ns[1]//TILE))``), the
    slots of mesh tile ``(x, y)`` are exactly the rows of the z-column of
    cells at ``(x, y)`` — a contiguous ``reshape`` of the MD row state,
    where the unaligned path pays an O(rows) gather forward and its scatter
    transpose in the force pass (~4 ms at 102k atoms on a v5e).  Atoms are
    position-bucketed, so the kernels run with the wider
    :func:`aligned_geometry` window; mesh staleness is implied by cell-list
    staleness (an atom inside its cell always has its stencil inside the
    window), so no separate validity flag exists.

    :param pos_rows: ``(n_rows, 3)`` bucket-row positions
        (:meth:`torchpme_tpu.md.MDFastPath.bucket` layout: ``n_cells·cap``
        cell rows, then the spill side list).
    :param q_rows: ``(n_rows, C)`` charges in the same layout (0 in padding).
    :param cell_grid: ``(nx_c, ny_c, nz_c, cap)`` of the aligned cell list.
    :param extras_interp: optional extras-only
        :class:`~torchpme_tpu.ops.mesh_tiled.TiledInterpolation` over the
        side-list rows (``pos_rows[nb:]``).  When given, the spill atoms
        spread via a per-step weight refresh + tile GEMM instead of the
        generic XLA scatter (which costs ~2 ms/step at 932 extras on a v5e
        — scatter serializes on TPU); a stale extras bucketing NaN-poisons
        the density.
    :return: ``(C, nx, ny, nz)`` density mesh.
    """
    nx_c, ny_c, nz_c, cap = cell_grid
    if nx_c != ns[0] // TILE or ny_c != ns[1] // TILE:
        raise ValueError(
            f"cell grid {(nx_c, ny_c)} is not aligned with the "
            f"{(ns[0] // TILE, ns[1] // TILE)} mesh-tile grid"
        )
    if pos_rows.dtype != jnp.float32:
        raise ValueError(
            f"the aligned MD state runs the fused float32 Pallas kernels; "
            f"got {pos_rows.dtype} rows — use float32 state, or "
            "mesh_impl='tiled' for float64"
        )
    dtype = pos_rows.dtype
    n_ch = q_rows.shape[-1]
    n_tiles = nx_c * ny_c
    kp = nz_c * cap
    nb = n_tiles * kp
    extent, lpad = aligned_geometry(nodes, pad_cells)
    if extent > 2 * TILE:
        raise ValueError(
            f"aligned window extent {extent} (nodes={nodes}, "
            f"pad_cells={pad_cells}) exceeds the 2-tile fold window "
            f"{2 * TILE}"
        )

    rel = (
        jnp.matmul(pos_rows, inverse_cell, precision="highest")
        * jnp.asarray(ns, dtype)
    )
    rel_t = jnp.swapaxes(rel[:nb].reshape(n_tiles, kp, 3), 1, 2)
    q_main = jnp.swapaxes(q_rows[:nb].reshape(n_tiles, kp, n_ch), 1, 2)

    static = (ns, nodes, method, n_ch, extent, lpad)
    tiles = fused_spread(static, rel_t, q_main)
    tiles = tiles.reshape(n_tiles, extent, extent, n_ch, ns[2])
    rho = _fold_tiles_to_mesh(jnp.moveaxis(tiles, 3, 4), ns, nodes_for_extent(extent))
    if lpad:
        rho = jnp.roll(rho, (-lpad, -lpad), axis=(1, 2))

    if pos_rows.shape[0] > nb:
        if extras_interp is not None:
            from ..mesh_tiled import (
                refresh_tiled_interpolation,
                tiled_points_to_mesh,
            )

            refreshed, valid = refresh_tiled_interpolation(
                extras_interp, pos_rows[nb:], inverse_cell, method
            )
            rho_e = tiled_points_to_mesh(refreshed, q_rows[nb:])
            rho = rho + rho_e * jnp.where(valid, 1.0, jnp.nan)
        else:
            # spill side list: a handful of atoms, generic scatter spread
            # (their stencils are recomputed from scratch each step — no
            # staleness)
            from ..mesh import compute_interpolation, points_to_mesh

            interp_e = compute_interpolation(
                pos_rows[nb:], inverse_cell, ns, nodes, method
            )
            rho = rho + points_to_mesh(interp_e, q_rows[nb:])
    return rho


def nodes_for_extent(extent: int) -> int:
    """Inverse of ``extent = TILE + nodes - 1`` for the fold helper (which
    only uses ``nodes`` to recover the extent)."""
    return extent - TILE + 1
