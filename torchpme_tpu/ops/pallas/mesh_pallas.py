"""Fused Pallas TPU kernels for tile-bucketed mesh spreading/gathering.

The XLA tiled backend (:mod:`torchpme_tpu.ops.mesh_tiled`) materializes the
densified per-tile weight factors in HBM (~1.4 GB round trip for a 100k-atom
spread).  These kernels build the dense factors **in VMEM, per tile**, and
run the contraction on the MXU in the same program, so HBM traffic drops to
the bucketed atom data plus the tile outputs.

Three kernels over a ``(n_tiles,)`` grid (one program per 8×8 xy mesh-column
tile; see ``mesh_tiled.py`` for the bucketing scheme):

* ``spread``: per-slot charges → local tile fields
  ``(E², C·nz) = (E², K) @ (K, C·nz)``;
* ``gather``: local tile fields → per-slot values (the exact transpose,
  same shapes);
* ``wgrad``: the weight-cotangent of the shared bilinear form
  ``S(w; q, F) = Σ_c Σ_k q_kc w_x w_y w_z F_{xyz,c}`` — used by the custom
  VJPs of both spread (``F = ct_tiles``) and gather (``q = ct_out``), which
  makes the pair fully differentiable without materializing dense weights.

Charge channels ride the lane axis as channel-major ``C·nz`` blocks (built
by lane *concatenation* — Mosaic supports that but not minor-dim vector
reshapes), so multi-channel LODE-style spreading and arbitrary ``nz`` both
work (non-128-multiple lanes are padded by Mosaic); charges enter as
``(C, K)`` blocks so their lane axis is the capacity.  float32 only (the
production fast path); the XLA tiled backend remains the general fallback.
``interpret=True`` runs the kernels on CPU for correctness tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spread_tiles", "gather_tiles", "supports_pallas"]

from ..mesh_tiled import TILE, TiledInterpolation


def supports_pallas(interp: TiledInterpolation, n_channels: int, dtype) -> bool:
    """Pallas fast path: float32, sublane-aligned capacity (any channel
    count and any z extent — channels ride the lane axis behind z)."""
    return dtype == jnp.float32 and interp.local_x.shape[1] % 8 == 0


def _dense_x(iota_e, start, weights, nodes):
    """(E, K) dense weights from per-slot starts and 1D stencil weights."""
    dense = jnp.zeros(iota_e.shape, jnp.float32)
    for o in range(nodes):
        dense = dense + jnp.where(iota_e == start + o, weights[o : o + 1, :], 0.0)
    return dense


def _dense_z(iota_z, start, weights, nodes, nz):
    """(K, nz) dense z weights with periodic wrap folded into the select."""
    dense = jnp.zeros(iota_z.shape, jnp.float32)
    for o in range(nodes):
        target = (start + o) % nz
        dense = dense + jnp.where(iota_z == target, weights[:, o : o + 1], 0.0)
    return dense


def _factors(lx_ref, ly_ref, sz_ref, w_ref, nodes, extent, nz, capacity):
    """Build the dense (E,K)/(E,K)/(K,nz) weight factors in VMEM."""
    iota_e = lax.broadcasted_iota(jnp.int32, (extent, capacity), 0)
    iota_z = lax.broadcasted_iota(jnp.int32, (capacity, nz), 1)
    # w_ref block: (1, K, 3, n) → per-axis (n, K) / (K, n) views
    wx = _dense_x(iota_e, lx_ref[0, 0][None, :], w_ref[0, :, 0, :].T, nodes)
    wy = _dense_x(iota_e, ly_ref[0, 0][None, :], w_ref[0, :, 1, :].T, nodes)
    wz = _dense_z(iota_z, sz_ref[0, 0][:, None], w_ref[0, :, 2, :], nodes, nz)
    wxy = (wx[:, None, :] * wy[None, :, :]).reshape(extent * extent, capacity)
    return wxy, wz


def _charge_z_factors(wz, q_ck, n_ch):
    """(K, C·nz) charge-weighted z factors from (K, nz) and (C, K).

    Channel-major lane layout built by concatenation — Mosaic supports lane
    concat but not minor-dim vector reshapes, so channels are folded as
    ``[c0 z..., c1 z..., ...]`` blocks."""
    blocks = [wz * q_ck[c][:, None] for c in range(n_ch)]
    return blocks[0] if n_ch == 1 else jnp.concatenate(blocks, axis=1)


def _spread_kernel(
    lx_ref, ly_ref, sz_ref, w_ref, q_ref, out_ref, *, nodes, extent, nz, capacity, n_ch
):
    wxy, wz = _factors(lx_ref, ly_ref, sz_ref, w_ref, nodes, extent, nz, capacity)
    wzq = _charge_z_factors(wz, q_ref[0], n_ch)
    out_ref[0] = jnp.dot(
        wxy, wzq, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _gather_kernel(
    lx_ref, ly_ref, sz_ref, w_ref, tile_ref, out_ref, *, nodes, extent, nz, capacity, n_ch
):
    wxy, wz = _factors(lx_ref, ly_ref, sz_ref, w_ref, nodes, extent, nz, capacity)
    partial = jnp.dot(
        wxy.T, tile_ref[0], preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (K, C·nz)
    rows = [
        jnp.sum(partial[:, c * nz : (c + 1) * nz] * wz, axis=1, keepdims=True).T
        for c in range(n_ch)
    ]
    out_ref[0] = rows[0] if n_ch == 1 else jnp.concatenate(rows, axis=0)  # (C, K)


def _wgrad_kernel(
    lx_ref, ly_ref, sz_ref, w_ref, q_ref, tile_ref, wg_ref,
    *, nodes, extent, nz, capacity, n_ch,
):
    """∂S/∂w of S = Σ_kc q_kc Σ_xyz wx wy wz F_c — all three axis blocks."""
    iota_e = lax.broadcasted_iota(jnp.int32, (extent, capacity), 0)
    iota_z = lax.broadcasted_iota(jnp.int32, (capacity, nz), 1)
    wx = _dense_x(iota_e, lx_ref[0, 0][None, :], w_ref[0, :, 0, :].T, nodes)
    wy = _dense_x(iota_e, ly_ref[0, 0][None, :], w_ref[0, :, 1, :].T, nodes)
    wz = _dense_z(iota_z, sz_ref[0, 0][:, None], w_ref[0, :, 2, :], nodes, nz)
    q_ck = q_ref[0]  # (C, K)

    field = tile_ref[0]  # (E², C·nz)
    wzq = _charge_z_factors(wz, q_ck, n_ch)
    # Fz[xy, k] = Σ_zc F[xy, zc] wzq[k, zc]
    fz = jnp.dot(
        field, wzq.T, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    ).reshape(extent, extent, capacity)
    # axis-x cotangent: A[x,k] = Σ_y wy[y,k] Fz[x,y,k]; pick rows lx+o
    a_x = jnp.sum(fz * wy[None, :, :], axis=1)  # (E, K)
    b_y = jnp.sum(fz * wx[:, None, :], axis=0)  # (E, K)
    # axis-z cotangent: H[k,zc] = Σ_xy wxy[xy,k] F[xy,zc], channel-contracted
    wxy = (wx[:, None, :] * wy[None, :, :]).reshape(extent * extent, capacity)
    h = jnp.dot(
        wxy.T, field, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (K, C·nz)
    hq = sum(
        q_ck[c][:, None] * h[:, c * nz : (c + 1) * nz] for c in range(n_ch)
    )  # (K, nz)
    sel_x, sel_y, sel_z = [], [], []
    for o in range(nodes):
        sel_x.append(
            jnp.sum(jnp.where(iota_e == lx_ref[0, 0][None, :] + o, a_x, 0.0), axis=0)
        )
        sel_y.append(
            jnp.sum(jnp.where(iota_e == ly_ref[0, 0][None, :] + o, b_y, 0.0), axis=0)
        )
        tgt_z = (sz_ref[0, 0][:, None] + o) % nz
        sel_z.append(jnp.sum(jnp.where(iota_z == tgt_z, hq, 0.0), axis=1))
    # (K, 3, n): one contiguous store
    wg_ref[0] = jnp.stack(
        [jnp.stack(sel_x, -1), jnp.stack(sel_y, -1), jnp.stack(sel_z, -1)], axis=1
    )


def _tile_geometry(interp: TiledInterpolation):
    n_tiles, capacity = interp.local_x.shape
    extent = TILE + interp.nodes - 1
    return n_tiles, capacity, extent, interp.ns[2]


def _data_specs(capacity, nodes):
    # (T, K) arrays carry a dummy middle axis so the (1, 1, K) blocks satisfy
    # the Mosaic constraint (last two block dims equal the array dims)
    slot_spec = pl.BlockSpec((1, 1, capacity), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
    return [
        slot_spec,
        slot_spec,
        slot_spec,
        pl.BlockSpec(
            (1, capacity, 3, nodes), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]


def _q_spec(n_ch, capacity):
    return pl.BlockSpec(
        (1, n_ch, capacity), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )


def _tile_spec(extent, nz, n_ch):
    return pl.BlockSpec(
        (1, extent * extent, nz * n_ch), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )


def _interpret():
    return jax.default_backend() != "tpu"


def _compiler_params():
    # the unrolled dense-weight builds need more than the 16 MB default of
    # scoped VMEM at production tile sizes
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _spread_impl(interp: TiledInterpolation, q_slots: Array) -> Array:
    """q_slots (T, C, K) → tile fields (T, E², C·nz)."""
    n_tiles, capacity, extent, nz = _tile_geometry(interp)
    n_ch = q_slots.shape[1]
    kernel = functools.partial(
        _spread_kernel,
        nodes=interp.nodes, extent=extent, nz=nz, capacity=capacity, n_ch=n_ch,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_data_specs(capacity, interp.nodes) + [_q_spec(n_ch, capacity)],
        out_specs=_tile_spec(extent, nz, n_ch),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, extent * extent, nz * n_ch), jnp.float32
        ),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(
        interp.local_x[:, None],
        interp.local_y[:, None],
        interp.start_z[:, None],
        interp.weights,
        q_slots,
    )


def _gather_impl(interp: TiledInterpolation, tiles: Array, n_ch: int) -> Array:
    """tile fields (T, E², C·nz) → per-slot values (T, C, K)."""
    n_tiles, capacity, extent, nz = _tile_geometry(interp)
    kernel = functools.partial(
        _gather_kernel,
        nodes=interp.nodes, extent=extent, nz=nz, capacity=capacity, n_ch=n_ch,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_data_specs(capacity, interp.nodes) + [_tile_spec(extent, nz, n_ch)],
        out_specs=_q_spec(n_ch, capacity),
        out_shape=jax.ShapeDtypeStruct((n_tiles, n_ch, capacity), jnp.float32),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(
        interp.local_x[:, None],
        interp.local_y[:, None],
        interp.start_z[:, None],
        interp.weights,
        tiles,
    )


def _wgrad_impl(interp: TiledInterpolation, q_slots: Array, tiles: Array) -> Array:
    n_tiles, capacity, extent, nz = _tile_geometry(interp)
    n_ch = q_slots.shape[1]
    kernel = functools.partial(
        _wgrad_kernel,
        nodes=interp.nodes, extent=extent, nz=nz, capacity=capacity, n_ch=n_ch,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=_data_specs(capacity, interp.nodes)
        + [_q_spec(n_ch, capacity), _tile_spec(extent, nz, n_ch)],
        out_specs=pl.BlockSpec(
            (1, capacity, 3, interp.nodes),
            lambda t: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, capacity, 3, interp.nodes), jnp.float32
        ),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(
        interp.local_x[:, None],
        interp.local_y[:, None],
        interp.start_z[:, None],
        interp.weights,
        q_slots,
        tiles,
    )


# -- differentiable entry points -----------------------------------------------
# Bucketed data enters as explicit arrays so custom_vjp sees the weight leaves;
# integer index arrays get float0 cotangents.


def _int_cotangents(*arrays):
    import numpy as np

    return tuple(np.zeros(a.shape, dtype=jax.dtypes.float0) for a in arrays)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spread(static, lx, ly, sz, weights, q_slots):
    return _spread_impl(_rebuild(static, lx, ly, sz, weights), q_slots)


def _spread_fwd(static, lx, ly, sz, weights, q_slots):
    out = _spread(static, lx, ly, sz, weights, q_slots)
    return out, (lx, ly, sz, weights, q_slots)


def _spread_bwd(static, residuals, ct_tiles):
    lx, ly, sz, weights, q_slots = residuals
    interp = _rebuild(static, lx, ly, sz, weights)
    ct_q = _gather_impl(interp, ct_tiles, q_slots.shape[1])
    ct_w = _wgrad_impl(interp, q_slots, ct_tiles)
    return (*_int_cotangents(lx, ly, sz), ct_w, ct_q)


_spread.defvjp(_spread_fwd, _spread_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather(static, lx, ly, sz, weights, tiles):
    n_ch = static[2]
    return _gather_impl(_rebuild(static, lx, ly, sz, weights), tiles, n_ch)


def _gather_fwd(static, lx, ly, sz, weights, tiles):
    out = _gather(static, lx, ly, sz, weights, tiles)
    return out, (lx, ly, sz, weights, tiles)


def _gather_bwd(static, residuals, ct_out):
    lx, ly, sz, weights, tiles = residuals
    interp = _rebuild(static, lx, ly, sz, weights)
    ct_tiles = _spread_impl(interp, ct_out)
    ct_w = _wgrad_impl(interp, ct_out, tiles)
    return (*_int_cotangents(lx, ly, sz), ct_w, ct_tiles)


_gather.defvjp(_gather_fwd, _gather_bwd)


def _rebuild(static, lx, ly, sz, weights) -> TiledInterpolation:
    ns, nodes = static[0], static[1]
    return TiledInterpolation(
        local_x=lx,
        local_y=ly,
        start_z=sz,
        weights=weights,
        slot_of_atom=jnp.zeros((0,), jnp.int32),
        dropped=jnp.zeros((), jnp.int32),
        ns=ns,
        nodes=nodes,
    )


def spread_tiles(interp: TiledInterpolation, q_slots: Array) -> Array:
    """Per-slot charges ``(T, K, C)`` → local tile fields ``(T, E², C·nz)``.

    Differentiable w.r.t. both the charges and the stencil weights (and
    therefore, through :func:`compute_tiled_interpolation`, the positions).
    """
    static = (interp.ns, interp.nodes, q_slots.shape[-1])
    return _spread(
        static, interp.local_x, interp.local_y, interp.start_z,
        interp.weights, jnp.swapaxes(q_slots, 1, 2),
    )


def gather_tiles(interp: TiledInterpolation, tiles: Array, n_channels: int) -> Array:
    """Local tile fields ``(T, E², C·nz)`` → per-slot values ``(T, K, C)``."""
    static = (interp.ns, interp.nodes, n_channels)
    out = _gather(
        static, interp.local_x, interp.local_y, interp.start_z,
        interp.weights, tiles,
    )
    return jnp.swapaxes(out, 1, 2)
