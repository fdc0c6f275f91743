"""Tile-bucketed mesh spreading/gathering as batched MXU contractions.

XLA:TPU lowers element scatters and gathers to extremely slow serialized
loops (measured ~150 ms to spread 100k atoms × 5³ stencils on a v5e — see
repo history), so the hot PME path here avoids indexed memory ops entirely:

1. atoms are bucketed into 8×8 mesh-column tiles in the xy-plane (one
   ``argsort`` of N tile ids, trivially cheap);
2. per tile, the 1D stencil weights are **densified** against small local
   iota grids with ``where``-selects (VPU-friendly, no indexing);
3. spreading becomes one batched GEMM per tile batch,
   ``(tiles, local_xy, K) @ (tiles, K, nz·C)`` — MXU work, ~5 GFLOP for
   100k atoms on a 256³ mesh;
4. tile outputs are folded into the global mesh with **parity-class
   reshapes** (tiles of the same (x, y) parity never overlap, so four
   transpose+reshape passes and three shifted adds replace all scatters);
5. gathering is the exact transpose — two batched GEMMs — so autodiff
   through either op stays MXU-bound.

z stays untiled: the wrap in z is folded directly into the densified wz
(the select condition uses the wrapped index), and the x/y wraps are folded
once on the assembled padded mesh.

Correctness bound: each tile has a static atom capacity (default 8× the
mean occupancy — unreachable for condensed-phase systems at these tile
sizes); atoms beyond capacity are counted in ``TiledInterpolation.dropped``
and the public entry points raise eagerly when it is nonzero outside jit.
The generic scatter implementation in :mod:`torchpme_tpu.ops.mesh` remains
the fallback for meshes too small to tile.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax

from .mesh import compute_1d_weight_derivatives, compute_1d_weights

__all__ = [
    "refresh_tiled_interpolation",
    "TiledInterpolation",
    "supports_tiling",
    "compute_tiled_interpolation",
    "tiled_points_to_mesh",
    "tiled_mesh_to_points",
]

TILE = 8  # xy tile edge in mesh cells


def supports_tiling(ns, interpolation_nodes: int) -> bool:
    """Tiling needs even tile grids and stencils that fit a 2-tile window."""
    nx, ny, _ = (int(n) for n in ns)
    extent_ok = interpolation_nodes <= TILE + 1
    return (
        extent_ok
        and nx % (2 * TILE) == 0
        and ny % (2 * TILE) == 0
        and nx >= 2 * TILE
        and ny >= 2 * TILE
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TiledInterpolation:
    """Bucketed stencil data for one set of positions on one mesh.

    Shapes: ``T`` tiles, ``K`` capacity, ``n`` stencil nodes.
    """

    local_x: Array  # (T, K) int32, stencil start within the tile, [0, TILE)
    local_y: Array  # (T, K) int32
    start_z: Array  # (T, K) int32, unwrapped z start, [0, nz)
    weights: Array  # (T, K, 3, n) per-axis 1D stencil weights (0 for empty slots)
    slot_of_atom: Array  # (N,) int32 flat bucket slot per atom (K*T for dropped)
    dropped: Array  # () int32, number of atoms beyond tile capacity
    atom_of_slot: Array | None = None  # (T, K) int32, N for empty slots
    # per-axis 1D stencil weight DERIVATIVES (dW/d rel), only for dipolar
    # spreading (build with ``derivatives=True``); None otherwise
    dweights: Array | None = None  # (T, K, 3, n)
    ns: tuple[int, int, int] = field(metadata=dict(static=True), default=(1, 1, 1))
    nodes: int = field(metadata=dict(static=True), default=4)


def _max_tile_occupancy(positions, inverse_cell, ns, nodes) -> int:
    """Exact max atoms per xy tile for a concrete configuration (eager only)."""
    nx, ny, nz = (int(n) for n in ns)
    ty_count = ny // TILE
    pos = np.asarray(positions)
    rel = (pos @ np.asarray(inverse_cell)) * np.asarray(ns, dtype=pos.dtype)
    if nodes % 2 == 0:
        base = np.floor(rel).astype(np.int64)
    else:
        base = np.round(rel).astype(np.int64)
    shift0 = 1 - (nodes + 1) // 2
    start = (base + shift0) % np.asarray((nx, ny, nz), dtype=np.int64)
    tile_id = (start[:, 0] // TILE) * ty_count + start[:, 1] // TILE
    counts = np.bincount(tile_id, minlength=(nx // TILE) * ty_count)
    return int(counts.max()) if counts.size else 0


def compute_tiled_interpolation(
    positions: Array,
    inverse_cell: Array,
    ns,
    interpolation_nodes: int,
    method: str,
    capacity: int | None = None,
    derivatives: bool = False,
) -> TiledInterpolation:
    """Bucket atoms into xy tiles and precompute stencil weights.

    With ``derivatives=True`` the per-axis 1D weight *derivatives* are
    bucketed too (``.dweights``) — the gradient stencils of the dipolar
    mesh (:func:`tiled_dipoles_to_mesh`).

    Same numerical contract as :func:`torchpme_tpu.ops.mesh.compute_interpolation`
    (grid centering parity rule, wrapped indices), reorganized for the tiled
    MXU execution path.

    Example
    -------
    The tiled spread agrees with the scatter reference and conserves charge:

    >>> import jax.numpy as jnp
    >>> positions = jnp.asarray([[0.3, 1.7, 2.2], [3.1, 0.4, 1.1]])
    >>> charges = jnp.asarray([[1.0], [-2.0]])
    >>> interp = compute_tiled_interpolation(
    ...     positions, jnp.eye(3) / 4.0, (16, 16, 16), 4, "Lagrange"
    ... )
    >>> rho = tiled_points_to_mesh(interp, charges)
    >>> print(f"{float(jnp.sum(rho)):.6f}")
    -1.000000
    """
    ns = tuple(int(n) for n in ns)
    nodes = int(interpolation_nodes)
    nx, ny, nz = ns
    n_atoms = positions.shape[0]
    tx_count, ty_count = nx // TILE, ny // TILE
    n_tiles = tx_count * ty_count
    if capacity is None:
        concrete = not (
            isinstance(positions, jax.core.Tracer)
            or isinstance(inverse_cell, jax.core.Tracer)
        )
        if concrete:
            # exact auto-capacity: count the true max tile occupancy so
            # inhomogeneous (slab/vacuum) systems get a safe capacity without
            # manual sizing. +8 slack absorbs small MD drift across rebuckets;
            # rounded up for MXU contraction efficiency (capacity is the GEMM
            # reduction dim).
            max_count = int(
                _max_tile_occupancy(positions, inverse_cell, ns, nodes)
            )
            capacity = int(-(-min(n_atoms, max_count + 8) // 64) * 64)
        else:
            # under tracing the capacity must be static: 2x the mean occupancy
            # plus slack (≥10σ for condensed-phase systems at these tile
            # sizes). Inhomogeneous systems should bucket eagerly or pass
            # `capacity`; overflow is counted in `.dropped` and the calculator
            # NaN-poisons the energy when it is nonzero.
            mean = -(-n_atoms // n_tiles)
            capacity = int(-(-min(n_atoms, 2 * mean + 32) // 64) * 64)

    ns_arr = jnp.asarray(ns, dtype=positions.dtype)
    rel = (
        jnp.matmul(positions, inverse_cell, precision=jax.lax.Precision.HIGHEST)
        * ns_arr
    )
    if nodes % 2 == 0:
        base = jnp.floor(rel).astype(jnp.int32)
        offsets = rel - (base + 0.5)
    else:
        base = jnp.round(rel).astype(jnp.int32)
        offsets = rel - base
    weights_1d = compute_1d_weights(offsets, nodes, method)  # (n, N, 3)
    weights = jnp.transpose(weights_1d, (1, 2, 0))  # (N, 3, n)
    dweights = (
        jnp.transpose(compute_1d_weight_derivatives(offsets, nodes, method), (1, 2, 0))
        if derivatives
        else None
    )

    # unwrapped stencil start per axis, wrapped into [0, ns)
    shift0 = 1 - (nodes + 1) // 2
    start = (base + shift0) % jnp.asarray(ns, dtype=jnp.int32)  # (N, 3)
    tile_x = start[:, 0] // TILE
    tile_y = start[:, 1] // TILE
    tile_id = tile_x * ty_count + tile_y

    # bucket by tile: one sort of N keys, then rank-within-tile.  (A sort-free
    # cumsum-over-onehot rank was tried and measured ~10 ms slower end-to-end
    # on the v5e at 100k atoms; the sort stays.)
    order = jnp.argsort(tile_id)
    tid_sorted = tile_id[order]
    tile_starts = jnp.searchsorted(tid_sorted, jnp.arange(n_tiles))
    rank = jnp.arange(n_atoms) - tile_starts[tid_sorted]
    valid = rank < capacity
    dropped = jnp.sum(~valid).astype(jnp.int32)
    # flat slot per *sorted* atom; dropped atoms land in a trash slot
    slot_sorted = jnp.where(valid, tid_sorted * capacity + rank, n_tiles * capacity)
    slot_of_atom = (
        jnp.zeros((n_atoms,), jnp.int32).at[order].set(slot_sorted.astype(jnp.int32))
    )

    # bucket tables (+1 trash row), filled by a unique-index scatter of N rows
    def bucketize(values, fill=0):
        flat = jnp.full(
            (n_tiles * capacity + 1, *values.shape[1:]), fill, values.dtype
        )
        flat = flat.at[slot_of_atom].set(values)
        return flat[:-1].reshape(n_tiles, capacity, *values.shape[1:])

    b_weights = bucketize(weights)  # zero weights in empty slots → no contribution
    b_dweights = bucketize(dweights) if derivatives else None
    b_local_x = bucketize((start[:, 0] - tile_x * TILE).astype(jnp.int32))
    b_local_y = bucketize((start[:, 1] - tile_y * TILE).astype(jnp.int32))
    b_start_z = bucketize(start[:, 2].astype(jnp.int32))
    b_atom = bucketize(jnp.arange(n_atoms, dtype=jnp.int32), fill=n_atoms)

    return TiledInterpolation(
        local_x=b_local_x,
        local_y=b_local_y,
        start_z=b_start_z,
        weights=b_weights,
        slot_of_atom=slot_of_atom,
        dropped=dropped,
        atom_of_slot=b_atom,
        dweights=b_dweights,
        ns=ns,
        nodes=nodes,
    )


def _dense_axis_weights(local_start, axis_weights, extent, wrap=None):
    """Densify 1D stencil weights onto a local iota grid with selects.

    :param local_start: (T, K) start index of the stencil on the local grid.
    :param axis_weights: (T, K, n) stencil weights.
    :param extent: length of the local grid.
    :param wrap: optional modulus applied to the target index (z-axis wrap).
    :return: (T, K, extent) dense weights.
    """
    nodes = axis_weights.shape[-1]
    iota = jnp.arange(extent, dtype=jnp.int32)
    dense = jnp.zeros(
        (*local_start.shape, extent), dtype=axis_weights.dtype
    )
    for o in range(nodes):
        target = local_start + o
        if wrap is not None:
            target = target % wrap
        dense = dense + jnp.where(
            iota == target[..., None], axis_weights[..., o : o + 1], 0.0
        )
    return dense


def _tile_geometry(ns, nodes):
    nx, ny, nz = ns
    tx_count, ty_count = nx // TILE, ny // TILE
    extent = TILE + nodes - 1  # local xy extent a stencil can cover
    return nx, ny, nz, tx_count, ty_count, extent


def _fold_tiles_to_mesh(tile_fields: Array, ns, nodes) -> Array:
    """Assemble per-tile local fields (T, E, E, nz, C) into (C, nx, ny, nz).

    Tiles of equal (x, y) parity are disjoint, so each parity class folds
    with a pad + transpose + reshape; the four classes and the x/y wraps are
    combined with plain shifted adds.  No scatters.
    """
    nx, ny, nz, tx_count, ty_count, extent = _tile_geometry(ns, nodes)
    n_ch = tile_fields.shape[-1]
    window = 2 * TILE
    pad = window - extent
    tiles = jnp.pad(
        tile_fields.reshape(tx_count, ty_count, extent, extent, nz, n_ch),
        ((0, 0), (0, 0), (0, pad), (0, pad), (0, 0), (0, 0)),
    )

    padded = jnp.zeros((nx + window, ny + window, nz, n_ch), tile_fields.dtype)
    for px in range(2):
        for py in range(2):
            cls = tiles[px::2, py::2]  # (tx/2, ty/2, W, W, nz, C), disjoint
            ntx, nty = cls.shape[0], cls.shape[1]
            block = cls.transpose(0, 2, 1, 3, 4, 5).reshape(
                ntx * window, nty * window, nz, n_ch
            )
            x0, y0 = px * TILE, py * TILE
            padded = padded.at[
                x0 : x0 + ntx * window, y0 : y0 + nty * window
            ].add(block)
    # fold x/y wraps of the halo region back into the periodic mesh
    mesh = padded[:nx, :ny]
    mesh = mesh.at[:window, :].add(padded[nx:, :ny])
    mesh = mesh.at[:, :window].add(padded[:nx, ny:])
    mesh = mesh.at[:window, :window].add(padded[nx:, ny:])
    return jnp.transpose(mesh, (3, 0, 1, 2))  # (C, nx, ny, nz)


def _extract_tiles_from_mesh(mesh: Array, ns, nodes) -> Array:
    """Cut (T, E, E, nz, C) local windows out of (C, nx, ny, nz).

    Transpose of :func:`_fold_tiles_to_mesh`: build the wrap-padded mesh,
    slice the four parity classes out with reshapes, crop to the stencil
    extent.
    """
    nx, ny, nz, tx_count, ty_count, extent = _tile_geometry(ns, nodes)
    n_ch = mesh.shape[0]
    window = 2 * TILE
    field = jnp.transpose(mesh, (1, 2, 3, 0))  # (nx, ny, nz, C)
    padded = jnp.concatenate([field, field[:window]], axis=0)
    padded = jnp.concatenate([padded, padded[:, :window]], axis=1)

    classes = []
    for px in range(2):
        for py in range(2):
            ntx, nty = tx_count // 2, ty_count // 2
            x0, y0 = px * TILE, py * TILE
            block = padded[x0 : x0 + ntx * window, y0 : y0 + nty * window]
            cls = block.reshape(ntx, window, nty, window, nz, n_ch).transpose(
                0, 2, 1, 3, 4, 5
            )
            classes.append(cls[:, :, :extent, :extent])
    # interleave parity classes back to (tx, ty) tile order
    stacked = jnp.stack(classes).reshape(
        2, 2, tx_count // 2, ty_count // 2, extent, extent, nz, n_ch
    )
    tiles = stacked.transpose(2, 0, 3, 1, 4, 5, 6, 7).reshape(
        tx_count * ty_count, extent, extent, nz, n_ch
    )
    return tiles


def _dense_weight_factors(interp: TiledInterpolation):
    _, _, nz, _, _, extent = _tile_geometry(interp.ns, interp.nodes)
    wx = _dense_axis_weights(interp.local_x, interp.weights[:, :, 0], extent)
    wy = _dense_axis_weights(interp.local_y, interp.weights[:, :, 1], extent)
    wz = _dense_axis_weights(interp.start_z, interp.weights[:, :, 2], nz, wrap=nz)
    wxy = wx[:, :, :, None] * wy[:, :, None, :]  # (T, K, E, E)
    return wxy, wz


def _use_pallas(interp: TiledInterpolation, n_channels: int, dtype, impl: str) -> bool:
    if impl != "pallas":
        # "auto" resolves to the XLA tile-GEMM path: with the exact
        # auto-capacity bucketing (v5e, 102k atoms, 128³ mesh, capacity 512)
        # XLA beats the fused Pallas kernels both forward (3.9 vs 4.9 ms
        # spread) and through the VJP (7.3 vs 19.9 ms for the full
        # refresh+spread+gather fwd+bwd) — see tools/profile_step.py.  The
        # Pallas kernels remain available as an explicit opt-in.
        return False
    from .pallas.mesh_pallas import supports_pallas

    if not supports_pallas(interp, n_channels, dtype):
        raise ValueError(
            "Pallas mesh kernels require float32 data and a sublane-aligned "
            "tile capacity (multiple of 8)"
        )
    return True


def tiled_points_to_mesh(
    interp: TiledInterpolation, particle_weights: Array, impl: str = "auto"
) -> Array:
    """Spread particle weights onto the mesh via batched tile GEMMs.

    Numerically identical to :func:`torchpme_tpu.ops.mesh.points_to_mesh`
    (same stencils, different summation order).

    :param impl: ``"auto"`` (the XLA tile-GEMM path — it beats the fused
        Pallas kernels through the VJP at production sizes, see
        ``_use_pallas``), ``"pallas"`` (opt-in fused kernels: f32, any
        channel count / z extent), or ``"xla"``.
    """
    nz = interp.ns[2]
    n_tiles, capacity = interp.local_x.shape
    extent = TILE + interp.nodes - 1
    n_ch = particle_weights.shape[1]

    # per-slot charges (trash slot exists but is sliced away)
    flat_q = jnp.zeros(
        (n_tiles * capacity + 1, n_ch), particle_weights.dtype
    ).at[interp.slot_of_atom].set(particle_weights)
    b_q = flat_q[:-1].reshape(n_tiles, capacity, n_ch)

    if _use_pallas(interp, n_ch, particle_weights.dtype, impl):
        from .pallas.mesh_pallas import spread_tiles

        # pallas fields are channel-major on the lane axis: (T, E², C·nz)
        tiles = spread_tiles(interp, b_q)
        tiles = tiles.reshape(n_tiles, extent, extent, n_ch, nz)
        return _fold_tiles_to_mesh(
            jnp.moveaxis(tiles, 3, 4), interp.ns, interp.nodes
        )

    wxy, wz = _dense_weight_factors(interp)
    # (T, K, nz, C) charge-carrying z factors → one batched GEMM over K
    qz = wz[..., None] * b_q[:, :, None, :]
    # HIGHEST precision: default TPU matmul precision is bf16 inputs, which
    # costs ~3e-3 relative accuracy — far above the 1e-4 force target
    rho_tiles = lax.dot_general(
        wxy.reshape(n_tiles, capacity, extent * extent),
        qz.reshape(n_tiles, capacity, nz * n_ch),
        (((1,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=particle_weights.dtype,
    ).reshape(n_tiles, extent, extent, nz, n_ch)
    return _fold_tiles_to_mesh(rho_tiles, interp.ns, interp.nodes)


def tiled_mesh_to_points(
    interp: TiledInterpolation, mesh_vals: Array, impl: str = "auto"
) -> Array:
    """Back-interpolate a mesh field at the particle positions (transpose of
    :func:`tiled_points_to_mesh`, also two batched GEMMs).

    :param impl: ``"auto"`` / ``"pallas"`` / ``"xla"`` (see
        :func:`tiled_points_to_mesh`).
    """
    nz = interp.ns[2]
    n_tiles, capacity = interp.local_x.shape
    extent = TILE + interp.nodes - 1
    n_ch = mesh_vals.shape[0]

    tiles = _extract_tiles_from_mesh(mesh_vals, interp.ns, interp.nodes)

    if _use_pallas(interp, n_ch, mesh_vals.dtype, impl):
        from .pallas.mesh_pallas import gather_tiles

        # pallas fields are channel-major on the lane axis: (T, E², C·nz)
        tiles_cz = jnp.moveaxis(tiles, 4, 3).reshape(
            n_tiles, extent * extent, n_ch * nz
        )
        per_slot = gather_tiles(interp, tiles_cz, n_ch).reshape(
            n_tiles * capacity, n_ch
        )
        per_slot = jnp.concatenate(
            [per_slot, jnp.zeros((1, n_ch), per_slot.dtype)], axis=0
        )
        return per_slot[interp.slot_of_atom]
    wxy, wz = _dense_weight_factors(interp)
    # contract xy: (T, K, XY) @ (T, XY, nz·C) → (T, K, nz·C)
    partial = lax.dot_general(
        wxy.reshape(n_tiles, capacity, extent * extent),
        tiles.reshape(n_tiles, extent * extent, nz * n_ch),
        (((2,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=mesh_vals.dtype,
    ).reshape(n_tiles, capacity, nz, n_ch)
    # contract z with the stencil weights
    per_slot = jnp.einsum(
        "tkz,tkzc->tkc", wz, partial, precision="highest"
    ).reshape(n_tiles * capacity, n_ch)
    per_slot = jnp.concatenate(
        [per_slot, jnp.zeros((1, n_ch), per_slot.dtype)], axis=0
    )
    return per_slot[interp.slot_of_atom]


def _dense_dipole_factors(interp: TiledInterpolation):
    """Per-axis (xy-plane, z-line) dense factor pairs of the three gradient
    stencils ``term_a = ∂_a[Wx Wy Wz]`` (fractional-mesh units)."""
    if interp.dweights is None:
        raise ValueError(
            "This TiledInterpolation carries no weight derivatives; build it "
            "with compute_tiled_interpolation(..., derivatives=True)."
        )
    _, _, nz, _, _, extent = _tile_geometry(interp.ns, interp.nodes)
    w, dw = interp.weights, interp.dweights
    wx = _dense_axis_weights(interp.local_x, w[:, :, 0], extent)
    wy = _dense_axis_weights(interp.local_y, w[:, :, 1], extent)
    wz = _dense_axis_weights(interp.start_z, w[:, :, 2], nz, wrap=nz)
    dwx = _dense_axis_weights(interp.local_x, dw[:, :, 0], extent)
    dwy = _dense_axis_weights(interp.local_y, dw[:, :, 1], extent)
    dwz = _dense_axis_weights(interp.start_z, dw[:, :, 2], nz, wrap=nz)
    ex = lambda a, b: a[:, :, :, None] * b[:, :, None, :]  # noqa: E731
    return (
        (ex(dwx, wy), wz),  # ∂x
        (ex(wx, dwy), wz),  # ∂y
        (ex(wx, wy), dwz),  # ∂z
    )


def tiled_dipoles_to_mesh(interp: TiledInterpolation, nu: Array) -> Array:
    r"""Spread point dipoles onto the mesh as a gradient density — the tiled
    (batched-GEMM, scatter-free) counterpart of
    :func:`torchpme_tpu.ops.mesh.dipoles_to_mesh`.

    The dipolar density separates per fractional axis:
    :math:`Q(m) = \sum_j \vec\mu_j\cdot\nabla_{r_j} W_j(m)
    = \sum_a \nu_{ja}\,\partial_a[W_x W_y W_z]` with the *effective
    per-axis charges* :math:`\nu_{ja} = n_a\,(\mu_j\,C^{-1})_a` (chain
    rule through ``rel = pos @ inverse_cell * ns``) — i.e. three
    monopole-like spreads whose ``a``-axis stencil is the weight
    derivative.  They run as ONE batched GEMM with the axis variants
    concatenated along the (reduction) capacity dim.

    :param nu: ``(N, 3)`` effective per-axis charges
        ``(dipoles @ inverse_cell) * ns``.
    :return: dipolar density mesh ``(1, nx, ny, nz)``.
    """
    nz = interp.ns[2]
    n_tiles, capacity = interp.local_x.shape
    extent = TILE + interp.nodes - 1

    flat_nu = jnp.zeros((n_tiles * capacity + 1, 3), nu.dtype).at[
        interp.slot_of_atom
    ].set(nu)
    b_nu = flat_nu[:-1].reshape(n_tiles, capacity, 3)

    factors = _dense_dipole_factors(interp)
    w_cat = jnp.concatenate(
        [wxy.reshape(n_tiles, capacity, extent * extent) for wxy, _ in factors],
        axis=1,
    )  # (T, 3K, E²)
    q_cat = jnp.concatenate(
        [zfac * b_nu[:, :, a : a + 1] for a, (_, zfac) in enumerate(factors)],
        axis=1,
    )  # (T, 3K, nz)
    rho_tiles = lax.dot_general(
        w_cat,
        q_cat,
        (((1,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=nu.dtype,
    ).reshape(n_tiles, extent, extent, nz, 1)
    return _fold_tiles_to_mesh(rho_tiles, interp.ns, interp.nodes)


def tiled_mesh_to_dipole_field(interp: TiledInterpolation, mesh_vals: Array) -> Array:
    r"""Back-interpolate a filtered mesh to per-atom gradient fields in
    fractional-mesh units (transpose of :func:`tiled_dipoles_to_mesh`):
    ``e_rel[j, a] = Σ_m ∂_a[W_j](m)·mesh(m)``, so
    ``Σ_j ν_j·e_rel_j == Σ_m Q·mesh`` exactly.  Chain to position units
    with ``(e_rel * ns) @ inverse_cell.T`` at the caller.
    """
    nz = interp.ns[2]
    n_tiles, capacity = interp.local_x.shape
    extent = TILE + interp.nodes - 1

    tiles = _extract_tiles_from_mesh(mesh_vals, interp.ns, interp.nodes)
    tiles2 = tiles.reshape(n_tiles, extent * extent, nz)
    comps = []
    for wxy, zfac in _dense_dipole_factors(interp):
        partial = lax.dot_general(
            wxy.reshape(n_tiles, capacity, extent * extent),
            tiles2,
            (((2,), (1,)), ((0,), (0,))),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=mesh_vals.dtype,
        )  # (T, K, nz)
        comps.append(
            jnp.einsum("tkz,tkz->tk", zfac, partial, precision="highest")
        )
    per_slot = jnp.stack(comps, axis=-1).reshape(n_tiles * capacity, 3)
    per_slot = jnp.concatenate(
        [per_slot, jnp.zeros((1, 3), per_slot.dtype)], axis=0
    )
    return per_slot[interp.slot_of_atom]


def refresh_tiled_interpolation(
    interp: TiledInterpolation,
    positions: Array,
    inverse_cell: Array,
    method: str,
) -> tuple[TiledInterpolation, Array]:
    """Recompute stencil weights for updated positions, reusing the buckets.

    The tile assignment (the sort + scatter bookkeeping, ~15 ms/step at 100k
    atoms on a v5e) is treated like a neighbor list: valid while atoms have
    not drifted out of their tile's stencil window.  This function updates
    only the per-slot geometry — one gather of the bucketed positions plus
    dense math — and returns ``(new_interp, still_valid)`` where
    ``still_valid`` is False once any atom's stencil has left its assigned
    tile window (then call :func:`compute_tiled_interpolation` to rebucket,
    exactly like refreshing a neighbor list).

    :param interp: a bucketing produced by :func:`compute_tiled_interpolation`.
    :param positions: updated ``(N, 3)`` coordinates.
    :param inverse_cell: inverse of the (possibly updated) cell.
    :param method: the interpolation method the bucketing was built for.
    """
    if interp.atom_of_slot is None:
        raise ValueError(
            "This TiledInterpolation does not carry bucket->atom indices; "
            "build it with compute_tiled_interpolation first."
        )
    ns = interp.ns
    nodes = interp.nodes
    nx, ny, nz = ns
    n_tiles, capacity = interp.local_x.shape
    ty_count = ny // TILE
    n_atoms = positions.shape[0]

    # gather bucketed positions (sentinel row keeps empty slots harmless)
    padded_pos = jnp.concatenate(
        [positions, jnp.zeros((1, 3), positions.dtype)], axis=0
    )
    pos_slots = padded_pos[interp.atom_of_slot]  # (T, K, 3)

    ns_arr = jnp.asarray(ns, dtype=positions.dtype)
    rel = (
        jnp.einsum(
            "tka,ab->tkb", pos_slots, inverse_cell, precision="highest"
        )
        * ns_arr
    )
    if nodes % 2 == 0:
        base = jnp.floor(rel).astype(jnp.int32)
        offsets = rel - (base + 0.5)
    else:
        base = jnp.round(rel).astype(jnp.int32)
        offsets = rel - base
    weights = jnp.moveaxis(
        compute_1d_weights(offsets, nodes, method), 0, -1
    )  # (T, K, 3, n)
    dweights = (
        jnp.moveaxis(compute_1d_weight_derivatives(offsets, nodes, method), 0, -1)
        if interp.dweights is not None
        else None
    )

    shift0 = 1 - (nodes + 1) // 2
    start = (base + shift0) % jnp.asarray(ns, dtype=jnp.int32)  # (T, K, 3)

    # tile origins from the static tile index
    tile_idx = jnp.arange(n_tiles, dtype=jnp.int32)
    origin_x = (tile_idx // ty_count * TILE)[:, None]
    origin_y = (tile_idx % ty_count * TILE)[:, None]
    local_x = (start[:, :, 0] - origin_x + nx) % nx
    local_y = (start[:, :, 1] - origin_y + ny) % ny

    empty = interp.atom_of_slot == n_atoms
    # zero the weights of empty slots so they contribute nothing
    weights = jnp.where(empty[..., None, None], 0.0, weights)
    if dweights is not None:
        dweights = jnp.where(empty[..., None, None], 0.0, dweights)
    local_x = jnp.where(empty, 0, local_x)
    local_y = jnp.where(empty, 0, local_y)
    start_z = jnp.where(empty, 0, start[:, :, 2])

    # validity: every occupied slot's stencil start must still lie inside its
    # tile (the local window has room for TILE-1 + nodes-1 < 2*TILE cells)
    still_valid = jnp.all(
        (empty | ((local_x < TILE) & (local_y < TILE)))
    ) & (interp.dropped == 0)

    refreshed = TiledInterpolation(
        local_x=local_x.astype(jnp.int32),
        local_y=local_y.astype(jnp.int32),
        start_z=start_z.astype(jnp.int32),
        weights=weights,
        slot_of_atom=interp.slot_of_atom,
        dropped=interp.dropped,
        atom_of_slot=interp.atom_of_slot,
        dweights=dweights,
        ns=ns,
        nodes=nodes,
    )
    return refreshed, still_valid
