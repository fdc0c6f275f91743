"""Slab-sharded MD fast path: the cell-list + tiled-mesh energy step, SPMD.

This composes the two single-chip fast-path engines over an x-slab device
mesh — the same formulation as :func:`Calculator.energy` with a ``cell_list``,
never the pair-scatter or element-scatter paths (which XLA:TPU serializes):

* **real space** — the cell grid's x planes are sharded; each device runs the
  fused window energy (:mod:`torchpme_tpu.ops.rspace_cells`, torus rolls +
  MXU pair blocks + analytic-force custom VJP) on its slab extended by ONE
  ``ppermute``-fetched halo cell plane.  The half-window offsets only ever
  look at x+1, and the i-side charges are zeroed on the halo plane, so every
  unordered pair is counted exactly once — by the device owning its lower-x
  cell.  Per-device halo traffic is O(atoms/slab-surface), and the energy is
  one scalar ``psum``.
* **k space** — each device spreads its own atoms with the tile-GEMM backend
  (:mod:`torchpme_tpu.ops.mesh_tiled`: densified stencils, batched MXU
  contractions, parity-class folds — no scatters) onto its ``nx/D``-plane
  mesh slab plus one-tile halo skirts; the skirts ride two ``ppermute`` ring
  hops, and the energy is the **distributed Parseval quadratic form**:
  slab-local z/y DFT matmuls, ONE ``all_to_all`` x↔y layout swap, an x DFT,
  and a filter-weighted ``|ρ̂|²`` sum — half the DFT passes and collectives
  of the potential-field pipeline (``parallel/sharded.py``), because no
  inverse transform and no mesh→points gather exist in the forward.  No
  collective carries the full mesh.

Gradients (forces, stress, charge derivatives) flow through all collectives:
``psum`` transposes to broadcast, ``ppermute``/``all_to_all`` to their
inverse permutations, and the window's custom VJP keeps the i-/j-side charge
cotangents separate so the halo plumbing routes them home.

No reference counterpart — the reference is single-device (SURVEY.md §2);
this is the build's multi-chip axis applied to its production step.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..ops.math import inv3
import numpy as np
from jax import Array, lax
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..ops.kspace import (
    _dft_matrices,
    _full_dft_matrices,
    _hermitian_fold_weights,
)
from ..ops.mesh import compute_1d_weight_derivatives, compute_1d_weights
from ..ops.mesh_tiled import (
    TILE,
    TiledInterpolation,
    _dense_axis_weights,
    _dense_weight_factors,
    _fold_tiles_to_mesh,
)
from ..ops.rspace_cells import (
    _half_window_chunks,
    _window_energy_split,
    compute_cell_list,
)

__all__ = [
    "ShardedMDState",
    "compute_sharded_md_state",
    "sharded_md_energy",
    "sharded_md_energy_rows",
]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShardedMDState:
    """Host-computed bucketing for the slab-sharded MD step.

    One pytree holding both slab decompositions (cells for real space, mesh
    tiles for k space), with a leading device axis on every array.  Refresh
    it like a neighbor list: it stays valid while every atom remains in its
    assigned cell AND its mesh stencil stays in its assigned tile window;
    drift beyond either poisons the energy (and its gradients) with NaN.
    """

    # cell-list x-slabs: (D, bx·ny·nz cells, cap)
    cl_atom_index: Array
    cl_slot_mask: Array
    cl_atom_wrap: Array  # (D, cells, cap, 3) int8
    # mesh-tile x-slabs: (D, tiles, K) global atom ids (n_atoms for empty)
    tm_atom_of_slot: Array
    n_axis: tuple[int, int, int] = field(metadata=dict(static=True))
    cutoff: float = field(metadata=dict(static=True))
    ns_mesh: tuple[int, int, int] = field(metadata=dict(static=True))
    nodes: int = field(metadata=dict(static=True))
    method: str = field(metadata=dict(static=True))
    n_devices: int = field(metadata=dict(static=True))
    n_atoms: int = field(metadata=dict(static=True))
    #: rows mode only (``rows=True``): global slab-row id of every atom
    #: (row ``d·cells_local·cap + c·cap + s`` of the ``(D, cells, cap)``
    #: bucketing), and the tile tables re-indexed as *extended-local* row
    #: ids — the device's own ``cells_local·cap`` rows followed by the
    #: ppermuted right-neighbor first-plane rows (the SAME halo the window
    #: exchange ships, so one halo serves both engines)
    row_of_atom: Array | None = None
    tm_slot_rows: Array | None = None
    #: tile-ALIGNED rows mode (``aligned=True``): the cell-list x/y grid is
    #: pinned to the mesh-tile grid, so each device's bucket rows reshape
    #: straight into its mesh-tile slots — no tile tables, no mesh-side
    #: gather at all (the sharded analog of ``MDFastPath(mesh_impl=
    #: "aligned")``)
    aligned: bool = field(metadata=dict(static=True), default=False)

    @property
    def n_rows(self) -> int:
        """Total slab rows (= cells · capacity; rows mode)."""
        d, cells, cap = self.cl_slot_mask.shape
        return d * cells * cap

    def bucket(self, positions: Array) -> Array:
        """Atom-order ``(N, 3)`` → slab rows ``(n_rows, 3)`` (rows mode)."""
        if self.row_of_atom is None:
            raise ValueError(
                "this state was built without rows tables; pass rows=True "
                "to compute_sharded_md_state"
            )
        rows = jnp.zeros((self.n_rows, 3), jnp.asarray(positions).dtype)
        return rows.at[self.row_of_atom].set(positions)

    def unbucket(self, rows: Array) -> Array:
        """Slab rows back to atom order (one gather; rows mode)."""
        if self.row_of_atom is None:
            raise ValueError(
                "this state was built without rows tables; pass rows=True "
                "to compute_sharded_md_state"
            )
        return rows[self.row_of_atom]


def _host_tile_tables(
    positions, cell, ns_mesh, nodes: int, D: int, tile_capacity: int | None
) -> np.ndarray:
    """Per-device mesh-tile slot tables on the extended local slab (host).

    Atoms are assigned by the x plane of their (wrapped) stencil START, so
    stencils only ever extend rightward into the right halo tile; the left
    halo tile exists for layout symmetry with the ring fold.  Returns
    ``atom_of_slot`` of shape ``(D, n_tiles, capacity)`` with the sentinel
    ``n_atoms`` in empty slots."""
    nx, ny, _nz = ns_mesh
    mx = nx // D
    pos = np.asarray(positions, dtype=np.float64)
    inv = np.linalg.inv(np.asarray(cell, dtype=np.float64))
    rel = pos @ inv
    rel -= np.floor(rel)
    rel *= np.asarray(ns_mesh)
    if nodes % 2 == 0:
        base = np.floor(rel).astype(np.int64)
    else:
        base = np.round(rel).astype(np.int64)
    shift0 = 1 - (nodes + 1) // 2
    start = (base + shift0) % np.asarray(ns_mesh)
    dev = start[:, 0] // mx
    local_x = start[:, 0] - dev * mx + TILE  # ∈ [TILE, TILE + mx)
    ty_count = ny // TILE
    tx_local = mx // TILE + 2
    n_tiles = tx_local * ty_count
    tile_flat = dev * n_tiles + (local_x // TILE) * ty_count + start[:, 1] // TILE

    counts = np.bincount(tile_flat, minlength=D * n_tiles)
    n_atoms = pos.shape[0]
    if tile_capacity is None:
        # same sizing rule as compute_tiled_interpolation's eager auto-capacity
        capacity = int(-(-min(n_atoms, int(counts.max()) + 8) // 64) * 64)
    else:
        capacity = int(tile_capacity)
        if counts.max() > capacity:
            raise ValueError(
                f"tile_capacity {capacity} below the fullest tile "
                f"({counts.max()} atoms)"
            )
    order = np.argsort(tile_flat, kind="stable")
    starts_ = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank_in = np.arange(n_atoms) - starts_[tile_flat[order]]
    atom_of_slot = np.full((D * n_tiles, capacity), n_atoms, dtype=np.int32)
    atom_of_slot[tile_flat[order], rank_in] = order
    return atom_of_slot.reshape(D, n_tiles, capacity)


def _host_row_of_atom(clist, n_atoms: int) -> np.ndarray:
    """Global slab-row id of every atom (spill=False: exactly one slot)."""
    idx_np = np.asarray(clist.atom_index)
    mask_np = np.asarray(clist.slot_mask)
    flat_rows = np.arange(idx_np.size, dtype=np.int64).reshape(idx_np.shape)
    row_of_atom_np = np.full(n_atoms, -1, dtype=np.int64)
    row_of_atom_np[idx_np[mask_np]] = flat_rows[mask_np]
    assert (row_of_atom_np >= 0).all()
    return row_of_atom_np


def _host_tile_rows(
    atom_of_slot: np.ndarray,
    row_of_atom_np: np.ndarray,
    n_atoms: int,
    per_dev: int,
    cellcap: int,
    nyc: int,
    nzc: int,
) -> np.ndarray:
    """Tile tables as extended-local row ids: a tile-slab-d slot may
    reference an atom of cell-slab d (local rows) or the first cell plane of
    slab d+1 (the window's ppermuted halo rows)."""
    D = atom_of_slot.shape[0]
    local_rows = per_dev * cellcap
    plane_rows = nyc * nzc * cellcap
    ext_rows = local_rows + plane_rows
    slot_rows = np.full_like(atom_of_slot, ext_rows, dtype=np.int64)
    for d in range(D):
        real = atom_of_slot[d] < n_atoms
        r = row_of_atom_np[np.minimum(atom_of_slot[d], n_atoms - 1)]
        d_c = r // local_rows
        loc = r % local_rows
        own = real & (d_c == d)
        halo = real & (d_c == (d + 1) % D)
        bad = real & ~own & ~halo
        if bad.any() or (halo & (loc >= plane_rows)).any():
            raise ValueError(
                "rows mode needs each device's mesh stencils confined to "
                "its own cell slab plus the next slab's first plane; this "
                "cell/mesh/nodes geometry violates that (stencil span "
                "exceeds the cell edge — use rows=False or a finer cell "
                "grid)"
            )
        slot_rows[d][own] = loc[own]
        slot_rows[d][halo] = local_rows + loc[halo]
    return slot_rows


def compute_sharded_md_state(
    calc,
    positions,
    cell,
    cutoff: float,
    ns_mesh=None,
    n_devices: int = 8,
    cell_capacity: int | None = None,
    tile_capacity: int | None = None,
    rows: bool = False,
    aligned: bool = False,
) -> ShardedMDState:
    """Bucket atoms into per-device cell and mesh-tile slabs (host, eager).

    :param calc: a mesh calculator (PME/P3M); supplies ``interpolation_nodes``
        and the weight method.
    :param cutoff: real-space cutoff (as for :func:`compute_cell_list`).
    :param ns_mesh: mesh shape; computed from ``calc.get_ns_mesh(cell)`` when
        omitted.  ``nx`` must satisfy ``nx % n_devices == 0`` with
        ``nx/n_devices`` a multiple of 16, and ``ny`` must be a multiple of
        both 16 and ``n_devices`` (power-of-two meshes on 2^k devices with
        nx ≥ 16·D satisfy all of this).
    :param rows: also build the slab-row tables for the bucket-order entry
        (:func:`sharded_md_energy_rows`): positions live device-sharded in
        bucket-row layout, so the step pays no replicated O(N) position
        gather and no cross-device force reduction at all.  Requires every
        mesh stencil that starts in a device's slab to belong to an atom of
        that slab or the first cell plane of the next (always true when the
        cell edge exceeds the stencil span ``interpolation_nodes × mesh
        spacing`` — checked, with a hard error otherwise).
    :param aligned: pin the cell-list x/y grid to the mesh-tile grid
        (``xy_cells = (nx/8, ny/8)``; needs every tile edge ≥ ``cutoff`` and
        ``nx/8`` divisible by ``n_devices``) so each device's bucket rows
        double as its mesh-tile slots: the rows step then spreads with the
        fused Pallas kernels straight from its row block — zero mesh-side
        gathers and no tile tables (the sharded analog of
        ``MDFastPath(mesh_impl="aligned")``).  Implies ``rows=True``; the
        row state must be float32 (the fused kernels are f32-only).
    """
    if ns_mesh is None:
        ns_mesh = calc.get_ns_mesh(cell)
    ns_mesh = tuple(int(n) for n in ns_mesh)
    nodes = int(calc.interpolation_nodes)
    method = calc._method
    nx, ny, nz = ns_mesh
    D = int(n_devices)
    if nx % D:
        raise ValueError(f"mesh nx={nx} must be divisible by {D} devices")
    mx = nx // D
    if mx % (2 * TILE):
        raise ValueError(
            f"mesh slab of {mx} planes must be a multiple of {2 * TILE} for "
            "the tiled slab spread (use a finer mesh or fewer devices)"
        )
    if ny % (2 * TILE) or ny % D:
        raise ValueError(
            f"mesh ny={ny} must be a multiple of {2 * TILE} and of the "
            f"{D}-device axis (for the distributed-DFT layout swap)"
        )
    if nodes > TILE + 1:
        raise ValueError(f"interpolation_nodes={nodes} exceeds the tile halo")

    # --- real space: x-sharded cell list (no spill: the side list would need
    # the full grid, defeating the sharding; capacity covers the fullest cell)
    if aligned:
        rows = True
        from ..md import MDFastPath

        if not MDFastPath._aligned_supported(cell, cutoff, ns_mesh):
            raise ValueError(
                "aligned sharded state needs one mesh tile (8 mesh cells) "
                "per x/y cell-list cell with edge >= cutoff; this cell/mesh/"
                "cutoff combination does not allow it (use aligned=False)"
            )
        if (nx // TILE) % D:
            raise ValueError(
                f"aligned sharded state needs the {nx // TILE} x tile "
                f"columns divisible over {D} devices"
            )
        clist = compute_cell_list(
            positions, cell, cutoff, capacity=cell_capacity, spill=False,
            xy_cells=(nx // TILE, ny // TILE),
        )
    else:
        clist = compute_cell_list(
            positions, cell, cutoff, capacity=cell_capacity, spill=False,
            x_multiple=D,
        )
    nxc, nyc, nzc = clist.n_axis
    cellcap = clist.slot_mask.shape[1]
    per_dev = (nxc // D) * nyc * nzc
    cl_atom_index = clist.atom_index.reshape(D, per_dev, cellcap)
    cl_slot_mask = clist.slot_mask.reshape(D, per_dev, cellcap)
    cl_atom_wrap = clist.atom_wrap.reshape(D, per_dev, cellcap, 3)

    n_atoms = int(np.asarray(positions).shape[0])
    if aligned:
        # tile-aligned: cell rows ARE the mesh-tile slots — no tile tables;
        # only the atom→row map is needed (spill=False: exactly one slot)
        row_of_atom_np = _host_row_of_atom(clist, n_atoms)
        return ShardedMDState(
            cl_atom_index=cl_atom_index,
            cl_slot_mask=cl_slot_mask,
            cl_atom_wrap=cl_atom_wrap,
            tm_atom_of_slot=jnp.zeros((D, 0, 0), jnp.int32),
            n_axis=(nxc, nyc, nzc),
            cutoff=float(clist.cutoff),
            ns_mesh=ns_mesh,
            nodes=nodes,
            method=method,
            n_devices=D,
            n_atoms=n_atoms,
            row_of_atom=jnp.asarray(row_of_atom_np, jnp.int32),
            tm_slot_rows=None,
            aligned=True,
        )

    # --- k space: per-device mesh-tile tables on the extended local slab
    atom_of_slot = _host_tile_tables(
        positions, cell, ns_mesh, nodes, D, tile_capacity
    )
    n_tiles, capacity = atom_of_slot.shape[1:]
    tm_atom_of_slot = jnp.asarray(atom_of_slot)

    row_of_atom = None
    tm_slot_rows = None
    if rows:
        row_of_atom_np = _host_row_of_atom(clist, n_atoms)
        slot_rows = _host_tile_rows(
            atom_of_slot, row_of_atom_np, n_atoms, per_dev, cellcap, nyc, nzc
        )
        row_of_atom = jnp.asarray(row_of_atom_np, jnp.int32)
        tm_slot_rows = jnp.asarray(slot_rows, jnp.int32)

    return ShardedMDState(
        cl_atom_index=cl_atom_index,
        cl_slot_mask=cl_slot_mask,
        cl_atom_wrap=cl_atom_wrap,
        tm_atom_of_slot=tm_atom_of_slot,
        n_axis=(nxc, nyc, nzc),
        cutoff=float(clist.cutoff),
        ns_mesh=ns_mesh,
        nodes=nodes,
        method=method,
        n_devices=D,
        n_atoms=n_atoms,
        row_of_atom=row_of_atom,
        tm_slot_rows=tm_slot_rows,
    )


def _slab_grids(pos_b, q_b, mask_b, cell, n_axis, rank, n_dev):
    """Center-relative slab grids + staleness from bucket-order blocks.

    ``pos_b`` is ``(cells_local, cap, 3)`` wrap-canonicalized positions,
    ``q_b`` masked charges, ``mask_b`` the slot mask; cell centers come from
    the device's *global* cell ids.  Returns
    ``(pc_t, q_g, mf_g, centers, valid)`` in the window-grid layouts."""
    dtype = pos_b.dtype
    nxc, nyc, nzc = n_axis
    bx = nxc // n_dev
    n_cells_local, cap = mask_b.shape
    n_axis_f = jnp.asarray([nxc, nyc, nzc], dtype=dtype)
    n_channels = q_b.shape[-1]

    home = rank * n_cells_local + jnp.arange(n_cells_local, dtype=jnp.int32)
    home3 = jnp.stack(
        [home // (nyc * nzc), (home // nzc) % nyc, home % nzc], axis=-1
    ).astype(dtype)
    centers = jnp.matmul((home3 + 0.5) / n_axis_f, cell, precision="highest")
    pc = (pos_b - centers[:, None, :]) * mask_b[..., None].astype(dtype)
    pc_t = jnp.moveaxis(pc.reshape(bx, nyc, nzc, cap, 3), -1, -2)
    q_g = q_b.reshape(bx, nyc, nzc, cap, n_channels)
    mf_g = mask_b.reshape(bx, nyc, nzc, cap).astype(dtype)

    # staleness of the local slab (same tolerance as the single-chip path)
    pc_sg = lax.stop_gradient(pc_t)
    inv_cell = inv3(lax.stop_gradient(cell))
    frac_t = jnp.einsum(
        "fe,xyzfa->xyzea", inv_cell * n_axis_f[None, :], pc_sg,
        precision="highest",
    )
    valid = jnp.all(jnp.abs(frac_t) < 0.5 + 1e-4)
    return pc_t, q_g, mf_g, centers, valid


def _slab_window_from_grids(
    potential, pc_t, q_g, mf_g, cell, n_axis, cutoff, axis_name, n_dev,
):
    """Halo exchange + fused window energy on prepared slab grids.

    The right neighbor's first x plane of cells rides one ``ppermute``
    (center-relative coordinates make the periodic wrap cancel, including
    across the global boundary), and the i-side charges are zeroed on the
    halo plane so each unordered pair is counted exactly once globally.
    Returns ``(e_local, pc_ext, q_ext, mf_ext)`` — the extended grids are
    shared with the mesh side of the rows path (one halo serves both
    engines)."""
    dtype = pc_t.dtype
    bx, cap = pc_t.shape[0], pc_t.shape[-1]
    n_axis_f = jnp.asarray(n_axis, dtype=dtype)

    # halo: receive the right neighbor's first plane (source i sends to i-1)
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    pc_ext = jnp.concatenate(
        [pc_t, lax.ppermute(pc_t[:1], axis_name, left)], axis=0
    )
    q_ext = jnp.concatenate(
        [q_g, lax.ppermute(q_g[:1], axis_name, left)], axis=0
    )
    mf_ext = jnp.concatenate(
        [mf_g, lax.ppermute(mf_g[:1], axis_name, left)], axis=0
    )
    i_scale = (jnp.arange(bx + 1) < bx).astype(dtype)
    qi_ext = q_ext * i_scale[:, None, None, None, None]

    chunks = _half_window_chunks(cap)
    flat = [o for chunk in chunks for o in chunk]
    offs = jnp.matmul(
        jnp.asarray(flat, dtype) / n_axis_f, cell, precision="highest"
    )
    # the custom VJP produces device-varying cotangents for these replicated
    # inputs; pcast marks them varying here so shard_map's type check passes
    # and the pcast transpose inserts the cross-device psum of the cotangents.
    # Gate the analytic-derivative hook BEFORE the pcast (pcast wraps the
    # leaves in tracers, which the gate reads as "trainable"); in analytic
    # mode the potential cotangent is a constant zero, so no pcast is needed.
    from ..ops.rspace_cells import _can_use_analytic_derivative

    use_analytic = _can_use_analytic_derivative(potential)
    offs = lax.pcast(offs, (axis_name,), to="varying")
    if not use_analytic:
        potential = jax.tree_util.tree_map(
            lambda x: lax.pcast(jnp.asarray(x), (axis_name,), to="varying"),
            potential,
        )
    e_local = _window_energy_split(
        (float(cutoff), chunks, use_analytic),
        potential, pc_ext, q_ext, mf_ext, offs, qi_ext,
    )
    return e_local, pc_ext, q_ext, mf_ext


def _slab_window_energy(
    potential, charges, cell, positions, cl_idx, cl_mask, cl_wrap,
    n_axis, cutoff, rank, axis_name, n_dev,
):
    """Local slab's fused window energy + 1-plane halo exchange (atom-order
    entry: gathers the slab's atoms from replicated ``positions``).  The
    slab analog of ``rspace_cells._prepare`` + ``_window_energy``.  Returns
    ``(e_local, valid_local)``.
    """
    dtype = positions.dtype
    mask_b = cl_mask
    pos_b = positions[cl_idx] - jnp.matmul(
        cl_wrap.astype(dtype), cell, precision="highest"
    )
    q_b = charges.astype(dtype)[cl_idx] * mask_b[..., None].astype(dtype)
    pc_t, q_g, mf_g, _centers, valid = _slab_grids(
        pos_b, q_b, mask_b, cell, n_axis, rank, n_dev
    )
    e_local, _, _, _ = _slab_window_from_grids(
        potential, pc_t, q_g, mf_g, cell, n_axis, cutoff, axis_name, n_dev
    )
    return e_local, valid


def _slab_tiled_density(
    charges, cell, positions, atom_slot, ns_mesh, nodes, method, rank,
    axis_name, n_dev,
):
    """Spread the device's atoms onto its extended mesh slab with tile GEMMs
    and fold the halo skirts into the ring neighbors.  Returns
    ``(interior (C, nx/D, ny, nz), valid_local)`` — the differentiable slab
    analog of ``mesh_tiled.refresh_tiled_interpolation`` +
    ``tiled_points_to_mesh`` (weights recomputed from the current positions
    every step, so gradients are exact)."""
    dtype = positions.dtype
    n_atoms = positions.shape[0]
    padded_pos = jnp.concatenate(
        [positions, jnp.zeros((1, 3), dtype)], axis=0
    )
    pos_slots = padded_pos[atom_slot]  # (T, K, 3)
    padded_q = jnp.concatenate(
        [charges.astype(dtype), jnp.zeros((1, charges.shape[1]), dtype)], axis=0
    )
    q_slots = padded_q[atom_slot]  # (T, K, C)
    empty = atom_slot == n_atoms
    return _slab_spread_from_slots(
        pos_slots, q_slots, empty, cell, ns_mesh, nodes, method, rank,
        axis_name, n_dev,
    )


def _slab_spread_from_slots(
    pos_slots, q_slots, empty, cell, ns_mesh, nodes, method, rank,
    axis_name, n_dev,
):
    """Tile-GEMM spread + ring skirt fold from already-gathered slot tables.

    ``pos_slots``/``q_slots`` are ``(T, K, …)`` per-tile tables (any gather
    source: replicated atom order, or the rows path's extended-local slab
    rows), ``empty`` the sentinel mask.  Returns ``(interior, valid)``."""
    dtype = pos_slots.dtype
    nx, ny, nz = ns_mesh
    mx = nx // n_dev
    ext = mx + 2 * TILE
    n_tiles, capacity = pos_slots.shape[:2]
    n_channels = q_slots.shape[-1]
    ty_count = ny // TILE
    inverse_cell = inv3(cell)
    frac = jnp.einsum(
        "tka,ab->tkb", pos_slots, inverse_cell, precision="highest"
    )
    frac = frac - jnp.floor(frac)  # wrap into the cell (zero-gradient shift)
    rel = frac * jnp.asarray(ns_mesh, dtype=dtype)
    if nodes % 2 == 0:
        base = jnp.floor(rel).astype(jnp.int32)
        offsets = rel - (base + 0.5)
    else:
        base = jnp.round(rel).astype(jnp.int32)
        offsets = rel - base
    weights = jnp.moveaxis(
        compute_1d_weights(offsets, nodes, method), 0, -1
    )  # (T, K, 3, n)
    shift0 = 1 - (nodes + 1) // 2
    start = (base + shift0) % jnp.asarray(ns_mesh, dtype=jnp.int32)

    # rebase x onto the extended slab; y/z stay global (periodic wrap)
    lx = start[:, :, 0] - rank * mx + TILE
    tile_idx = jnp.arange(n_tiles, dtype=jnp.int32)
    origin_x = (tile_idx // ty_count * TILE)[:, None]
    origin_y = (tile_idx % ty_count * TILE)[:, None]
    loc_x = lx - origin_x
    loc_y = (start[:, :, 1] - origin_y) % ny

    valid = jnp.all(
        empty | ((loc_x >= 0) & (loc_x < TILE) & (loc_y < TILE))
    )
    weights = jnp.where(empty[..., None, None], 0.0, weights)
    interp = TiledInterpolation(
        local_x=jnp.where(empty, 0, loc_x).astype(jnp.int32),
        local_y=jnp.where(empty, 0, loc_y).astype(jnp.int32),
        start_z=jnp.where(empty, 0, start[:, :, 2]).astype(jnp.int32),
        weights=weights,
        slot_of_atom=jnp.zeros((0,), jnp.int32),  # unused on this path
        dropped=jnp.zeros((), jnp.int32),
        atom_of_slot=jnp.zeros((0,), jnp.int32),  # slot source is the caller's
        ns=(ext, ny, nz),
        nodes=nodes,
    )
    wxy, wz = _dense_weight_factors(interp)
    qz = wz[..., None] * q_slots[:, :, None, :]
    extent = TILE + nodes - 1
    rho_tiles = lax.dot_general(
        wxy.reshape(n_tiles, capacity, extent * extent),
        qz.reshape(n_tiles, capacity, nz * n_channels),
        (((1,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=dtype,
    ).reshape(n_tiles, extent, extent, nz, n_channels)
    rho_ext = _fold_tiles_to_mesh(rho_tiles, (ext, ny, nz), nodes)

    # fold the halo skirts into the ring neighbors' interiors
    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = lax.ppermute(rho_ext[:, ext - TILE :], axis_name, right)
    from_right = lax.ppermute(rho_ext[:, :TILE], axis_name, left)
    interior = rho_ext[:, TILE : TILE + mx]
    interior = interior.at[:, :TILE].add(from_left)
    interior = interior.at[:, mx - TILE :].add(from_right)
    return interior, valid


def _slab_spread_dipole_from_slots(
    pos_slots, mu_slots, empty, cell, ns_mesh, nodes, method, rank,
    axis_name, n_dev,
):
    r"""Tile-GEMM GRADIENT spread for point dipoles + ring skirt fold.

    The dipolar mesh density is :math:`Q(m) = \sum_j \vec\mu_j\cdot
    \nabla_{r_j} W_j(m)` (see :mod:`torchpme_tpu.calculators.pme_dipole`).
    With :math:`\tilde\mu_a = n_a \sum_b \mu_b (\text{cell}^{-1})_{ba}` the
    per-slot value splits into TWO batched GEMMs over the slot axis — one
    with the x/y-derivative dense factors folded into the ``wxy`` plane
    (weighted by :math:`\tilde\mu_x,\tilde\mu_y`), one with the plain
    ``wxy`` against the z-derivative charge factors — instead of the
    scalar's single GEMM.  Same extended-slab layout, skirt fold, and
    staleness contract as :func:`_slab_spread_from_slots`.
    """
    dtype = pos_slots.dtype
    nx, ny, nz = ns_mesh
    mx = nx // n_dev
    ext = mx + 2 * TILE
    n_tiles, capacity = pos_slots.shape[:2]
    ty_count = ny // TILE
    inverse_cell = inv3(cell)
    frac = jnp.einsum(
        "tka,ab->tkb", pos_slots, inverse_cell, precision="highest"
    )
    frac = frac - jnp.floor(frac)
    ns_arr = jnp.asarray(ns_mesh, dtype=dtype)
    rel = frac * ns_arr
    if nodes % 2 == 0:
        base = jnp.floor(rel).astype(jnp.int32)
        offsets = rel - (base + 0.5)
    else:
        base = jnp.round(rel).astype(jnp.int32)
        offsets = rel - base
    weights = jnp.moveaxis(
        compute_1d_weights(offsets, nodes, method), 0, -1
    )  # (T, K, 3, n)
    dweights = jnp.moveaxis(
        compute_1d_weight_derivatives(offsets, nodes, method), 0, -1
    )
    # chain to Cartesian: μ̃_a = n_a Σ_b μ_b (cell⁻¹)_{ba}
    mu_rel = jnp.einsum(
        "tkb,ba,a->tka", mu_slots, inverse_cell, ns_arr, precision="highest"
    )
    shift0 = 1 - (nodes + 1) // 2
    start = (base + shift0) % jnp.asarray(ns_mesh, dtype=jnp.int32)

    lx = start[:, :, 0] - rank * mx + TILE
    tile_idx = jnp.arange(n_tiles, dtype=jnp.int32)
    origin_x = (tile_idx // ty_count * TILE)[:, None]
    origin_y = (tile_idx % ty_count * TILE)[:, None]
    loc_x = lx - origin_x
    loc_y = (start[:, :, 1] - origin_y) % ny

    valid = jnp.all(
        empty | ((loc_x >= 0) & (loc_x < TILE) & (loc_y < TILE))
    )
    dead = empty[..., None]
    weights = jnp.where(dead[..., None], 0.0, weights)
    dweights = jnp.where(dead[..., None], 0.0, dweights)
    mu_rel = jnp.where(dead, 0.0, mu_rel)
    loc_x = jnp.where(empty, 0, loc_x).astype(jnp.int32)
    loc_y = jnp.where(empty, 0, loc_y).astype(jnp.int32)
    start_z = jnp.where(empty, 0, start[:, :, 2]).astype(jnp.int32)

    extent = TILE + nodes - 1
    wx = _dense_axis_weights(loc_x, weights[:, :, 0], extent)
    wy = _dense_axis_weights(loc_y, weights[:, :, 1], extent)
    wz = _dense_axis_weights(start_z, weights[:, :, 2], nz, wrap=nz)
    dwx = _dense_axis_weights(loc_x, dweights[:, :, 0], extent)
    dwy = _dense_axis_weights(loc_y, dweights[:, :, 1], extent)
    dwz = _dense_axis_weights(start_z, dweights[:, :, 2], nz, wrap=nz)

    # GEMM 1: (μ̃_x · ẇx⊗wy + μ̃_y · wx⊗ẇy) against the plain z factors
    wxy_d = (
        mu_rel[:, :, 0, None, None] * (dwx[:, :, :, None] * wy[:, :, None, :])
        + mu_rel[:, :, 1, None, None] * (wx[:, :, :, None] * dwy[:, :, None, :])
    )
    # GEMM 2: plain wx⊗wy against μ̃_z-weighted ż factors
    wxy = wx[:, :, :, None] * wy[:, :, None, :]
    qz = mu_rel[:, :, 2, None] * dwz
    rho_tiles = lax.dot_general(
        wxy_d.reshape(n_tiles, capacity, extent * extent),
        wz.reshape(n_tiles, capacity, nz),
        (((1,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=dtype,
    ) + lax.dot_general(
        wxy.reshape(n_tiles, capacity, extent * extent),
        qz.reshape(n_tiles, capacity, nz),
        (((1,), (1,)), ((0,), (0,))),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=dtype,
    )
    rho_tiles = rho_tiles.reshape(n_tiles, extent, extent, nz, 1)
    rho_ext = _fold_tiles_to_mesh(rho_tiles, (ext, ny, nz), nodes)

    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = lax.ppermute(rho_ext[:, ext - TILE :], axis_name, right)
    from_right = lax.ppermute(rho_ext[:, :TILE], axis_name, left)
    interior = rho_ext[:, TILE : TILE + mx]
    interior = interior.at[:, :TILE].add(from_left)
    interior = interior.at[:, mx - TILE :].add(from_right)
    return interior, valid


def _slab_aligned_density(
    pos_b, q_b, cell, ns_mesh, nodes, method, n_axis, rank, axis_name, n_dev,
):
    """Tile-ALIGNED slab spread: the device's bucket rows reshape straight
    into its mesh-tile slots — zero mesh-side gathers.

    ``pos_b`` is the ``(cells_local, cap, 3)`` wrap-canonicalized row block
    (cell order ``(bx, ny_c, nz_c)``, the aligned grid), ``q_b`` the masked
    charges.  Each (x, y) tile's slots are the ``nz_c·cap`` rows of its cell
    z-column; the fused Pallas spread (:mod:`..ops.pallas.spread_fused`)
    computes stencil weights in VMEM with the position-bucketed
    ``aligned_geometry`` window, on the extended local slab (x rebased by
    ``rank·mx − TILE``, one empty tile column each side for the skirt
    frame), and the skirts ride the same ring ``ppermute`` fold as the
    unaligned slab spread.  Returns the ``(C, nx/D, ny, nz)`` interior."""
    from ..ops.pallas.spread_fused import (
        aligned_geometry,
        fused_spread,
        nodes_for_extent,
    )

    dtype = pos_b.dtype
    if dtype != jnp.float32:
        raise ValueError(
            f"the aligned sharded MD state runs the fused float32 Pallas "
            f"kernels; got {dtype} rows — use float32 state, or "
            "aligned=False"
        )
    nx, ny, nz = ns_mesh
    mx = nx // n_dev
    ext = mx + 2 * TILE
    nxc, nyc, nzc = n_axis
    bx = nxc // n_dev
    cap = pos_b.shape[1]
    n_ch = q_b.shape[-1]
    K = nzc * cap
    extent, lpad = aligned_geometry(nodes)

    rel = jnp.matmul(
        pos_b.reshape(-1, 3), inv3(cell), precision="highest"
    ) * jnp.asarray(ns_mesh, dtype)
    # rebase x onto the extended slab frame (interior at [TILE, TILE+mx));
    # integer shifts are exact in f32, keeping stencil-start decisions in
    # lockstep with the single-chip aligned path
    shift = jnp.asarray(TILE, dtype) - jnp.asarray(mx, dtype) * rank.astype(dtype)
    rel = rel.at[:, 0].add(shift)

    rel_t = jnp.swapaxes(rel.reshape(bx * nyc, K, 3), 1, 2)  # (T, 3, K)
    q_t = jnp.swapaxes(q_b.reshape(bx * nyc, K, n_ch), 1, 2)  # (T, C, K)
    rel_p = jnp.concatenate(
        [jnp.zeros((nyc, 3, K), dtype), rel_t, jnp.zeros((nyc, 3, K), dtype)],
        axis=0,
    )
    q_p = jnp.concatenate(
        [jnp.zeros((nyc, n_ch, K), dtype), q_t, jnp.zeros((nyc, n_ch, K), dtype)],
        axis=0,
    )

    static = ((ext, ny, nz), nodes, method, n_ch, extent, lpad)
    tiles = fused_spread(static, rel_p, q_p)  # ((bx+2)·nyc, E², C·nz)
    tiles = tiles.reshape(-1, extent, extent, n_ch, nz)
    rho_ext = _fold_tiles_to_mesh(
        jnp.moveaxis(tiles, 3, 4), (ext, ny, nz), nodes_for_extent(extent)
    )
    # undo the lpad window shift: locally in x (the top lpad planes are
    # write-free, so the roll wrap carries only zeros), periodically in y
    rho_ext = jnp.roll(rho_ext, (-lpad, -lpad), axis=(1, 2))

    # fold the halo skirts into the ring neighbors' interiors
    right = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_left = lax.ppermute(rho_ext[:, ext - TILE :], axis_name, right)
    from_right = lax.ppermute(rho_ext[:, :TILE], axis_name, left)
    interior = rho_ext[:, TILE : TILE + mx]
    interior = interior.at[:, :TILE].add(from_left)
    interior = interior.at[:, mx - TILE :].add(from_right)
    return interior


def _dft_quadratic_sharded(interior, kfilter_local, axis_name, n_dev):
    """Distributed Parseval quadratic form ``Σ_k w_kz K̂ |ρ̂|²``: slab-local
    z/y DFT matmuls, ONE ``all_to_all`` x↔y layout swap, the x DFT, and the
    filter-weighted local sum — the forward half of
    ``sharded._dft_filter_sharded`` (the inverse transforms only exist in
    autodiff's backward).  ``kfilter_local`` is the (nx, ny/D, kz) y-shard of
    the global filter.  Returns the device-local partial (``psum`` to total).
    """
    dtype = interior.dtype
    block, ny, nz = interior.shape[-3:]
    Pr = "highest"

    crz, srz = _dft_matrices(nz, dtype)
    re = jnp.einsum("cxyz,zk->cxyk", interior, crz, precision=Pr)
    im = jnp.einsum("cxyz,zk->cxyk", interior, srz, precision=Pr)

    cfy, sfy = _full_dft_matrices(ny, dtype, -1)
    re, im = (
        jnp.einsum("cxyk,yw->cxwk", re, cfy, precision=Pr)
        - jnp.einsum("cxyk,yw->cxwk", im, sfy, precision=Pr),
        jnp.einsum("cxyk,yw->cxwk", re, sfy, precision=Pr)
        + jnp.einsum("cxyk,yw->cxwk", im, cfy, precision=Pr),
    )

    # layout swap: (C, nx/D, ny, kz) → (C, nx, ny/D, kz)
    re = lax.all_to_all(re, axis_name, split_axis=2, concat_axis=1, tiled=True)
    im = lax.all_to_all(im, axis_name, split_axis=2, concat_axis=1, tiled=True)

    nx = block * n_dev
    cfx, sfx = _full_dft_matrices(nx, dtype, -1)
    re, im = (
        jnp.einsum("cxwk,xu->cuwk", re, cfx, precision=Pr)
        - jnp.einsum("cxwk,xu->cuwk", im, sfx, precision=Pr),
        jnp.einsum("cxwk,xu->cuwk", re, sfx, precision=Pr)
        + jnp.einsum("cxwk,xu->cuwk", im, cfx, precision=Pr),
    )
    fold = jnp.asarray(_hermitian_fold_weights(nz), dtype)
    return jnp.sum((re**2 + im**2) * (fold * kfilter_local))


def sharded_md_energy(
    calc,
    device_mesh: Mesh,
    charges: Array,
    cell: Array,
    positions: Array,
    state: ShardedMDState,
    axis: str = "atoms",
) -> Array:
    r"""Total energy :math:`E = \sum_i q_i V_i`, SPMD over ``device_mesh[axis]``.

    Matches ``calc.energy(charges, cell, positions, cell_list=...,
    ns_mesh=state.ns_mesh)`` — the single-chip MD fast path — including all
    gradients (``jax.grad`` w.r.t. positions/charges/cell gives forces,
    charge derivatives, and the stress virial through every collective).
    ``state`` comes from :func:`compute_sharded_md_state`; refresh it like a
    neighbor list (stale states NaN-poison the energy and its gradients).
    """
    n_dev = device_mesh.shape[axis]
    if n_dev != state.n_devices:
        raise ValueError(
            f"state was built for {state.n_devices} devices, mesh axis "
            f"'{axis}' has {n_dev}"
        )
    if charges.shape[0] != state.n_atoms:
        raise ValueError(
            f"state was built for {state.n_atoms} atoms, got {charges.shape[0]}"
        )
    potential = calc.potential
    kfilter = calc._kspace_filter(cell, state.ns_mesh)  # (nx, ny, kz)

    def local(charges, cell, positions, cl_idx, cl_mask, cl_wrap, atom_slot,
              kf_local):
        rank = lax.axis_index(axis)
        cl_idx, cl_mask, cl_wrap = cl_idx[0], cl_mask[0], cl_wrap[0]
        atom_slot = atom_slot[0]

        e_r, valid_r = _slab_window_energy(
            potential, charges, cell, positions, cl_idx, cl_mask, cl_wrap,
            state.n_axis, state.cutoff, rank, axis, n_dev,
        )
        interior, valid_m = _slab_tiled_density(
            charges, cell, positions, atom_slot, state.ns_mesh, state.nodes,
            state.method, rank, axis, n_dev,
        )
        e_k = _dft_quadratic_sharded(interior, kf_local, axis, n_dev)

        # staleness on ANY device corrupts halos globally: poison the local
        # partials (the NaN rides the psum, and — multiplicatively — the VJP)
        flag = jnp.where(valid_r & valid_m, 1.0, jnp.nan).astype(e_r.dtype)
        e_r = lax.psum(e_r * flag, axis)
        e_k = lax.psum(e_k * flag, axis)
        return e_r, e_k

    e_r, e_quad = shard_map(
        local,
        mesh=device_mesh,
        in_specs=(
            P(), P(), P(),
            P(axis), P(axis), P(axis), P(axis),
            P(None, axis, None),
        ),
        out_specs=(P(), P()),
    )(
        charges, cell, positions,
        state.cl_atom_index, state.cl_slot_mask, state.cl_atom_wrap,
        state.tm_atom_of_slot,
        kfilter,
    )

    # k-space corrections, identical to PMECalculator._compute_kspace_energy
    volume = jnp.abs(jnp.linalg.det(cell))
    e_k = e_quad / volume
    e_k = e_k - potential.self_contribution() * jnp.sum(charges**2)
    charge_tot = jnp.sum(charges, axis=0)
    e_k = e_k - 2 * potential.background_correction() * jnp.sum(
        charge_tot**2
    ) / volume
    return e_r + e_k / 2


def sharded_md_energy_rows(
    calc,
    device_mesh: Mesh,
    charges: Array,
    cell: Array,
    pos_rows: Array,
    state: ShardedMDState,
    axis: str = "atoms",
) -> Array:
    r"""The slab-sharded MD step from device-sharded bucket rows.

    Same math as :func:`sharded_md_energy`, but positions live in the slab-row
    layout of :meth:`ShardedMDState.bucket` (``(n_rows, 3)``, leading axis
    sharded over ``device_mesh[axis]``), the production layout for multi-chip
    MD:

    * no replicated O(N) position gather per device — each device reshapes
      its own row block straight into the window grids;
    * no cross-device force reduction — ``jax.grad`` w.r.t. ``pos_rows``
      comes back in the same sharded row layout (the single-chip
      :class:`~torchpme_tpu.md.MDFastPath` argument, applied per slab);
    * the mesh spread gathers its tile tables from the *extended-local* rows
      — the device's own rows plus the right-neighbor first-plane rows that
      the window's halo ``ppermute`` already shipped, so the mesh side adds
      **zero** extra collectives.

    Requires ``state`` built with ``rows=True``.  With ``aligned=True`` the
    mesh side skips the tile tables entirely: the device's rows ARE its tile
    slots, and the fused Pallas spread (:mod:`..ops.pallas.spread_fused`)
    computes stencil weights in VMEM straight from the row block — zero
    mesh-side gathers (float32 state only).  Stale bucketings NaN-poison
    the energy and all gradients, as everywhere else.
    """
    n_dev = device_mesh.shape[axis]
    if n_dev != state.n_devices:
        raise ValueError(
            f"state was built for {state.n_devices} devices, mesh axis "
            f"'{axis}' has {n_dev}"
        )
    if state.tm_slot_rows is None and not state.aligned:
        raise ValueError(
            "sharded_md_energy_rows needs a state built with rows=True"
        )
    if charges.shape[0] != state.n_atoms:
        raise ValueError(
            f"state was built for {state.n_atoms} atoms, got {charges.shape[0]}"
        )
    if pos_rows.shape[0] != state.n_rows:
        raise ValueError(
            f"state has {state.n_rows} slab rows, got {pos_rows.shape[0]}"
        )
    potential = calc.potential
    kfilter = calc._kspace_filter(cell, state.ns_mesh)  # (nx, ny, kz)
    nxc, nyc, nzc = state.n_axis
    plane_cells = nyc * nzc

    def local(charges, cell, rows, cl_idx, cl_mask, cl_wrap, slot_rows,
              kf_local):
        rank = lax.axis_index(axis)
        cl_idx, cl_mask, cl_wrap = cl_idx[0], cl_mask[0], cl_wrap[0]
        slot_rows = slot_rows[0]
        dtype = rows.dtype
        cells_local, cap = cl_mask.shape
        n_channels = charges.shape[1]

        mask_b = cl_mask
        pos_b = rows.reshape(cells_local, cap, 3) - jnp.matmul(
            cl_wrap.astype(dtype), cell, precision="highest"
        )
        q_b = charges.astype(dtype)[cl_idx] * mask_b[..., None].astype(dtype)
        pc_t, q_g, mf_g, centers, valid_r = _slab_grids(
            pos_b, q_b, mask_b, cell, state.n_axis, rank, n_dev
        )
        e_r, pc_ext, q_ext, _mf_ext = _slab_window_from_grids(
            potential, pc_t, q_g, mf_g, cell, state.n_axis, state.cutoff,
            axis, n_dev,
        )

        if state.aligned:
            # tile-aligned: the row block spreads directly (no tile tables,
            # no halo rows — skirts ride the ring fold); mesh staleness is
            # implied by cell-list staleness exactly as on the single chip
            interior = _slab_aligned_density(
                pos_b, q_b, cell, state.ns_mesh, state.nodes, state.method,
                state.n_axis, rank, axis, n_dev,
            )
            e_k = _dft_quadratic_sharded(interior, kf_local, axis, n_dev)
            flag = jnp.where(valid_r, 1.0, jnp.nan).astype(e_r.dtype)
            flag = lax.psum(flag, axis) / n_dev
            return lax.psum(e_r * flag, axis), lax.psum(e_k * flag, axis)

        # mesh side: absolute canonical positions of the extended-local rows,
        # reconstructed from the grids the window halo already shipped
        n_axis_f = jnp.asarray(state.n_axis, dtype=dtype)
        halo_home = ((rank + 1) % n_dev) * cells_local + jnp.arange(
            plane_cells, dtype=jnp.int32
        )
        halo3 = jnp.stack(
            [
                halo_home // (nyc * nzc),
                (halo_home // nzc) % nyc,
                halo_home % nzc,
            ],
            axis=-1,
        ).astype(dtype)
        centers_halo = jnp.matmul(
            (halo3 + 0.5) / n_axis_f, cell, precision="highest"
        )
        centers_ext = jnp.concatenate([centers, centers_halo], axis=0)
        ext_cells = cells_local + plane_cells
        pc_rows = jnp.swapaxes(pc_ext, -1, -2).reshape(ext_cells, cap, 3)
        pos_ext = (pc_rows + centers_ext[:, None, :]).reshape(-1, 3)
        q_ext_rows = q_ext.reshape(-1, n_channels)

        padded_pos = jnp.concatenate(
            [pos_ext, jnp.zeros((1, 3), dtype)], axis=0
        )
        padded_q = jnp.concatenate(
            [q_ext_rows, jnp.zeros((1, n_channels), dtype)], axis=0
        )
        pos_slots = padded_pos[slot_rows]
        q_slots = padded_q[slot_rows]
        empty = slot_rows == ext_cells * cap
        interior, valid_m = _slab_spread_from_slots(
            pos_slots, q_slots, empty, cell, state.ns_mesh, state.nodes,
            state.method, rank, axis, n_dev,
        )
        e_k = _dft_quadratic_sharded(interior, kf_local, axis, n_dev)

        # globalize the staleness flag BEFORE it multiplies the local
        # partials: force cotangents stay sharded on this path (no psum to
        # spread the NaN), so one device's staleness must poison every
        # device's force rows, matching the single-chip contract
        flag = jnp.where(valid_r & valid_m, 1.0, jnp.nan).astype(e_r.dtype)
        flag = lax.psum(flag, axis) / n_dev
        e_r = lax.psum(e_r * flag, axis)
        e_k = lax.psum(e_k * flag, axis)
        return e_r, e_k

    e_r, e_quad = shard_map(
        local,
        mesh=device_mesh,
        in_specs=(
            P(), P(), P(axis),
            P(axis), P(axis), P(axis), P(axis),
            P(None, axis, None),
        ),
        out_specs=(P(), P()),
    )(
        charges, cell, pos_rows,
        state.cl_atom_index, state.cl_slot_mask, state.cl_atom_wrap,
        # aligned states carry no tile tables; the (unused) cell index block
        # stands in so the shard_map signature stays uniform
        state.tm_slot_rows if not state.aligned else state.cl_atom_index,
        kfilter,
    )

    # k-space corrections, identical to PMECalculator._compute_kspace_energy
    volume = jnp.abs(jnp.linalg.det(cell))
    e_k = e_quad / volume
    e_k = e_k - potential.self_contribution() * jnp.sum(charges**2)
    charge_tot = jnp.sum(charges, axis=0)
    e_k = e_k - 2 * potential.background_correction() * jnp.sum(
        charge_tot**2
    ) / volume
    return e_r + e_k / 2
