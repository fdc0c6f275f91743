"""Bucket-order MD state: the production energy/force step without the
per-step bucket gather.

The generic fast path (``Calculator.energy(..., cell_list=…,
tiled_interp=…)``) takes atom-order positions and pays an O(atoms) row
gather into cell-bucket order every step — plus the gather's scatter
transpose in the force pass (together ~2.6 ms at 102k atoms on a v5e,
XLA:TPU row indexing being ~14 ns/row).  GROMACS-style MD loops avoid this
by *storing* the state in cell order and re-sorting only when the neighbor
structure is rebuilt.  :class:`MDFastPath` is that API:

* :meth:`MDFastPath.bucket` converts atom-order positions to the bucket-row
  layout once (at build/rebucket time, like a neighbor-list build);
* :meth:`MDFastPath.energy` consumes bucket rows directly — the real-space
  window reshapes instead of gathering, and its custom-VJP force comes back
  in row layout with no scatter; the k-space tile refresh gathers from the
  rows (same O(tile-slots) cost as before, indices remapped at build);
* integrate in row layout (``rows -= dt · grad``; padded rows get zero
  force), and :meth:`MDFastPath.unbucket` back to atom order whenever
  atom-order output is needed.

Staleness keeps the library-wide contract: once an atom drifts out of its
cell or mesh tile the energy (and every gradient) is NaN — rebuild with
:meth:`MDFastPath.rebucket`, exactly like refreshing a neighbor list.

No reference counterpart (the reference has no MD driver); this is the
TPU-native answer to its per-step ``index_add_`` formulation
(``/root/reference/src/torchpme/calculators/calculator.py:79-84``).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp

from .ops.math import inv3
import numpy as np
from jax import Array

from .ops.mesh_tiled import TiledInterpolation, compute_tiled_interpolation
from .ops.rspace_cells import (
    CellList,
    cell_list_rspace_energy_rows,
    compute_cell_list,
)

__all__ = ["MDFastPath", "MDFastPathDipole", "MDFastPathEwald"]


# Auto-policy for the real-space window engine on TPU, per kernel family
# (v5e, 102k atoms; re-banked 2026-08-19, tools/ab_window_ipl.py /
# profile_window_dipole.py).  Monopole: the XLA roll/matmul window wins for
# EVERY potential family (Coulomb 4.1 vs 5.3 ms, 1/r² 4.4 vs 5.0, 1/r³ 5.3
# vs 5.8, 1/r⁶ 4.5 vs 5.7 — rows value+grad, floor subtracted) now that the
# math tier has closed-form incomplete-gamma kernels, so its fused Pallas
# variant was retired (ops/pallas/window_pallas.py keeps the shared prep +
# the banked table).  Dipole: the fused kernel WINS 16.42 vs 29.52 ms (the
# XLA engine materializes ~26 candidate planes per offset chunk; keeping
# them in VMEM halves the pass) and stays the TPU default.
_WINDOW_AUTO_TPU_DIPOLE = "pallas"


def _resolve_window_impl(
    potential, cutoff: float, window_impl: str, *, dipole: bool = False
) -> str:
    """Resolve the ``window_impl`` argument shared by every fast-path class:
    ``"auto"`` follows the measured per-family TPU policy (monopole: always
    the XLA window; dipole: the fused Pallas kernel when the potential's
    analytic + kernel hooks allow it)."""
    if window_impl == "auto":
        if not dipole:
            return "xla"
        from .ops.pallas.window_dipole_pallas import (
            can_use_pallas_dipole_window as _can_kernel,
        )
        from .ops.rspace_cells_dipole import (
            _can_use_analytic_dipole as _can_analytic,
        )

        return (
            "pallas"
            if (
                _WINDOW_AUTO_TPU_DIPOLE == "pallas"
                and jax.default_backend() == "tpu"
                and _can_analytic(potential)
                and _can_kernel(potential, cutoff)
            )
            else "xla"
        )
    valid = ("xla", "pallas") if dipole else ("xla",)
    if window_impl not in valid:
        raise ValueError(
            f"`window_impl` is {window_impl!r} but must be 'auto' or one of "
            f"{valid} (the monopole Pallas window was retired — it lost the "
            "hardware A/B for every potential family; see "
            "ops/pallas/window_pallas.py)"
        )
    return window_impl


def _extras_tile_table(positions, cell, clist, ns_mesh, nodes, method):
    """Tile bucketing of the spill side-list rows (host, eager).

    The aligned MD state spreads its cell rows as mesh-tile slots; the spill
    extras are not tile slots, and the generic scatter fallback costs ~2 ms
    per step at ~1k extras on a v5e (XLA scatter serializes on TPU).  This
    builds a small extras-only :class:`TiledInterpolation` over the
    side-list row layout (``pos_rows[nb:]``), so the per-step extras spread
    is a weight refresh + tile GEMM.

    Padded side-list slots are parked along the cell diagonal for the
    bucketing (so no tile overflows on them) and then marked EMPTY —
    ``atom_of_slot`` sentinel, trash ``slot_of_atom`` — which exempts them
    from the refresh staleness check and zeroes their weights, exactly like
    unoccupied tile slots.
    """
    e_idx = np.asarray(clist.extra_index)
    e_msk = np.asarray(clist.extra_mask)
    e_pad = int(e_idx.shape[0])
    pos = np.asarray(positions)
    cell_np = np.asarray(cell)
    frac = ((np.arange(e_pad) + 0.5) / e_pad).astype(pos.dtype)
    parked = frac[:, None] * cell_np.sum(axis=0)[None, :]
    ext_pos = np.where(e_msk[:, None], pos[e_idx], parked)

    interp = compute_tiled_interpolation(
        jnp.asarray(ext_pos),
        inv3(jnp.asarray(cell)),
        ns_mesh,
        nodes,
        method,
    )
    if int(interp.dropped):
        raise ValueError(
            f"{int(interp.dropped)} spill extras exceeded the extras tile "
            "capacity (unexpected: the auto capacity counts exact occupancy)"
        )
    n_tiles, capacity = interp.local_x.shape
    aos = np.asarray(interp.atom_of_slot)
    # slots holding parked padding become empty (sentinel = e_pad)
    phantom = np.concatenate([~e_msk, [True]])[np.minimum(aos, e_pad)]
    aos = np.where(phantom, e_pad, aos).astype(np.int32)
    soa = np.asarray(interp.slot_of_atom)
    soa = np.where(e_msk, soa, n_tiles * capacity).astype(np.int32)
    weights = np.asarray(interp.weights).copy()
    weights[phantom] = 0.0
    return replace(
        interp,
        atom_of_slot=jnp.asarray(aos),
        slot_of_atom=jnp.asarray(soa),
        weights=jnp.asarray(weights),
    )


def _row_mapping(clist: CellList, n_atoms: int) -> tuple[np.ndarray, int]:
    """Bucket-row id of every atom (spill extras appended after the cell
    rows), host-side."""
    n_cells, cap = clist.slot_mask.shape
    row_of_atom = np.zeros(n_atoms, dtype=np.int32)
    idx = np.asarray(clist.atom_index)
    msk = np.asarray(clist.slot_mask)
    rows = np.arange(n_cells * cap, dtype=np.int32).reshape(n_cells, cap)
    row_of_atom[idx[msk]] = rows[msk]
    n_rows = n_cells * cap
    if clist.extra_index is not None:
        e_idx = np.asarray(clist.extra_index)
        e_msk = np.asarray(clist.extra_mask)
        row_of_atom[e_idx[e_msk]] = n_rows + np.nonzero(e_msk)[0].astype(
            np.int32
        )
        n_rows += e_idx.shape[0]
    return row_of_atom, n_rows


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MDFastPath:
    """A mesh calculator bound to reusable bucketings, in bucket-row layout.

    Build with :meth:`create` (host-side, eager — like a neighbor-list
    build); the instance is a pytree, so it closes over ``jit`` cleanly.

    Example
    -------
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> import torchpme_tpu as tpme
    >>> rng = np.random.default_rng(0)
    >>> positions = jnp.asarray(rng.uniform(0, 8.0, (100, 3)))
    >>> charges = jnp.asarray(np.tile([1.0, -1.0], 50).reshape(-1, 1))
    >>> cell = jnp.eye(3) * 8.0
    >>> calc = tpme.PMECalculator(
    ...     tpme.CoulombPotential(smearing=0.5), interpolation_nodes=4
    ... )
    >>> fp = tpme.MDFastPath.create(
    ...     calc, positions, cell, cutoff=1.0, ns_mesh=(32, 32, 32)
    ... )
    >>> rows = fp.bucket(positions)
    >>> e, forces = jax.value_and_grad(fp.energy, argnums=2)(
    ...     charges, cell, rows
    ... )
    >>> clist = tpme.ops.compute_cell_list(positions, cell, 1.0)
    >>> e_ref = calc.energy(charges, cell, positions, cell_list=clist,
    ...                     ns_mesh=(32, 32, 32))
    >>> print(bool(jnp.allclose(e, e_ref, rtol=1e-10)))
    True
    """

    calc: object  # PMECalculator / P3MCalculator (pytree dataclass)
    clist: CellList
    tiled: TiledInterpolation | None  # atom_of_slot remapped to bucket-row ids
    row_of_atom: Array  # (N,) int32
    ns_mesh: tuple[int, int, int] = field(metadata=dict(static=True))
    n_rows: int = field(metadata=dict(static=True))
    n_atoms: int = field(metadata=dict(static=True))
    #: "tiled" (XLA tile-GEMM), "fused" (single-kernel Pallas spread), or
    #: "aligned" (fused kernels + the cell grid pinned to the mesh-tile grid:
    #: bucket rows double as tile slots, zero per-step mesh gathers)
    mesh_impl: str = field(metadata=dict(static=True), default="tiled")
    #: (nx_c, ny_c, nz_c, cap) of the aligned cell list ("aligned" only)
    cell_grid: tuple[int, int, int, int] | None = field(
        metadata=dict(static=True), default=None
    )
    #: "xla" (roll/matmul window) or "pallas" (fused VMEM pair kernel) for
    #: the real-space engine; see ops.rspace_cells._window_spec
    window_impl: str = field(metadata=dict(static=True), default="xla")
    #: extras-only tile bucketing ("aligned" + spill only): spreads the
    #: side-list atoms by refresh + tile GEMM instead of the per-step XLA
    #: scatter (measured ~2 ms at 932 extras on a v5e)
    extras_tiled: TiledInterpolation | None = None
    #: extra mesh cells on each side of the aligned spread window: the
    #: overflow-balanced cell list assigns atoms up to the balance slack
    #: outside their tile, so stencils reach correspondingly further
    aligned_pad: int = field(metadata=dict(static=True), default=0)

    @classmethod
    def create(
        cls,
        calc,
        positions,
        cell,
        cutoff: float,
        ns_mesh=None,
        cell_capacity: int | None = None,
        tile_capacity: int | None = None,
        mesh_impl: str = "auto",
        window_impl: str = "auto",
        extras_impl: str = "auto",
        balance: str | bool = "auto",
        _spill: bool | None = None,
    ) -> "MDFastPath":
        """Bucket ``positions`` for ``calc`` (host-side, eager).

        :param calc: a mesh calculator (PME/P3M) with a range-separated
            potential.
        :param cutoff: real-space cutoff for the cell list.
        :param ns_mesh: static mesh shape (``calc.get_ns_mesh(cell)`` when
            omitted).
        :param mesh_impl: ``"tiled"`` (XLA tile-GEMM), ``"fused"`` (the
            single-kernel Pallas spread of
            :mod:`torchpme_tpu.ops.pallas.spread_fused`; float32 state), or
            ``"aligned"`` (fused kernels with the cell-list x/y grid pinned
            to the mesh-tile grid — bucket rows double as mesh-tile slots,
            so the step pays no mesh gather/scatter at all).  ``"auto"``
            picks, on TPU, "aligned" for large systems when the geometry
            allows (one mesh tile ≥ the cutoff per x/y cell, ≥32768 atoms
            — the measured crossover), else "fused"; on other backends
            "tiled".
        :param window_impl: real-space window engine.  The monopole window
            has one engine, ``"xla"`` (the roll/matmul window; ``"auto"``
            resolves to it — its retired Pallas variant lost the hardware
            A/B for every potential family, see
            :mod:`torchpme_tpu.ops.pallas.window_pallas`).
        :param extras_impl: mesh spread of the spill side list in aligned
            mode: ``"scatter"`` (generic per-step scatter), ``"tiled"``
            (extras-only tile table: refresh + GEMM), or ``"auto"``
            (tiled from ~512 extras up — the measured v5e crossover
            between the scatter's per-extra cost and the table's fixed
            refresh cost).
        :param balance: overflow-balance the aligned cell list
            (``compute_cell_list(balance=…)``): overfull cells shed atoms
            within the per-axis slack ``(edge − cutoff)/2`` into neighbors
            with room, so the capacity can sit near the mean occupancy
            instead of covering the Poisson tail — at 102k atoms on a v5e
            this cuts the window work from cap 32 to cap 24 (73M → 41M
            candidate slots).  ``"auto"`` enables it in aligned mode when
            the wider spread window fits the 2-tile fold (it always does
            for nodes ≤ 5 when the slack is under one mesh cell per tile).
        """
        from .ops.mesh_tiled import supports_tiling

        if ns_mesh is None:
            ns_mesh = calc.get_ns_mesh(cell)
        ns_mesh = tuple(int(n) for n in ns_mesh)
        if not supports_tiling(ns_mesh, calc.interpolation_nodes):
            raise ValueError(
                f"MDFastPath needs the tiled mesh backend: mesh {ns_mesh} / "
                f"{calc.interpolation_nodes} nodes does not tile (nx, ny must "
                "be multiples of 16)"
            )
        if mesh_impl == "auto":
            import jax as _jax

            if _jax.default_backend() != "tpu":
                mesh_impl = "tiled"  # Pallas would run in interpret mode
            elif (
                cls._aligned_supported(cell, cutoff, ns_mesh)
                and np.asarray(positions).shape[0] >= 32768
            ):
                # measured crossover (v5e): the aligned mesh saving scales
                # with the row count while the coarser-cell real-space
                # penalty does not — 12k atoms: tiled 3.8 / aligned 5.6 ms;
                # 65k: tiled 9.9 / aligned 7.7 ms
                mesh_impl = "aligned"
            else:
                # fused beats tiled by a small, consistent margin at every
                # measured size (3.6 vs 3.8 ms at 12k, 9.6 vs 9.9 at 65k,
                # 13.5 vs 13.6 at 102k); falls back to the XLA refresh
                # path automatically for non-f32 state
                mesh_impl = "fused"
        if mesh_impl not in ("tiled", "fused", "aligned"):
            raise ValueError(
                f"`mesh_impl` is {mesh_impl!r} but must be 'auto', 'tiled', "
                "'fused' or 'aligned'"
            )
        window_impl = _resolve_window_impl(calc.potential, cutoff, window_impl)
        if (
            mesh_impl == "fused"
            and tile_capacity is not None
            and tile_capacity % 8
        ):
            raise ValueError(
                f"the fused Pallas spread needs a sublane-aligned tile "
                f"capacity (multiple of 8), got tile_capacity={tile_capacity}"
            )
        # the rows layout is consumed by the tile refresh: pin the backend so
        # an auto-resolved scatter path can never see row-layout positions
        calc = replace(
            calc,
            mesh_backend="fused" if mesh_impl == "aligned" else mesh_impl,
        )
        if balance not in ("auto", True, False):
            raise ValueError(
                f"`balance` is {balance!r} but must be 'auto', True or False"
            )
        aligned_pad = 0
        if mesh_impl == "aligned":
            if not cls._aligned_supported(cell, cutoff, ns_mesh):
                raise ValueError(
                    "aligned MD state needs one mesh tile (8 mesh cells) per "
                    "x/y cell-list cell with edge >= cutoff; this cell/mesh/"
                    "cutoff combination does not allow it (use mesh_impl="
                    "'tiled' or 'fused')"
                )
            from .ops.mesh_tiled import TILE
            from .ops.pallas.spread_fused import aligned_geometry

            # overflow balance: x/y slack capped so the widened spread
            # window still fits the 2-tile fold; z slack is unconstrained
            # on the mesh side (z stencil starts are unwindowed)
            base_extent, _ = aligned_geometry(calc.interpolation_nodes)
            pad_budget = (2 * TILE - base_extent) // 2
            cell_np = np.asarray(cell, np.float64)
            plane = 1.0 / np.linalg.norm(np.linalg.inv(cell_np), axis=0)
            h_mesh = plane[:2] / np.asarray(ns_mesh[:2], np.float64)
            use_balance = balance is True or (
                balance == "auto" and pad_budget >= 1
            )
            bal_arg = (
                (
                    pad_budget * float(h_mesh[0]),
                    pad_budget * float(h_mesh[1]),
                    np.inf,
                )
                if use_balance
                else False
            )
            clist = compute_cell_list(
                positions, cell, cutoff, capacity=cell_capacity, spill=_spill,
                xy_cells=(ns_mesh[0] // TILE, ns_mesh[1] // TILE),
                balance=bal_arg,
            )
            # slack is stored in cell-edge units; one x/y cell is exactly
            # TILE mesh cells, so the window widens by ceil(slack · TILE)
            aligned_pad = int(np.ceil(max(clist.slack[:2]) * TILE - 1e-9))
            assert aligned_pad <= pad_budget
        else:
            clist = compute_cell_list(
                positions, cell, cutoff, capacity=cell_capacity, spill=_spill,
                balance=balance is True,
            )
        n_cells, cap = clist.slot_mask.shape
        n_atoms = int(np.asarray(positions).shape[0])
        row_of_atom, n_rows = _row_mapping(clist, n_atoms)

        if extras_impl not in ("auto", "tiled", "scatter"):
            raise ValueError(
                f"`extras_impl` is {extras_impl!r} but must be 'auto', "
                "'tiled' or 'scatter'"
            )
        if mesh_impl == "aligned":
            # no tile bucketing at all: cell rows ARE the tile slots.  A
            # LARGE spill side list gets its own small tile table so its
            # mesh spread is a refresh + tile GEMM instead of a per-step
            # scatter (v5e, 131k box, 932 extras: saves ~2.1 ms/step); below
            # ~512 extras the scatter is cheaper than the table's fixed
            # refresh+VJP cost (~1 ms), so "auto" keeps it.
            tiled = None
            cell_grid = (*clist.n_axis, cap)
            n_extras_real = (
                int(np.asarray(clist.extra_mask).sum())
                if clist.extra_mask is not None
                else 0
            )
            use_extras_tiled = extras_impl == "tiled" or (
                extras_impl == "auto" and n_extras_real >= 512
            )
            extras_tiled = (
                _extras_tile_table(
                    positions, cell, clist, ns_mesh,
                    calc.interpolation_nodes, calc._method,
                )
                if clist.extra_index is not None and use_extras_tiled
                else None
            )
        else:
            cell_grid = None
            extras_tiled = None
            tiled = compute_tiled_interpolation(
                jnp.asarray(positions),
                inv3(jnp.asarray(cell)),
                ns_mesh,
                calc.interpolation_nodes,
                calc._method,
                capacity=tile_capacity,
            )
            if int(tiled.dropped):
                raise ValueError(
                    f"{int(tiled.dropped)} atoms exceeded the tile capacity; "
                    "pass a larger `tile_capacity`"
                )
            # remap tile slots from atom ids to bucket-row ids (sentinel: n_rows)
            slots = np.asarray(tiled.atom_of_slot)
            remapped = np.where(
                slots == n_atoms, n_rows, row_of_atom[np.minimum(slots, n_atoms - 1)]
            ).astype(np.int32)
            tiled = replace(tiled, atom_of_slot=jnp.asarray(remapped))

        return cls(
            calc=calc,
            clist=clist,
            tiled=tiled,
            row_of_atom=jnp.asarray(row_of_atom),
            ns_mesh=ns_mesh,
            n_rows=n_rows,
            n_atoms=n_atoms,
            mesh_impl=mesh_impl,
            cell_grid=cell_grid,
            window_impl=window_impl,
            extras_tiled=extras_tiled,
            aligned_pad=aligned_pad,
        )

    @staticmethod
    def _aligned_supported(cell, cutoff: float, ns_mesh) -> bool:
        """One mesh tile (8 mesh cells) per x/y cell must keep the cell-plane
        distance ≥ cutoff, and the cutoff must fit the cell at all."""
        from .ops.mesh_tiled import TILE

        cell_np = np.asarray(cell, np.float64)
        inv = np.linalg.inv(cell_np)
        plane = 1.0 / np.linalg.norm(inv, axis=0)
        max_cells = np.floor(plane / cutoff)
        want = (ns_mesh[0] // TILE, ns_mesh[1] // TILE)
        return bool(
            np.all(plane >= cutoff)
            and max_cells[0] >= want[0]
            and max_cells[1] >= want[1]
        )

    # -- layout conversion (one-time, at build/rebucket boundaries) ----------

    def bucket(self, positions: Array) -> Array:
        """Atom-order ``(N, 3)`` → bucket rows ``(n_rows, 3)`` (one gather)."""
        n_cells, cap = self.clist.slot_mask.shape
        rows = jnp.zeros((self.n_rows, 3), jnp.asarray(positions).dtype)
        rows = rows.at[self.row_of_atom].set(positions)
        return rows

    def unbucket(self, pos_rows: Array) -> Array:
        """Bucket rows back to atom order (one gather)."""
        return pos_rows[self.row_of_atom]

    def rebucket(self, pos_rows: Array, cell: Array, cutoff=None) -> "MDFastPath":
        """Rebuild the bucketings from drifted rows (like a NL refresh).

        Reuses the existing cell and tile capacities so the row/slot shapes
        stay stable across refreshes and the compiled step is reused (the
        extras side list is already padded generously for the same reason).
        """
        positions = self.unbucket(pos_rows)
        return type(self).create(
            self.calc,
            positions,
            cell,
            cutoff if cutoff is not None else self.clist.cutoff,
            ns_mesh=self.ns_mesh,
            cell_capacity=self.clist.slot_mask.shape[1],
            tile_capacity=(
                None if self.tiled is None else self.tiled.local_x.shape[1]
            ),
            mesh_impl=self.mesh_impl,
            window_impl=self.window_impl,
            balance=max(self.clist.slack) > 0.0,
            _spill=self.clist.extra_index is not None,
        )

    # -- the step ------------------------------------------------------------

    def energy(self, charges: Array, cell: Array, pos_rows: Array) -> Array:
        r"""Total energy :math:`\sum_i q_i V_i` from bucket rows.

        Matches ``calc.energy(charges, cell, positions, cell_list=…,
        ns_mesh=…, tiled_interp=…)`` exactly (same math, row layout);
        ``jax.grad`` w.r.t. ``pos_rows`` gives minus the forces in row
        layout with no bucket scatter.  NaN when the bucketing is stale.
        """
        e_sr = cell_list_rspace_energy_rows(
            self.calc.potential,
            charges,
            pos_rows,
            cell,
            self.clist,
            window_impl=self.window_impl,
        )
        if self.mesh_impl == "aligned":
            from .ops.pallas.spread_fused import aligned_tiled_density

            dtype = pos_rows.dtype
            # charges into row layout (position-independent: XLA hoists this
            # out of an MD loop whose charges are constant)
            q_rows = jnp.zeros((self.n_rows, charges.shape[-1]), dtype).at[
                self.row_of_atom
            ].set(charges.astype(dtype))
            rho = aligned_tiled_density(
                pos_rows,
                q_rows,
                inv3(cell),
                self.ns_mesh,
                self.calc.interpolation_nodes,
                self.calc._method,
                self.cell_grid,
                extras_interp=self.extras_tiled,
                pad_cells=self.aligned_pad,
            )
            # mesh staleness is implied by cell-list staleness (an atom in
            # its cell keeps its stencil in the tile window), which already
            # NaN-poisons e_sr
            e_k = self.calc._kspace_energy_from_rho(
                rho, cell, charges, pos_rows, None, self.ns_mesh
            )
        else:
            e_k = self.calc._compute_kspace_energy(
                charges,
                cell,
                pos_rows,  # consumed only by the tile refresh (row-id slots)
                ns_mesh=self.ns_mesh,
                tiled_interp=self.tiled,
            )
        return e_sr + e_k


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MDFastPathDipole:
    """Bucket-order MD state for dipolar systems — the dipolar counterpart
    of :class:`MDFastPath`.

    The real-space sum runs through the dipolar cell-list window engine in
    row layout (:func:`~torchpme_tpu.ops.rspace_cells_dipole.cell_list_rspace_dipole_energy_rows`,
    no per-step gather or force scatter); the Ewald k-space term consumes
    the rows directly — every term is dipole-weighted, so padded rows (with
    :math:`\\vec\\mu = 0`) contribute nothing.  No reference counterpart:
    the reference dipolar calculator is pair-list only
    (``/root/reference/src/torchpme/calculators/calculator_dipole.py``).

    Example
    -------
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> import torchpme_tpu as tpme
    >>> rng = np.random.default_rng(0)
    >>> positions = jnp.asarray(rng.uniform(0, 8.0, (60, 3)))
    >>> dipoles = jnp.asarray(rng.normal(size=(60, 3)))
    >>> cell = jnp.eye(3) * 8.0
    >>> calc = tpme.CalculatorDipole(
    ...     tpme.PotentialDipole(smearing=1.0), lr_wavelength=2.0
    ... )
    >>> fp = tpme.MDFastPathDipole.create(calc, positions, cell, cutoff=2.5)
    >>> rows = fp.bucket(positions)
    >>> e, forces = jax.value_and_grad(fp.energy, argnums=2)(
    ...     dipoles, cell, rows
    ... )
    >>> clist = tpme.ops.compute_cell_list(
    ...     positions, cell, 2.5, capacity=fp.clist.slot_mask.shape[1],
    ...     spill=False,
    ... )
    >>> e_ref = calc.energy(dipoles, cell, positions, cell_list=clist,
    ...                     ns_kvectors=fp.ns_kvectors)
    >>> print(bool(jnp.allclose(e, e_ref, rtol=1e-10)))
    True
    """

    calc: object  # CalculatorDipole (pytree dataclass)
    clist: CellList
    row_of_atom: Array  # (N,) int32
    ns_kvectors: tuple[int, int, int] | None = field(
        metadata=dict(static=True)
    )
    n_rows: int = field(metadata=dict(static=True))
    n_atoms: int = field(metadata=dict(static=True))
    window_impl: str = field(metadata=dict(static=True), default="xla")
    # tile bucketing (derivative stencils) for PMECalculatorDipole's tiled
    # mesh backend; atom_of_slot remapped to bucket-row ids, refreshed
    # per step like the monopole fast path's.  None for Ewald/scatter.
    tiled: TiledInterpolation | None = None

    @classmethod
    def create(
        cls,
        calc,
        positions,
        cell,
        cutoff: float,
        cell_capacity: int | None = None,
        window_impl: str = "auto",
        _spill: bool | None = None,
    ) -> "MDFastPathDipole":
        """Bucket ``positions`` for the dipolar ``calc`` (host-side, eager).

        Like :meth:`MDFastPath.create`, the cell list uses a tight capacity
        with the overflow spill side list by default (``_spill``), so
        inhomogeneous systems need no manual capacity tuning; extras ride
        as tail rows.

        :param window_impl: real-space window engine — ``"xla"`` (the
            roll/einsum dipolar window), ``"pallas"`` (the fused VMEM
            kernel, :mod:`torchpme_tpu.ops.pallas.window_dipole_pallas`;
            needs a kernel-ready ``window_scalar_math``), or ``"auto"``
            (the measured-winner policy, shared with :class:`MDFastPath`).
        """
        window_impl = _resolve_window_impl(
            calc.potential, cutoff, window_impl, dipole=True
        )
        clist = compute_cell_list(
            positions, cell, cutoff, capacity=cell_capacity, spill=_spill
        )
        n_atoms = int(np.asarray(positions).shape[0])
        row_of_atom, n_rows = _row_mapping(clist, n_atoms)
        ns_k = (
            calc.get_ns_kvectors(cell)
            if calc.potential.smearing is not None
            else None
        )
        tiled = None
        use_tiled = getattr(calc, "_use_tiled", None)
        if ns_k is not None and use_tiled is not None and use_tiled(ns_k):
            tiled = compute_tiled_interpolation(
                jnp.asarray(positions),
                inv3(jnp.asarray(cell)),
                ns_k,
                calc.interpolation_nodes,
                calc._method,
                derivatives=True,
            )
            if int(tiled.dropped):
                raise ValueError(
                    f"{int(tiled.dropped)} atoms exceeded the tile capacity; "
                    "pass mesh_backend='scatter' or a larger tile_capacity"
                )
            # remap tile slots from atom ids to bucket-row ids (as MDFastPath)
            slots = np.asarray(tiled.atom_of_slot)
            remapped = np.where(
                slots == n_atoms,
                n_rows,
                row_of_atom[np.minimum(slots, n_atoms - 1)],
            ).astype(np.int32)
            tiled = replace(tiled, atom_of_slot=jnp.asarray(remapped))
        return cls(
            calc=calc,
            clist=clist,
            row_of_atom=jnp.asarray(row_of_atom),
            ns_kvectors=ns_k,
            n_rows=n_rows,
            n_atoms=n_atoms,
            window_impl=window_impl,
            tiled=tiled,
        )

    def bucket(self, positions: Array) -> Array:
        """Atom-order ``(N, 3)`` → bucket rows ``(n_rows, 3)`` (one gather)."""
        rows = jnp.zeros((self.n_rows, 3), jnp.asarray(positions).dtype)
        return rows.at[self.row_of_atom].set(positions)

    def unbucket(self, rows: Array) -> Array:
        """Bucket rows back to atom order (one gather)."""
        return rows[self.row_of_atom]

    def rebucket(self, pos_rows: Array, cell: Array, cutoff=None) -> "MDFastPathDipole":
        """Rebuild the bucketing from drifted rows (like a NL refresh)."""
        positions = self.unbucket(pos_rows)
        return type(self).create(
            self.calc,
            positions,
            cell,
            cutoff if cutoff is not None else self.clist.cutoff,
            cell_capacity=self.clist.slot_mask.shape[1],
            window_impl=self.window_impl,
            _spill=self.clist.extra_index is not None,
        )

    def energy(self, dipoles: Array, cell: Array, pos_rows: Array) -> Array:
        r"""Total dipolar energy :math:`\sum_i \vec V_i\cdot\vec\mu_i` from
        bucket rows; ``jax.grad`` w.r.t. ``pos_rows`` gives minus the forces
        in row layout, w.r.t. ``dipoles`` the fields.  NaN when stale."""
        from .ops.rspace_cells_dipole import (
            cell_list_rspace_dipole_energy_rows,
        )

        e_sr = cell_list_rspace_dipole_energy_rows(
            self.calc.potential, dipoles, pos_rows, cell, self.clist,
            window_impl=self.window_impl,
        )
        if self.calc.potential.smearing is None:
            return e_sr
        dtype = pos_rows.dtype
        if self.tiled is not None:
            # tiled dipolar mesh with bucket reuse: dipoles stay atom-order
            # (the tile slots map atoms), pos_rows feed only the per-step
            # weight refresh (row-id slots, exactly like MDFastPath).  The
            # Parseval quadratic form skips the inverse DFT AND the
            # mesh→points gather of the field formulation.
            e_k = self.calc._compute_kspace_energy(
                dipoles.astype(dtype),
                cell,
                pos_rows,
                ns_kvectors=self.ns_kvectors,
                tiled_interp=self.tiled,
            )
            return e_sr + e_k
        # dipole rows (position-independent: hoisted out of MD loops whose
        # dipoles are constant); padded rows get mu = 0 and drop out of
        # every k-space term
        mu_rows = jnp.zeros((self.n_rows, 3), dtype).at[
            self.row_of_atom
        ].set(dipoles.astype(dtype))
        e_k = self.calc._compute_kspace_energy(
            mu_rows, cell, pos_rows, ns_kvectors=self.ns_kvectors
        )
        return e_sr + e_k


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MDFastPathEwald:
    r"""Bucket-order MD state for the explicit-k-sum Ewald calculator —
    the :math:`O(N^2)` counterpart of :class:`MDFastPath` for the small/
    medium systems where Ewald beats the mesh methods.

    The real-space sum runs through the monopole cell-list window engine in
    row layout (no per-step gather or force scatter); the k-space term is
    the structure-factor quadratic form
    :math:`\tfrac1V\sum_k \hat v(k)\,|S(k)|^2`
    (:meth:`EwaldCalculator._compute_kspace_energy`) evaluated directly on
    the rows — every term is charge-weighted, so padded rows (with
    :math:`q = 0`) contribute nothing to the energy or any gradient.
    Unlike the mesh fast path there is no interpolation-tile state: only
    the real-space window NaN-poisons on stale rows.  No reference
    counterpart (the reference has no MD driver; its Ewald path is
    ``/root/reference/src/torchpme/calculators/ewald.py``).

    Example
    -------
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> import torchpme_tpu as tpme
    >>> rng = np.random.default_rng(0)
    >>> positions = jnp.asarray(rng.uniform(0, 8.0, (100, 3)))
    >>> charges = jnp.asarray(np.tile([1.0, -1.0], 50).reshape(-1, 1))
    >>> cell = jnp.eye(3) * 8.0
    >>> calc = tpme.EwaldCalculator(
    ...     tpme.CoulombPotential(smearing=1.0), lr_wavelength=2.0
    ... )
    >>> fp = tpme.MDFastPathEwald.create(calc, positions, cell, cutoff=2.5)
    >>> rows = fp.bucket(positions)
    >>> e, forces = jax.value_and_grad(fp.energy, argnums=2)(
    ...     charges, cell, rows
    ... )
    >>> clist = tpme.ops.compute_cell_list(
    ...     positions, cell, 2.5, capacity=fp.clist.slot_mask.shape[1],
    ...     spill=False,
    ... )
    >>> e_ref = calc.energy(charges, cell, positions, cell_list=clist,
    ...                     ns_kvectors=fp.ns_kvectors)
    >>> print(bool(jnp.allclose(e, e_ref, rtol=1e-10)))
    True
    """

    calc: object  # EwaldCalculator (pytree dataclass)
    clist: CellList
    row_of_atom: Array  # (N,) int32
    ns_kvectors: tuple[int, int, int] = field(metadata=dict(static=True))
    n_rows: int = field(metadata=dict(static=True))
    n_atoms: int = field(metadata=dict(static=True))
    window_impl: str = field(metadata=dict(static=True), default="xla")

    @classmethod
    def create(
        cls,
        calc,
        positions,
        cell,
        cutoff: float,
        cell_capacity: int | None = None,
        window_impl: str = "auto",
        _spill: bool | None = None,
    ) -> "MDFastPathEwald":
        """Bucket ``positions`` for the Ewald ``calc`` (host-side, eager).

        Same contract as :meth:`MDFastPath.create` minus the mesh arguments:
        the k-space extents come from ``calc.get_ns_kvectors(cell)`` so the
        k-vectors are rebuilt from the traced cell inside the step (exact
        stress under ``jit``).
        """
        if not hasattr(calc, "get_ns_kvectors"):
            raise ValueError(
                "MDFastPathEwald needs an EwaldCalculator (mesh calculators "
                "use MDFastPath)"
            )
        window_impl = _resolve_window_impl(calc.potential, cutoff, window_impl)
        clist = compute_cell_list(
            positions, cell, cutoff, capacity=cell_capacity, spill=_spill
        )
        n_atoms = int(np.asarray(positions).shape[0])
        row_of_atom, n_rows = _row_mapping(clist, n_atoms)
        return cls(
            calc=calc,
            clist=clist,
            row_of_atom=jnp.asarray(row_of_atom),
            ns_kvectors=calc.get_ns_kvectors(cell),
            n_rows=n_rows,
            n_atoms=n_atoms,
            window_impl=window_impl,
        )

    def bucket(self, positions: Array) -> Array:
        """Atom-order ``(N, 3)`` → bucket rows ``(n_rows, 3)`` (one gather)."""
        rows = jnp.zeros((self.n_rows, 3), jnp.asarray(positions).dtype)
        return rows.at[self.row_of_atom].set(positions)

    def unbucket(self, rows: Array) -> Array:
        """Bucket rows back to atom order (one gather)."""
        return rows[self.row_of_atom]

    def rebucket(self, pos_rows: Array, cell: Array, cutoff=None) -> "MDFastPathEwald":
        """Rebuild the bucketing from drifted rows (like a NL refresh)."""
        positions = self.unbucket(pos_rows)
        return type(self).create(
            self.calc,
            positions,
            cell,
            cutoff if cutoff is not None else self.clist.cutoff,
            cell_capacity=self.clist.slot_mask.shape[1],
            window_impl=self.window_impl,
            _spill=self.clist.extra_index is not None,
        )

    def energy(self, charges: Array, cell: Array, pos_rows: Array) -> Array:
        r"""Total energy :math:`\sum_i q_i V_i` from bucket rows; ``jax.grad``
        w.r.t. ``pos_rows`` gives minus the forces in row layout with no
        bucket scatter.  NaN when the cell-list bucketing is stale."""
        e_sr = cell_list_rspace_energy_rows(
            self.calc.potential,
            charges,
            pos_rows,
            cell,
            self.clist,
            window_impl=self.window_impl,
        )
        dtype = pos_rows.dtype
        # charge rows (position-independent: hoisted out of MD loops whose
        # charges are constant); padded rows get q = 0 and drop out of every
        # k-space term, including the structure factor and its gradients
        q_rows = jnp.zeros((self.n_rows, charges.shape[-1]), dtype).at[
            self.row_of_atom
        ].set(charges.astype(dtype))
        e_k = self.calc._compute_kspace_energy(
            q_rows, cell, pos_rows, ns_kvectors=self.ns_kvectors
        )
        return e_sr + e_k
