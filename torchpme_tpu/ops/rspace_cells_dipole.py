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
Gradients flow by plain autodiff (the window is roll/einsum/reduce only).

No reference counterpart: the reference's dipolar calculator is pair-list
only (``/root/reference/src/torchpme/calculators/calculator_dipole.py``);
this is the TPU cell-list fast path applied to it.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from .rspace_cells import (
    CellList,
    _chunk_geometry,
    _prepare,
)

__all__ = [
    "cell_list_rspace_dipole_energy",
    "cell_list_rspace_dipole_energy_rows",
]


def cell_list_rspace_dipole_energy(
    potential, dipoles: Array, positions: Array, cell: Array, clist: CellList
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
    """
    _reject_spill(clist)
    pc_t, mu_g, mf_g, offs, valid, chunks = _prepare(
        dipoles, positions, cell, clist
    )
    return _dipole_window_energy(
        potential, pc_t, mu_g, mf_g, offs, valid, chunks, clist
    )


def cell_list_rspace_dipole_energy_rows(
    potential, dipoles: Array, pos_rows: Array, cell: Array, clist: CellList
) -> Array:
    r"""Dipolar window energy from positions in bucket-ROW order — the
    dipolar counterpart of
    :func:`~torchpme_tpu.ops.rspace_cells.cell_list_rspace_energy_rows`:
    no O(atoms) gather in the step, force gradient returned in row layout
    with no scatter.  Values and gradients equal
    :func:`cell_list_rspace_dipole_energy` up to the row permutation.
    """
    _reject_spill(clist)
    from .rspace_cells import _prepare_bucketed

    n_cells, cap = clist.slot_mask.shape
    dtype = pos_rows.dtype
    pc_t, mu_g, mf_g, offs, valid, chunks = _prepare_bucketed(
        dipoles.astype(dtype)[clist.atom_index],
        pos_rows[: n_cells * cap].reshape(n_cells, cap, 3),
        cell,
        clist,
    )
    return _dipole_window_energy(
        potential, pc_t, mu_g, mf_g, offs, valid, chunks, clist
    )


def _reject_spill(clist: CellList) -> None:
    if clist.extra_index is not None:
        raise ValueError(
            "The dipolar cell-list energy does not support the overflow "
            "side list yet; rebuild the cell list with an explicit "
            "`capacity` (spill=False)"
        )


def _dipole_window_energy(
    potential, pc_t, mu_g, mf_g, offs, valid, chunks, clist
) -> Array:
    if potential.smearing is None:
        scalars = potential.scalar_kernels
    else:
        scalars = potential.sr_scalar_kernels
    dtype = pc_t.dtype
    cutoff_sq = jnp.asarray(float(clist.cutoff), dtype) ** 2

    e = jnp.zeros((), dtype)
    k0 = 0
    for chunk in chunks:
        pj, muj, pair_ok, d = _chunk_geometry(
            chunk, k0, pc_t, mu_g, mf_g, offs, cutoff_sq, scale_self=True
        )
        okf = pair_ok.astype(dtype)
        b, c = scalars(d)
        # μi·μj — like the scalar engine's charge outer product
        mumu = jnp.einsum(
            "...ic,...jc->...ij", mu_g, muj, precision="highest"
        )
        # μ·r_ij = μ·p_j − μ·p_i, assembled from the i/j position blocks
        mur_i = jnp.einsum(
            "...ic,...cj->...ij", mu_g, pj, precision="highest"
        ) - jnp.einsum(
            "...ic,...ci->...i", mu_g, pc_t, precision="highest"
        )[..., None]
        mur_j = jnp.einsum(
            "...jc,...cj->...j", muj, pj, precision="highest"
        )[..., None, :] - jnp.einsum(
            "...jc,...ci->...ij", muj, pc_t, precision="highest"
        )
        e = e + jnp.sum(okf * (b * mumu - c * mur_i * mur_j))
        k0 += len(chunk)
    return e * jnp.where(valid, 1.0, jnp.nan).astype(dtype)
