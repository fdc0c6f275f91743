"""Base calculator: real-space neighbor sum plus optional k-space long range.

TPU-native counterpart of
``/root/reference/src/torchpme/calculators/calculator.py``.  Calculators are
immutable pytree dataclasses wrapping a pure forward function: the potential's
numeric parameters are traced leaves (trainable, differentiable), structural
options are static metadata.  ``jax.grad`` of the summed output w.r.t.
positions / charges / cell yields forces and stress through the entire stack.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array

from ..potentials import Potential
from ..potentials.potential import static_field
from ..utils.validation import validate_parameters

__all__ = ["Calculator"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Calculator:
    r"""Evaluates :math:`V_i = \frac{1}{2}\sum_j q_j\, v(r_{ij})` per atom.

    Used directly it computes the real-space part only (a "direct" sum over
    the provided neighbor list); subclasses add a reciprocal-space long-range
    part by overriding :meth:`_compute_kspace`.

    :param potential: the pair potential; its ``smearing`` decides whether a
        k-space part is evaluated at all.
    :param full_neighbor_list: whether the neighbor list contains each pair
        twice (full) or once (half).

    Example
    -------
    Direct sum over a ±1 dimer at distance 1 (no periodicity):

    >>> import jax.numpy as jnp
    >>> from torchpme_tpu import Calculator, CoulombPotential
    >>> from torchpme_tpu.utils.neighbors import neighbor_list
    >>> positions = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    >>> charges = jnp.asarray([[1.0], [-1.0]])
    >>> idx, dist, _ = neighbor_list(positions, cutoff=1.5, periodic=False)
    >>> calc = Calculator(CoulombPotential())
    >>> pot = calc(charges, jnp.eye(3), positions,
    ...            jnp.asarray(idx), jnp.asarray(dist))
    >>> print(f"{float(jnp.sum(pot * charges)):.4f}")  # E = -1/r
    -1.0000
    """

    potential: Potential
    full_neighbor_list: bool = static_field(default=False, kw_only=True)

    def __post_init__(self):
        if not isinstance(self.potential, Potential):
            raise TypeError(
                f"Potential must be an instance of Potential, got {type(self.potential)}"
            )

    # -- real space -----------------------------------------------------------

    def _bare_pair_values(
        self, neighbor_distances: Array, pair_mask: Array | None
    ) -> Array:
        """Pair terms v(r): full potential (direct mode, optionally windowed)
        or the short-range part (the long range is summed in k-space)."""
        if self.potential.smearing is None:
            if self.potential.exclusion_radius is None:
                return self.potential.from_dist(neighbor_distances, pair_mask)
            return self.potential.from_dist(neighbor_distances, pair_mask) * (
                1 - self.potential.f_cutoff(neighbor_distances, pair_mask)
            )
        return self.potential.sr_from_dist(neighbor_distances, pair_mask)

    def _compute_rspace(
        self,
        charges: Array,
        neighbor_indices: Array,
        neighbor_distances: Array,
        pair_mask: Array | None = None,
    ) -> Array:
        """Real-space neighbor sum.

        Two input layouts are supported, dispatched on the distances' rank:

        * **pair list** ``indices (P, 2)`` / ``distances (P,)`` — reference
          layout; accumulation is a scatter-add (slow on XLA:TPU, fine on CPU);
        * **dense per-atom** ``indices (N, C)`` / ``distances (N, C)`` (from
          :func:`torchpme_tpu.utils.neighbors.dense_neighbor_format`) — the
          TPU-native layout: a gather plus a dense reduction, no scatter.
          Dense lists are always "full" (each atom lists all its neighbors);
          ``pair_mask`` flags the padded slots.
        """
        # named scopes mark the real-space phases in jax.profiler traces
        # (parity with the reference's torch.profiler.record_function markers)
        with jax.named_scope("compute_bare_potential"):
            pair_values = self._bare_pair_values(neighbor_distances, pair_mask)

        if neighbor_distances.ndim == 2:
            # dense layout: v (N, C), neighbor charges (N, C, channels)
            with jax.named_scope("assign_potential_dense"):
                neighbor_charges = charges[neighbor_indices]
                return (
                    jnp.sum(neighbor_charges * pair_values[..., None], axis=1) / 2
                )

        atom_is = neighbor_indices[:, 0]
        atom_js = neighbor_indices[:, 1]

        with jax.named_scope("assign_potential"):
            # q_j · v(r_ij) accumulated on atom i (single fused scatter-add)
            potential = jnp.zeros_like(charges)
            potential = potential.at[atom_is].add(
                charges[atom_js] * pair_values[:, None]
            )
            if not self.full_neighbor_list:
                # half lists store each pair once: add the mirrored (j, i) terms
                potential = potential.at[atom_js].add(
                    charges[atom_is] * pair_values[:, None]
                )
        # compensate double counting of (i,j) and (j,i)
        return potential / 2

    # -- reciprocal space -------------------------------------------------------

    def _compute_kspace(
        self,
        charges: Array,
        cell: Array,
        positions: Array,
        periodic: Array | None = None,
        kvectors: Array | None = None,
        node_mask: Array | None = None,
    ) -> Array:
        raise NotImplementedError(
            f"`_compute_kspace` not implemented for {type(self).__name__}"
        )

    # -- public forward ---------------------------------------------------------

    def _rspace_from_inputs(
        self,
        charges: Array,
        cell: Array,
        positions: Array,
        neighbor_indices: Array | None,
        neighbor_distances: Array | None,
        pair_mask: Array | None,
        cell_list,
    ) -> Array:
        """Dispatch the real-space sum: neighbor list or cell list."""
        if cell_list is not None:
            if neighbor_indices is not None or neighbor_distances is not None:
                raise ValueError(
                    "Pass either a neighbor list or a `cell_list`, not both"
                )
            from ..ops.rspace_cells import cell_list_rspace_potentials

            return cell_list_rspace_potentials(
                lambda d: self._bare_pair_values(d, None),
                charges,
                positions,
                cell,
                cell_list,
            )
        if neighbor_indices is None or neighbor_distances is None:
            raise ValueError(
                "Provide `neighbor_indices` and `neighbor_distances`, or a "
                "`cell_list` from compute_cell_list"
            )
        return self._compute_rspace(
            charges=charges,
            neighbor_indices=neighbor_indices,
            neighbor_distances=neighbor_distances,
            pair_mask=pair_mask,
        )

    def __call__(
        self,
        charges: Array,
        cell: Array,
        positions: Array,
        neighbor_indices: Array | None = None,
        neighbor_distances: Array | None = None,
        periodic: Array | None = None,
        node_mask: Array | None = None,
        pair_mask: Array | None = None,
        kvectors: Array | None = None,
        cell_list=None,
    ) -> Array:
        r"""Compute the per-atom potential "energy".

        :param charges: ``(n_atoms, n_channels)`` (pseudo-)charges; multiple
            channels evaluate several potentials at once (e.g. one-hot species
            encodings for ML features).
        :param cell: ``(3, 3)`` cell matrix, rows are basis vectors.
        :param positions: ``(n_atoms, 3)`` Cartesian coordinates.
        :param neighbor_indices: ``(n_pairs, 2)`` ``i, j`` indices of the
            (externally computed) neighbor list.
        :param neighbor_distances: ``(n_pairs,)`` pair distances.
        :param periodic: optional ``(3,)`` bool mask of periodic directions
            (2D-periodic slab corrections activate when exactly two are true).
        :param node_mask: optional ``(n_atoms,)`` bool mask for padded batches.
        :param pair_mask: optional ``(n_pairs,)`` bool mask for padded pairs.
        :param kvectors: optional precomputed k-vectors (required for the
            Ewald k-space part under ``jit``/``vmap``, where mesh sizes cannot
            depend on traced cells).
        :param cell_list: a :class:`~torchpme_tpu.ops.rspace_cells.CellList`
            from :func:`~torchpme_tpu.ops.rspace_cells.compute_cell_list` —
            the TPU-native alternative to a neighbor list: the real-space sum
            runs gather-free over 27-cell windows with distances recomputed
            differentiably from ``positions``.  Mutually exclusive with
            ``neighbor_indices``/``neighbor_distances``; refresh it like a
            neighbor list (stale lists poison the result with NaN).
        :return: ``(n_atoms, n_channels)`` per-atom potentials; multiply by
            charges and sum for the total energy.
        """
        validate_parameters(
            charges=charges,
            cell=cell,
            positions=positions,
            neighbor_indices=neighbor_indices,
            neighbor_distances=neighbor_distances,
            periodic=periodic,
            pair_mask=pair_mask,
            node_mask=node_mask,
            kvectors=kvectors,
        )

        potential_sr = self._rspace_from_inputs(
            charges, cell, positions,
            neighbor_indices, neighbor_distances, pair_mask, cell_list,
        )
        if self.potential.smearing is None:
            return potential_sr

        potential_lr = self._compute_kspace(
            charges=charges,
            cell=cell,
            positions=positions,
            periodic=periodic,
            kvectors=kvectors,
            node_mask=node_mask,
        )
        return potential_sr + potential_lr

    def energy(
        self,
        charges: Array,
        cell: Array,
        positions: Array,
        neighbor_indices: Array | None = None,
        neighbor_distances: Array | None = None,
        pair_mask: Array | None = None,
        cell_list=None,
        **kspace_kwargs,
    ) -> Array:
        r"""Total energy :math:`E = \sum_i q_i V_i` (scalar).

        Same value as ``sum(calc(...) * charges)``; on the ``cell_list`` path
        the real-space contraction runs in bucket order, skipping the
        bucket→atom scatter — the fast path for jitted MD steps
        (``jax.grad`` of this w.r.t. ``positions`` is minus the forces).
        ``kspace_kwargs`` are forwarded to the k-space part (``ns_mesh``,
        ``tiled_interp``, ``ns_kvectors``, ...).
        """
        # same input validation as the per-atom __call__ path: malformed
        # inputs get the curated errors, not obscure downstream shape errors
        validate_parameters(
            charges=charges,
            cell=cell,
            positions=positions,
            neighbor_indices=neighbor_indices,
            neighbor_distances=neighbor_distances,
            pair_mask=pair_mask,
        )
        if cell_list is not None:
            from ..ops.rspace_cells import cell_list_rspace_energy

            if neighbor_indices is not None or neighbor_distances is not None:
                raise ValueError(
                    "Pass either a neighbor list or a `cell_list`, not both"
                )
            # pass the potential itself (not a closure): the cell-list module
            # recognizes it and engages the analytic-force custom VJP
            e_sr = cell_list_rspace_energy(
                self.potential, charges, positions, cell, cell_list
            )
        else:
            if neighbor_indices is None or neighbor_distances is None:
                raise ValueError(
                    "Provide `neighbor_indices` and `neighbor_distances`, or a "
                    "`cell_list` from compute_cell_list"
                )
            pot_sr = self._compute_rspace(
                charges=charges,
                neighbor_indices=neighbor_indices,
                neighbor_distances=neighbor_distances,
                pair_mask=pair_mask,
            )
            e_sr = jnp.sum(pot_sr * charges)
        if self.potential.smearing is None:
            return e_sr
        # mesh calculators provide a quadratic-form k-space energy (Parseval:
        # no inverse transform, no mesh->points gather); per-atom node_mask
        # semantics need the potential path
        kspace_energy = getattr(self, "_compute_kspace_energy", None)
        if kspace_energy is not None and kspace_kwargs.get("node_mask") is None:
            kspace_kwargs.pop("node_mask", None)
            return e_sr + kspace_energy(
                charges=charges, cell=cell, positions=positions, **kspace_kwargs
            )
        pot_lr = self._compute_kspace(
            charges=charges, cell=cell, positions=positions, **kspace_kwargs
        )
        return e_sr + jnp.sum(pot_lr * charges)

    # API-parity alias with the reference's nn.Module.forward
    forward = __call__
