"""PME parameter tuning: Petersen-style error bound + grid search.

TPU-native counterpart of ``/root/reference/src/torchpme/tuning/pme.py``.
Error formulas follow Petersen, JCP 103, 3668 (1995); note the notation
difference ``α = 1/(√2·smearing)``.
"""

from __future__ import annotations

import math
from itertools import product
from typing import Any
from warnings import warn

import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..calculators import PMECalculator
from .ewald import ewald_rspace_error
from .tuner import GridSearchTuner, TuningErrorBounds

__all__ = ["tune_pme", "PMEErrorBounds", "pme_kspace_error"]

# RMS of the force-interpolation polynomial φ per interpolation order
# (Petersen 1995); entries for interpolation_nodes = 3..7
_RMS_PHI = (0.246, 0.404, 0.950, 2.51, 8.42)


def pme_kspace_error(
    prefac, volume, cell_dimensions, smearing, mesh_spacing, interpolation_nodes
):
    """Reciprocal-space (interpolation) error of PME (pure, jittable)."""
    inv_sqrt2_smearing = 1.0 / (2**0.5 * smearing)
    actual_spacing = cell_dimensions / (2 * cell_dimensions / mesh_spacing + 1)
    h = jnp.prod(actual_spacing) ** (1 / 3)
    n = interpolation_nodes
    n_factorial = jnp.exp(gammaln(n + 1.0))
    rms_phi = jnp.asarray(_RMS_PHI)[n - 3]
    return (
        prefac
        * jnp.pi**0.25
        * (6 * inv_sqrt2_smearing / (2 * n + 1)) ** 0.5
        / volume ** (2 / 3)
        * (2**0.5 / smearing * h) ** n
        / n_factorial
        * jnp.exp(n * (jnp.log(n / 2.0) - 1) / 2)
        * rms_phi
    )


class PMEErrorBounds(TuningErrorBounds):
    r"""Error bound for :class:`~torchpme_tpu.PMECalculator`.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> bounds = PMEErrorBounds(
    ...     jnp.array([[1.0], [-1.0]]),
    ...     jnp.eye(3),
    ...     jnp.array([[0.0, 0.0, 0.0], [0.4, 0.4, 0.4]]),
    ... )
    >>> err = bounds(smearing=1.0, mesh_spacing=0.5, cutoff=4.4, interpolation_nodes=3)
    >>> print(f"{float(err):.4e}")
    1.1180e-03
    """

    def __init__(self, charges, cell, positions):
        super().__init__(charges, cell, positions)
        self.volume = jnp.abs(jnp.linalg.det(self._cell))
        self.sum_squared_charges = jnp.sum(self._charges**2)
        self.prefac = 2 * self.sum_squared_charges / math.sqrt(self._positions.shape[0])
        self.cell_dimensions = jnp.linalg.norm(self._cell, axis=1)

    def err_kspace(self, smearing, mesh_spacing, interpolation_nodes):
        """Interpolation/aliasing error of the mesh part."""
        return pme_kspace_error(
            self.prefac,
            self.volume,
            self.cell_dimensions,
            smearing,
            mesh_spacing,
            interpolation_nodes,
        )

    def err_rspace(self, smearing, cutoff):
        """Real-space truncation error (same bound as Ewald)."""
        return ewald_rspace_error(self.prefac, self.volume, smearing, cutoff)

    def error(self, cutoff, smearing, mesh_spacing, interpolation_nodes):
        """Total RSS error bound (jittable)."""
        return jnp.sqrt(
            self.err_rspace(smearing, cutoff) ** 2
            + self.err_kspace(smearing, mesh_spacing, interpolation_nodes) ** 2
        )


def tune_pme(
    charges,
    cell,
    positions,
    cutoff: float,
    neighbor_indices,
    neighbor_distances,
    full_neighbor_list: bool = False,
    prefactor: float = 1.0,
    exponent: int = 1,
    nodes_lo: int = 3,
    nodes_hi: int = 7,
    mesh_lo: int = 2,
    mesh_hi: int = 7,
    accuracy: float = 1e-3,
) -> tuple[float, dict[str, Any], float]:
    r"""Find optimal ``(smearing, mesh_spacing, interpolation_nodes)`` for PME.

    Candidate grid: interpolation orders × mesh sizes ``2^mesh_lo..2^mesh_hi``
    along the shortest cell axis (``mesh_spacing = 2·min_dim/(2^ns − 1)``),
    error-screened then wall-clock-ranked (parity with reference
    ``tuning/pme.py:12-138``).

    :return: ``(smearing, {"interpolation_nodes": ..., "mesh_spacing": ...},
        seconds_per_step)``.
    """
    cell = jnp.asarray(cell)
    min_dimension = float(jnp.min(jnp.linalg.norm(cell, axis=1)))
    params = [
        {
            "interpolation_nodes": nodes,
            "mesh_spacing": 2 * min_dimension / (2**ns - 1),
        }
        for nodes, ns in product(
            range(nodes_lo, nodes_hi + 1), range(mesh_lo, mesh_hi + 1)
        )
    ]

    tuner = GridSearchTuner(
        charges=charges,
        cell=cell,
        positions=positions,
        cutoff=cutoff,
        exponent=exponent,
        neighbor_indices=neighbor_indices,
        neighbor_distances=neighbor_distances,
        full_neighbor_list=full_neighbor_list,
        prefactor=prefactor,
        calculator=PMECalculator,
        error_bounds=PMEErrorBounds(charges=charges, cell=cell, positions=positions),
        params=params,
    )
    smearing = tuner.estimate_smearing(accuracy)
    errs, timings = tuner.tune(accuracy)

    if any(err < accuracy for err in errs):
        best = timings.index(min(timings))
        return smearing, params[best], timings[best]
    warn(
        "No parameter meets the accuracy requirement.\n"
        f"Returning the parameter with the smallest error, which is {min(errs)}.\n",
        stacklevel=1,
    )
    best = errs.index(min(errs))
    return smearing, params[best], timings[best]
