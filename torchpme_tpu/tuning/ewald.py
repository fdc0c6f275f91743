"""Ewald parameter tuning: analytic error bounds + grid search.

TPU-native counterpart of ``/root/reference/src/torchpme/tuning/ewald.py``.
The Kolafa–Perram-style error bounds are pure jittable functions of scalar
parameters (floats or traced arrays both work).
"""

from __future__ import annotations

import math
from typing import Any
from warnings import warn

import jax.numpy as jnp

from ..calculators import EwaldCalculator
from .tuner import GridSearchTuner, TuningErrorBounds

__all__ = ["tune_ewald", "EwaldErrorBounds", "ewald_error"]


def ewald_rspace_error(prefac, volume, smearing, cutoff):
    """Real-space truncation error of the Ewald sum (pure, jittable)."""
    return (
        prefac
        / jnp.sqrt(cutoff * volume)
        * jnp.exp(-(cutoff**2) / 2 / smearing**2)
    )


def ewald_kspace_error(prefac, volume, smearing, lr_wavelength):
    """Reciprocal-space truncation error of the Ewald sum (pure, jittable)."""
    return (
        prefac**0.5
        / smearing
        / jnp.pi
        / jnp.sqrt(volume / lr_wavelength)
        * jnp.exp(-2 * (jnp.pi * smearing / lr_wavelength) ** 2)
    )


def ewald_error(prefac, volume, smearing, lr_wavelength, cutoff):
    """Root-sum-square of the real- and reciprocal-space Ewald errors."""
    return jnp.sqrt(
        ewald_kspace_error(prefac, volume, smearing, lr_wavelength) ** 2
        + ewald_rspace_error(prefac, volume, smearing, cutoff) ** 2
    )


class EwaldErrorBounds(TuningErrorBounds):
    r"""Error bound for :class:`~torchpme_tpu.EwaldCalculator`,
    :math:`\sqrt{E_{real}^2 + E_{fourier}^2}`.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> bounds = EwaldErrorBounds(
    ...     jnp.array([[1.0], [-1.0]]),
    ...     jnp.eye(3),
    ...     jnp.array([[0.0, 0.0, 0.0], [0.4, 0.4, 0.4]]),
    ... )
    >>> print(f"{float(bounds(smearing=1.0, lr_wavelength=0.5, cutoff=4.4)):.4e}")
    8.4304e-05
    """

    def __init__(self, charges, cell, positions):
        super().__init__(charges, cell, positions)
        self.volume = jnp.abs(jnp.linalg.det(self._cell))
        self.sum_squared_charges = jnp.sum(self._charges**2)
        self.prefac = (
            2 * self.sum_squared_charges / math.sqrt(self._positions.shape[0])
        )

    def err_kspace(self, smearing, lr_wavelength):
        """Reciprocal-space error for the given smearing and wavelength."""
        return ewald_kspace_error(self.prefac, self.volume, smearing, lr_wavelength)

    def err_rspace(self, smearing, cutoff):
        """Real-space error for the given smearing and cutoff."""
        return ewald_rspace_error(self.prefac, self.volume, smearing, cutoff)

    def error(self, smearing, lr_wavelength, cutoff):
        """Total RSS error bound (jittable: accepts floats or traced scalars)."""
        return ewald_error(self.prefac, self.volume, smearing, lr_wavelength, cutoff)


def tune_ewald(
    charges,
    cell,
    positions,
    cutoff: float,
    neighbor_indices,
    neighbor_distances,
    full_neighbor_list: bool = False,
    prefactor: float = 1.0,
    exponent: int = 1,
    ns_lo: int = 1,
    ns_hi: int = 14,
    accuracy: float = 1e-3,
) -> tuple[float, dict[str, Any], float]:
    r"""Find optimal ``(smearing, lr_wavelength)`` for the Ewald calculator.

    Screens ``lr_wavelength = min_cell_dim / ns`` for ``ns = ns_lo..ns_hi``
    with the analytic error bound, wall-clock-times the candidates meeting
    ``accuracy``, and returns the fastest (parity with reference
    ``tuning/ewald.py:11-121``).

    :return: ``(smearing, {"lr_wavelength": ...}, seconds_per_step)``.
    """
    cell = jnp.asarray(cell)
    min_dimension = float(jnp.min(jnp.linalg.norm(cell, axis=1)))
    params = [{"lr_wavelength": min_dimension / ns} for ns in range(ns_lo, ns_hi + 1)]

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
        calculator=EwaldCalculator,
        error_bounds=EwaldErrorBounds(charges=charges, cell=cell, positions=positions),
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
