"""Potential defined by cubic-spline interpolation of a numerical function.

TPU-native counterpart of ``/root/reference/src/torchpme/potentials/spline.py``.
Construction (second derivatives, automatic Fourier-kernel evaluation) happens
eagerly at init time; evaluation is a pure function of the stored pytree
leaves, so instances trace cleanly through ``jit`` / ``grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..ops.splines import (
    CubicSpline,
    CubicSplineReciprocal,
    compute_second_derivatives,
    compute_spline_ft,
)
from .potential import Potential

__all__ = ["SplinePotential"]


class SplinePotential(Potential):
    r"""Potential built from a spline through ``(r, y)`` samples.

    The potential is treated as purely long range (``sr_from_dist`` returns
    zero); the Fourier-domain kernel is splined against :math:`k^2`, computed
    automatically from the real-space samples via the analytic radial FT
    (:func:`~torchpme_tpu.ops.splines.compute_spline_ft`) when not given.

    :param r_grid: radial grid of the real-space samples.
    :param y_grid: potential values on ``r_grid``.
    :param k_grid: radial grid for the k-space kernel; defaults to
        :math:`2\pi/r` of the (flipped) real grid when ``reciprocal`` else to
        ``r_grid``.
    :param yhat_grid: kernel values on ``k_grid``; computed automatically when
        absent.
    :param reciprocal: spline on a ``1/r`` axis (suited to long-range tails);
        requires a strictly positive ``r_grid``.
    :param y_at_zero: value used for :math:`r \to 0` with a reciprocal spline.
    :param yhat_at_zero: value used for :math:`k \to 0` in the kernel.
    :param smearing / exclusion_radius / exclusion_degree / prefactor: see
        :class:`Potential`.

    Example
    -------
    Spline the long-range part of a Coulomb potential and evaluate it back:

    >>> import jax.numpy as jnp
    >>> from torchpme_tpu.potentials import CoulombPotential
    >>> coulomb = CoulombPotential(smearing=1.0)
    >>> r = jnp.linspace(0.1, 20.0, 600)
    >>> spline = SplinePotential(r, coulomb.lr_from_dist(r), reciprocal=True)
    >>> x = jnp.asarray([0.5, 2.0, 5.0])
    >>> print(jnp.allclose(spline.lr_from_dist(x), coulomb.lr_from_dist(x),
    ...                    atol=1e-5))
    True
    """

    def __init__(
        self,
        r_grid: Array,
        y_grid: Array,
        k_grid: Array | None = None,
        yhat_grid: Array | None = None,
        reciprocal: bool = False,
        y_at_zero: float | None = None,
        yhat_at_zero: float | None = None,
        smearing: float | None = None,
        exclusion_radius: float | None = None,
        exclusion_degree: int = 1,
        prefactor: float = 1.0,
    ):
        sets = object.__setattr__
        sets(self, "smearing", smearing)
        sets(self, "exclusion_radius", exclusion_radius)
        sets(self, "exclusion_degree", exclusion_degree)
        sets(self, "prefactor", prefactor)

        r_grid = jnp.asarray(r_grid)
        y_grid = jnp.asarray(y_grid)
        if y_grid.shape[0] != r_grid.shape[0]:
            raise ValueError("Length of radial grid and value array mismatch.")
        sets(self, "r_grid", r_grid)
        sets(self, "y_grid", y_grid)

        if reciprocal:
            if float(jnp.min(r_grid)) <= 0.0:
                raise ValueError(
                    "Positive-valued radial grid is needed for reciprocal axis spline."
                )
            spline = CubicSplineReciprocal.from_points(r_grid, y_grid, y_at_zero)
        else:
            spline = CubicSpline.from_points(r_grid, y_grid)
        sets(self, "_spline", spline)

        if k_grid is None:
            if reciprocal:
                k_grid = 2 * jnp.pi / r_grid[::-1]
            else:
                k_grid = r_grid
        else:
            k_grid = jnp.asarray(k_grid)
        sets(self, "k_grid", k_grid)

        if yhat_grid is None:
            yhat_grid = compute_spline_ft(
                k_grid, r_grid, y_grid, compute_second_derivatives(r_grid, y_grid)
            )
        else:
            yhat_grid = jnp.asarray(yhat_grid)
        sets(self, "yhat_grid", yhat_grid)

        # the k-space kernel is queried with k**2, so spline against k**2
        if reciprocal:
            krn_spline = CubicSplineReciprocal.from_points(
                k_grid**2, yhat_grid, yhat_at_zero
            )
        else:
            krn_spline = CubicSpline.from_points(k_grid**2, yhat_grid)
        sets(self, "_krn_spline", krn_spline)

        if y_at_zero is None:
            y_at_zero_val = spline(jnp.zeros((), dtype=r_grid.dtype))
        else:
            y_at_zero_val = jnp.asarray(y_at_zero, dtype=r_grid.dtype)
        sets(self, "_y_at_zero", y_at_zero_val)

        if yhat_at_zero is None:
            yhat_at_zero_val = krn_spline(jnp.zeros((), dtype=k_grid.dtype))
        else:
            yhat_at_zero_val = jnp.asarray(yhat_at_zero, dtype=k_grid.dtype)
        sets(self, "_yhat_at_zero", yhat_at_zero_val)

    # -- evaluation ------------------------------------------------------------

    def from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        # Without a separate full spline, the total is LR (+ zero SR).  The
        # sub-methods already apply ``prefactor``; applying it again here
        # would square it — a deliberate divergence from the reference, which
        # has exactly that bug (/root/reference/src/torchpme/potentials/
        # spline.py:136 wraps prefactor around lr_from_dist which multiplies
        # it again at :154).
        return self.lr_from_dist(dist, pair_mask) + self.sr_from_dist(dist, pair_mask)

    def sr_from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        return jnp.zeros_like(dist)

    def lr_from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        result = self._spline(dist)
        if pair_mask is not None:
            result = result * pair_mask
        return self.prefactor * result

    def lr_from_k_sq(self, k_sq: Array) -> Array:
        return self.prefactor * self._krn_spline(k_sq)

    def self_contribution(self) -> Array:
        return self.prefactor * self._y_at_zero

    def background_correction(self) -> Array:
        return jnp.zeros((), dtype=self.r_grid.dtype)


_SPLINE_LEAVES = (
    "smearing",
    "exclusion_radius",
    "prefactor",
    "r_grid",
    "y_grid",
    "k_grid",
    "yhat_grid",
    "_spline",
    "_krn_spline",
    "_y_at_zero",
    "_yhat_at_zero",
)


def _spline_flatten(pot: SplinePotential):
    return tuple(getattr(pot, n) for n in _SPLINE_LEAVES), (pot.exclusion_degree,)


def _spline_unflatten(aux, children) -> SplinePotential:
    pot = object.__new__(SplinePotential)
    for name, value in zip(_SPLINE_LEAVES, children):
        object.__setattr__(pot, name, value)
    object.__setattr__(pot, "exclusion_degree", aux[0])
    return pot


jax.tree_util.register_pytree_node(
    SplinePotential, _spline_flatten, _spline_unflatten
)
