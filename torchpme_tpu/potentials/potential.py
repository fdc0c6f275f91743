"""Base interface for range-separated pair potentials between monopoles.

TPU-native counterpart of ``/root/reference/src/torchpme/potentials/potential.py``.
Potentials here are immutable pytree dataclasses instead of ``nn.Module``:
their numeric fields (``smearing``, ``prefactor``, …) are pytree *leaves*, so
they are traceable, trainable and can be passed straight through ``jit`` /
``grad`` / ``vmap``; structural choices (``exclusion_degree``) are static
metadata that participate in trace caching.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["Potential"]


def static_field(**kwargs):
    """Dataclass field treated as static pytree metadata (not a traced leaf)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return field(metadata=metadata, **kwargs)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Potential:
    r"""Abstract range-separated pair potential, :math:`V(r) = V_{SR}(r) + V_{LR}(r)`.

    Provides the real-space short/long-range split, the reciprocal-space
    kernel :math:`\hat V_{LR}(k^2)`, and the correction terms (self,
    background, 2D-periodic) that the calculators assemble.  A ``Potential``
    also satisfies the k-space-kernel protocol via :meth:`kernel_from_k_sq`,
    so it can parameterize a :class:`~torchpme_tpu.ops.kspace.KSpaceFilter`
    directly (parity with reference ``potentials/potential.py:171-177``).

    :param smearing: length scale of the SR/LR switching (``None`` disables
        range separation; direct real-space evaluation only).
    :param exclusion_radius: if set, the potential is smoothly zeroed inside
        this local-environment radius (raised-cosine cutoff).
    :param exclusion_degree: exponent of the raised-cosine cutoff.
    :param prefactor: global prefactor, e.g. an electrostatics unit constant
        (see :mod:`torchpme_tpu.prefactors`).

    Example
    -------
    The raised-cosine exclusion window is 1 at the origin, 1/2 when the
    cosine hits zero, and 0 beyond the exclusion radius:

    >>> import jax.numpy as jnp
    >>> from torchpme_tpu.potentials import CoulombPotential
    >>> pot = CoulombPotential(smearing=1.0, exclusion_radius=2.0)
    >>> print(jnp.round(pot.f_cutoff(jnp.asarray([0.0, 1.0, 2.5])), 4))
    [1.  0.5 0. ]
    """

    smearing: Array | float | None = None
    exclusion_radius: Array | float | None = None
    exclusion_degree: int = static_field(default=1)
    prefactor: Array | float = 1.0

    # -- real space ---------------------------------------------------------

    def f_cutoff(self, dist: Array, pair_mask: Array | None = None) -> Array:
        r"""Raised-cosine cutoff :math:`1 - ((1-\cos\pi r/r_c)/2)^n` inside
        ``exclusion_radius``, zero outside."""
        if self.exclusion_radius is None:
            raise ValueError(
                "Cannot compute cutoff function when `exclusion_radius` is not set"
            )
        r_c = self.exclusion_radius
        result = jnp.where(
            dist < r_c,
            1 - ((1 - jnp.cos(jnp.pi * (dist / r_c))) * 0.5) ** self.exclusion_degree,
            0.0,
        )
        if pair_mask is not None:
            result = result * pair_mask
        return result

    def from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        """Full pair potential :math:`V(r)` at the given distances."""
        raise NotImplementedError(
            f"from_dist is not implemented for {type(self).__name__}"
        )

    def sr_from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        r"""Short-range part :math:`V_{SR}(r)`.

        Defaults to :math:`V(r) - V_{LR}(r)`; with ``exclusion_radius`` set it
        becomes :math:`-V_{LR}(r) f_{cut}(r)` so the total potential goes
        smoothly to zero inside the local region (parity with reference
        ``potentials/potential.py:106-138``).
        """
        if self.smearing is None:
            raise ValueError(
                "Cannot compute range-separated potential when `smearing` is "
                "not specified."
            )
        if self.exclusion_radius is None:
            return self.from_dist(dist, pair_mask=pair_mask) - self.lr_from_dist(
                dist, pair_mask=pair_mask
            )
        return -self.lr_from_dist(dist, pair_mask=pair_mask) * self.f_cutoff(
            dist, pair_mask=pair_mask
        )

    def lr_from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        r"""Long-range part :math:`V_{LR}(r)` in real space."""
        raise NotImplementedError(
            f"lr_from_dist is not implemented for {type(self).__name__}"
        )

    #: Optional analytic-force hook: subclasses may override with a method
    #: ``sr_derivative(dist, sr_values) -> dV_SR/d(dist)`` (``sr_values`` is
    #: the already-computed ``sr_from_dist(dist)`` for factor reuse).  The
    #: cell-list MD fast path uses it — when present, the no-exclusion case
    #: applies, and the potential's parameters are concrete — to skip the
    #: ``jax.vjp`` pullback of the pair kernel in its fused value-and-gradient
    #: pass; ``None`` (the default) keeps the autodiff pullback, which also
    #: carries potential-parameter gradients for trainable potentials.
    sr_derivative = None

    #: Stronger optional variant: ``sr_pair_force(dist, vq, pair_e) -> dd``
    #: returning the pair-force numerator :math:`q_iq_jV'` *in terms of* the
    #: masked charge product ``vq`` and the pair energy ``pair_e = vq·V_SR``.
    #: When both hooks exist this one wins: sharing the ``pair_e`` tensor
    #: between the energy reduction and the force chain stops XLA from
    #: duplicating the ``V(d)`` producer into two fusions (measured ~4.3 ms
    #: of repeated erfc at 102k atoms on a v5e with the generic hook).
    sr_pair_force = None

    #: Strongest optional variant: ``sr_window_math(dist_sq) -> (V, V'/d)``
    #: — the whole pair term as functions of the SQUARED distance, phrased so
    #: one transcendental pass (the shared Gaussian) feeds both the value and
    #: the force factor, with no bare ``sqrt``/divides (the window already
    #: has :math:`d^2`; everything else rides ``rsqrt``).  The cell-list
    #: window engine uses it on float32 state only: the float32
    #: approximations involved (e.g. the A&S 7.1.26 erfc rational) sit below
    #: f32 roundoff but NOT below f64, so float64 — the validation precision
    #: — keeps the exact path, as do trainable (traced-parameter) potentials.
    sr_window_math = None

    # -- reciprocal space ----------------------------------------------------

    def lr_from_k_sq(self, k_sq: Array) -> Array:
        r"""Fourier transform :math:`\hat V_{LR}` as a function of :math:`k^2`."""
        raise NotImplementedError(
            f"lr_from_k_sq is not implemented for {type(self).__name__}"
        )

    def kernel_from_k_sq(self, k_sq: Array) -> Array:
        """K-space-kernel protocol: potentials can drive a ``KSpaceFilter``."""
        return self.lr_from_k_sq(k_sq)

    # -- corrections ----------------------------------------------------------

    def self_contribution(self) -> Array:
        """Smearing-dependent potential a particle's own screening density
        generates at its position; always subtracted from k-space sums."""
        raise NotImplementedError(
            f"self_contribution is not implemented for {type(self).__name__}"
        )

    def background_correction(self) -> Array:
        """Neutralizing-background term compensating a non-neutral cell."""
        raise NotImplementedError(
            f"background_correction is not implemented for {type(self).__name__}"
        )

    def pbc_correction(
        self,
        periodic: Array | None,
        positions: Array,
        cell: Array,
        charges: Array,
    ) -> Array:
        """Correction for systems with 2D (slab) periodicity; zero by default."""
        return self.prefactor * jnp.zeros_like(charges)
