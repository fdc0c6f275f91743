"""Inverse power-law potentials :math:`1/r^p` for integer exponents.

TPU-native counterpart of
``/root/reference/src/torchpme/potentials/inversepowerlaw.py``.  The exponent
is static pytree metadata (it selects among closed-form incomplete-gamma
expressions, so it must be a trace-time constant).
"""

from __future__ import annotations

import math as _math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array
from ..ops.math import gamma, gammainc_over_powerlaw, gammaincc_over_powerlaw
from .coulomb import erfc_f32_from_gauss, slab_correction_1r
from .potential import Potential, static_field

__all__ = ["InversePowerLawPotential"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class InversePowerLawPotential(Potential):
    r"""Range-separated :math:`1/r^p` potential for integer ``p = 1..6``.

    The long-range part is defined through the regularized lower incomplete
    gamma function :math:`\gamma(p/2, r^2/2\sigma^2)/(r^2/2\sigma^2)^{p/2}`
    and its Fourier transform through closed forms of the complementary
    incomplete gamma over a power law (:func:`gammaincc_over_powerlaw`).
    For ``p > 3`` the :math:`k \to 0` limit is finite and assigned exactly;
    for ``p ≤ 3`` the k=0 value is zeroed, which corresponds to adding a
    uniform neutralizing background.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> pot = InversePowerLawPotential(exponent=2, smearing=1.0)
    >>> print(f"{float(pot.from_dist(jnp.asarray(2.0))):.4f}")  # 1/r²
    0.2500
    >>> r = jnp.asarray([0.7, 1.8])
    >>> print(jnp.allclose(pot.sr_from_dist(r) + pot.lr_from_dist(r),
    ...                    pot.from_dist(r)))
    True
    """

    exponent: int = static_field(default=1)

    def __post_init__(self):
        # validates the exponent range eagerly (1..6 have closed forms)
        gammaincc_over_powerlaw(self.exponent, jnp.asarray(1.0))

    def from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        result = jnp.maximum(dist, 1e-15) ** (-float(self.exponent))
        if pair_mask is not None:
            result = result * pair_mask
        return self.prefactor * result

    def lr_from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        if self.smearing is None:
            raise ValueError(
                "Cannot compute long-range contribution without specifying `smearing`."
            )
        x = jnp.maximum(0.5 * dist**2 / self.smearing**2, 1e-15)
        peff = self.exponent / 2
        prefac = 1.0 / (2 * self.smearing**2) ** peff
        # closed-form P(p/2, x)/x^{p/2}: jax.scipy's gammainc iterates a
        # while_loop per element, which serializes TPU vector lanes —
        # measured 215-375 ms for one 102k-atom pair window at p = 2..3
        # vs ~6 ms total with the elementary forms (ops/math.py)
        result = prefac * gammainc_over_powerlaw(self.exponent, x)
        if pair_mask is not None:
            result = result * pair_mask
        return self.prefactor * result

    def sr_derivative(self, dist: Array, sr_values: Array) -> Array:
        r"""Analytic :math:`dV_{SR}/dr` for the MD fast path.

        With :math:`\alpha = 1/(\sigma\sqrt2)` and
        :math:`V_{SR} = P\,Q(p/2, (\alpha r)^2)/r^p` (:math:`Q` the
        regularized upper incomplete gamma):

        .. math:: V_{SR}' = -\frac{p\,V_{SR}}{r}
                  - P\,\frac{2\alpha^p}{\Gamma(p/2)}\,\frac{e^{-\alpha^2r^2}}{r}

        Reuses ``sr_values`` so the only new transcendental is one ``exp``
        (the Coulomb hook is the p = 1 case of this formula).
        """
        p = self.exponent
        alpha_sq = 0.5 / self.smearing**2
        c = (
            self.prefactor
            * 2.0
            * alpha_sq ** (p / 2)
            / gamma(jnp.asarray(p / 2))
        )
        gauss = jnp.exp(-alpha_sq * dist**2)
        return -(p * sr_values + c * gauss) / dist

    def sr_pair_force(self, dist: Array, vq: Array, pair_e: Array) -> Array:
        r"""Pair-force numerator :math:`q_iq_j V'_{SR}` from the shared energy
        product (see :meth:`CoulombPotential.sr_pair_force` for why this form
        matters under XLA fusion)."""
        p = self.exponent
        alpha_sq = 0.5 / self.smearing**2
        c = (
            self.prefactor
            * 2.0
            * alpha_sq ** (p / 2)
            / gamma(jnp.asarray(p / 2))
        )
        gauss = jnp.exp(-alpha_sq * dist**2)
        return -(p * pair_e + vq * (c * gauss)) / dist

    def sr_window_math(self, dist_sq: Array) -> tuple[Array, Array]:
        r"""``(V_SR(d), V_SR'(d)/d)`` as functions of :math:`d^2` — the
        float32 window fast path (see :meth:`CoulombPotential.sr_window_math`).

        With :math:`z = \alpha^2 d^2` the short-range part is
        :math:`V_{SR} = P\,Q(p/2, z)/d^p` (regularized UPPER incomplete
        gamma), which is elementary for half-integer :math:`p/2`:

        .. math::
            Q(1/2,z) &= \mathrm{erfc}(\sqrt z) \\
            Q(1,z)   &= e^{-z} \\
            Q(3/2,z) &= \mathrm{erfc}(\sqrt z) + \tfrac{2}{\sqrt\pi}\sqrt z\,e^{-z} \\
            Q(2,z)   &= (1+z)\,e^{-z} \\
            Q(5/2,z) &= \mathrm{erfc}(\sqrt z)
                        + \tfrac{2}{\sqrt\pi}\sqrt z\,(1+\tfrac{2z}{3})\,e^{-z} \\
            Q(3,z)   &= (1+z+z^2/2)\,e^{-z}

        One shared Gaussian feeds the :math:`Q` polynomial, the A&S-7.1.26
        erfc (odd :math:`p`), and the force term
        :math:`V'/d = -(p\,V + c\,e^{-z})/d^2`; every divide is an ``rsqrt``
        power of the squared distance the window already has.  All terms of
        :math:`Q` are positive (no cancellation), so accuracy is uniform over
        the pair range.
        """
        p = self.exponent
        alpha_sq = 0.5 / self.smearing**2
        rd = jax.lax.rsqrt(dist_sq)
        rd2 = rd * rd
        z = alpha_sq * dist_sq
        gauss = jnp.exp(-z)
        if p % 2:  # odd p: erfc(√z) enters; √z = α·d rides the rsqrt
            sz = alpha_sq**0.5 * (dist_sq * rd)
            erfc = erfc_f32_from_gauss(sz, gauss)
            two_rpi = 2.0 / jnp.pi**0.5
            if p == 1:
                q_upper = erfc
            elif p == 3:
                q_upper = erfc + two_rpi * sz * gauss
            else:  # p == 5
                q_upper = erfc + two_rpi * sz * (1.0 + 2.0 / 3.0 * z) * gauss
            inv_dp = rd2 ** ((p - 1) // 2) * rd
        else:
            if p == 2:
                q_upper = gauss
            elif p == 4:
                q_upper = (1.0 + z) * gauss
            else:  # p == 6
                q_upper = (1.0 + z * (1.0 + 0.5 * z)) * gauss
            inv_dp = rd2 ** (p // 2)
        v = self.prefactor * q_upper * inv_dp
        c = self.prefactor * 2.0 * alpha_sq ** (p / 2) / _math.gamma(p / 2)
        w = -(p * v + c * gauss) * rd2
        return v, w

    def lr_from_k_sq(self, k_sq: Array) -> Array:
        if self.smearing is None:
            raise ValueError(
                "Cannot compute long-range kernel without specifying `smearing`."
            )
        peff = (3 - self.exponent) / 2
        prefac = jnp.pi**1.5 / gamma(jnp.asarray(self.exponent / 2)) * (
            2 * self.smearing**2
        ) ** peff
        x = 0.5 * self.smearing**2 * k_sq

        masked = jnp.where(x == 0, 1.0, x)  # NaN-safe backward (see Coulomb)
        if self.exponent > 3:
            # finite k -> 0 limit for rapidly decaying potentials
            k0_limit = -prefac / peff
        else:
            # divergent limit zeroed: implicit neutralizing background
            k0_limit = jnp.zeros_like(prefac)

        return self.prefactor * jnp.where(
            k_sq == 0,
            k0_limit,
            prefac * gammaincc_over_powerlaw(self.exponent, masked),
        )

    def self_contribution(self) -> Array:
        if self.smearing is None:
            raise ValueError(
                "Cannot compute self contribution without specifying `smearing`."
            )
        phalf = self.exponent / 2
        return (
            self.prefactor
            / gamma(jnp.asarray(phalf + 1.0))
            / (2 * self.smearing**2) ** phalf
        )

    def background_correction(self) -> Array:
        # diverges at p = 3 and is unneeded for p > 3 (arXiv:2412.03281 SI)
        if self.smearing is None:
            raise ValueError(
                "Cannot compute background correction without specifying `smearing`."
            )
        if self.exponent >= 3:
            return jnp.zeros_like(jnp.asarray(self.smearing))
        prefac = jnp.pi**1.5 * (2 * self.smearing**2) ** ((3 - self.exponent) / 2)
        prefac /= (3 - self.exponent) * gamma(jnp.asarray(self.exponent / 2))
        return self.prefactor * prefac

    def pbc_correction(
        self,
        periodic: Array | None,
        positions: Array,
        cell: Array,
        charges: Array,
    ) -> Array:
        if self.exponent == 1:
            return self.prefactor * slab_correction_1r(
                periodic, positions, cell, charges
            )
        return super().pbc_correction(periodic, positions, cell, charges)
