"""Smoothed Coulomb 1/r potential with Gaussian range separation.

TPU-native counterpart of ``/root/reference/src/torchpme/potentials/coulomb.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array
from jax.scipy import special as _jsp

from .potential import Potential

__all__ = ["CoulombPotential", "slab_correction_1r"]


def erfc_f32_from_gauss(y: Array, gauss: Array) -> Array:
    r"""Abramowitz & Stegun 7.1.26 rational for :math:`\mathrm{erfc}(y)`,
    phrased to REUSE an already-computed :math:`e^{-y^2}` factor.

    :math:`|\varepsilon| \le 1.5\times10^{-7}` absolute — below float32
    roundoff, so this is the f32 window fast path's erfc (the
    ``sr_window_math`` hooks share the Gaussian between the erfc and the
    force term, making erfc itself transcendental-free).  Valid for
    :math:`y \ge 0` only (the window's distances always are).
    """
    t = 1.0 / (1.0 + 0.3275911 * y)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * gauss


def slab_correction_1r(
    periodic: Array | None,
    positions: Array,
    cell: Array,
    charges: Array,
) -> Array:
    r"""Yeh–Berkowitz-style slab (2D-periodic) energy correction for 1/r.

    Active only when exactly two directions are periodic; the non-periodic
    axis is found from the ``periodic`` mask.  Fully branch-free so it works
    under ``jit`` and ``vmap`` with a traced ``periodic`` mask (parity with
    reference ``potentials/coulomb.py:6-40``).
    """
    if periodic is None:
        return jnp.zeros_like(charges)
    periodic = jnp.asarray(periodic)
    is_2d = jnp.sum(periodic) == 2
    # index of the single non-periodic axis (0 when fully periodic — then the
    # whole term is switched off by the `is_2d` select below)
    axis = jnp.argmax(jnp.where(is_2d, (~periodic).astype(jnp.int32), 0))

    z_i = jnp.take(positions, axis, axis=1)[:, None]  # (N, 1)
    basis_len = jnp.take(jnp.linalg.norm(cell, axis=-1), axis)
    volume = jnp.abs(jnp.linalg.det(cell))
    charge_tot = jnp.sum(charges, axis=0)  # (n_channels,)
    m_axis = jnp.sum(charges * z_i, axis=0)
    m_axis_sq = jnp.sum(charges * z_i**2, axis=0)
    e_slab = (4.0 * jnp.pi / volume) * (
        z_i * m_axis
        - 0.5 * (m_axis_sq + charge_tot * z_i**2)
        - charge_tot / 12.0 * basis_len**2
    )
    return jnp.where(is_2d, e_slab, jnp.zeros_like(charges))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CoulombPotential(Potential):
    r"""Smoothed electrostatic Coulomb potential :math:`1/r`.

    The SR/LR split is the classic Ewald erf/erfc split determined by the
    Gaussian ``smearing`` width :math:`\sigma`:

    * full potential :math:`1/r`,
    * long range :math:`\mathrm{erf}(r/\sigma\sqrt2)/r`,
    * Fourier kernel :math:`4\pi e^{-\sigma^2 k^2/2}/k^2` (zero at k = 0,
      which implicitly enforces charge neutrality).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> pot = CoulombPotential(smearing=1.0)
    >>> r = jnp.asarray([1.0, 2.0])
    >>> print(jnp.allclose(pot.sr_from_dist(r) + pot.lr_from_dist(r),
    ...                    pot.from_dist(r)))
    True
    >>> print(f"{float(pot.from_dist(jnp.asarray(2.0))):.3f}")
    0.500
    """

    def from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        result = 1.0 / jnp.maximum(dist, 1e-15)
        if pair_mask is not None:
            result = result * pair_mask
        return self.prefactor * result

    def lr_from_dist(self, dist: Array, pair_mask: Array | None = None) -> Array:
        if self.smearing is None:
            raise ValueError(
                "Cannot compute long-range contribution without specifying `smearing`."
            )
        result = _jsp.erf(dist / self.smearing / 2.0**0.5) / jnp.maximum(dist, 1e-12)
        if pair_mask is not None:
            result = result * pair_mask
        return self.prefactor * result

    def sr_derivative(self, dist: Array, sr_values: Array) -> Array:
        r"""Analytic :math:`dV_{SR}/dr` for the MD fast path (no-exclusion case).

        With :math:`\alpha = 1/(\sigma\sqrt2)` and
        :math:`V_{SR} = p\,\mathrm{erfc}(\alpha r)/r`:

        .. math:: V_{SR}' = -\frac{V_{SR}}{r}
                  - p\,\frac{2\alpha}{\sqrt\pi}\,\frac{e^{-\alpha^2 r^2}}{r}

        Reuses the already-computed ``sr_values`` so the only new
        transcendental is one ``exp`` pass — cheaper than the ``jax.vjp``
        pullback, which re-walks the erf/erfc chain.
        """
        alpha = 1.0 / (self.smearing * 2.0**0.5)
        gauss = jnp.exp(-((alpha * dist) ** 2))
        return -sr_values / dist - self.prefactor * (
            2.0 * alpha / jnp.pi**0.5
        ) * gauss / dist

    def sr_pair_force(self, dist: Array, vq: Array, pair_e: Array) -> Array:
        r"""Pair-force numerator :math:`q_iq_j\,V'_{SR}(r)` from the shared
        energy product (``pair_e`` = :math:`q_iq_j V_{SR}`, ``vq`` =
        :math:`q_iq_j` masked).

        Same math as ``vq * sr_derivative(...)`` — but phrased so the force
        *consumes* the energy product instead of recomputing :math:`V_{SR}`:

        .. math:: q_iq_jV' = -\bigl(q_iq_jV
                  + q_iq_j\,p\,\tfrac{2\alpha}{\sqrt\pi}e^{-\alpha^2r^2}
                  \bigr)/r

        This matters under XLA fusion: with the generic form the energy
        reduction and the force chain each pull the erfc producer into their
        own fusion (the whole chain computed twice, ~4.3 ms at 102k atoms on
        a v5e); with this form both consume one ``pair_e`` tensor and the
        energy is free.
        """
        alpha = 1.0 / (self.smearing * 2.0**0.5)
        gauss = jnp.exp(-((alpha * dist) ** 2))
        c = self.prefactor * 2.0 * alpha / jnp.pi**0.5
        return -(pair_e + vq * (c * gauss)) / dist

    def sr_window_math(self, dist_sq: Array) -> tuple[Array, Array]:
        r"""``(V_SR(d), V_SR'(d)/d)`` as functions of :math:`d^2` — the
        float32 window fast path.

        Phrased so the whole pair term needs ONE transcendental pass: the
        erfc rides the Abramowitz & Stegun 7.1.26 rational
        (:math:`|\varepsilon| \le 1.5\times10^{-7}`, below float32
        roundoff), whose :math:`e^{-x^2}` factor is *shared* with the force
        term, and every divide is an ``rsqrt`` of the squared distance the
        window already has — no bare ``sqrt``, no second ``exp`` (the exact
        path pays erfc + exp + sqrt + two divides per candidate slot).
        Used by the cell-list window engine when the analytic-derivative
        gate allows (float32, no exclusion radius, concrete parameters).
        """
        alpha = 1.0 / (self.smearing * 2.0**0.5)
        rd = jax.lax.rsqrt(dist_sq)
        gauss = jnp.exp(-(alpha * alpha) * dist_sq)
        v = self.prefactor * erfc_f32_from_gauss(alpha * (dist_sq * rd), gauss) * rd
        c = self.prefactor * (2.0 * alpha / jnp.pi**0.5)
        w = -(v + c * gauss) * (rd * rd)
        return v, w

    def lr_from_k_sq(self, k_sq: Array) -> Array:
        if self.smearing is None:
            raise ValueError(
                "Cannot compute long-range kernel without specifying `smearing`."
            )
        # double-where trick keeps the k = 0 singularity out of the backward
        # pass (NaN-safe gradients, see jax-ml/jax#1052)
        masked = jnp.where(k_sq == 0, 1.0, k_sq)
        return self.prefactor * jnp.where(
            k_sq == 0,
            0.0,
            4 * jnp.pi * jnp.exp(-0.5 * self.smearing**2 * masked) / masked,
        )

    def self_contribution(self) -> Array:
        if self.smearing is None:
            raise ValueError(
                "Cannot compute self contribution without specifying `smearing`."
            )
        return self.prefactor * (2 / jnp.pi) ** 0.5 / self.smearing

    def background_correction(self) -> Array:
        if self.smearing is None:
            raise ValueError(
                "Cannot compute background correction without specifying `smearing`."
            )
        return self.prefactor * jnp.pi * self.smearing**2

    def pbc_correction(
        self,
        periodic: Array | None,
        positions: Array,
        cell: Array,
        charges: Array,
    ) -> Array:
        return self.prefactor * slab_correction_1r(periodic, positions, cell, charges)
