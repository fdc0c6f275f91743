"""Point-dipole pair interaction with Ewald range separation.

TPU-native counterpart of
``/root/reference/src/torchpme/potentials/potential_dipole.py``.  Like the
reference this is a standalone kernel (not a :class:`Potential` subclass): the
real-space terms are 3×3 tensors per pair acting on neighbor *vectors*, not
scalar functions of the distance.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array

from .potential import static_field

__all__ = ["PotentialDipole"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PotentialDipole:
    r"""Dipole–dipole tensor kernel
    :math:`V(\vec r) = (\vec\mu_i\cdot\vec\mu_j)/r^3 -
    3(\vec\mu_i\cdot\vec r)(\vec\mu_j\cdot\vec r)/r^5`.

    :param smearing: Gaussian width of the Ewald split (``None`` = direct).
    :param exclusion_radius: optional local-environment cutoff radius.
    :param exclusion_degree: raised-cosine cutoff exponent.
    :param epsilon: dielectric constant of the embedding medium (0 =
        vacuum/"tin-foil" boundary term disabled).
    :param prefactor: global unit prefactor.

    Example
    -------
    Two parallel unit dipoles a distance 2 apart along x (so
    :math:`V = (\mu_i\cdot\mu_j)/r^3 = 1/8` for dipoles along z):

    >>> import jax.numpy as jnp
    >>> pot = PotentialDipole()
    >>> rij = jnp.asarray([[2.0, 0.0, 0.0]])
    >>> K = pot.from_dist(rij)  # (1, 3, 3) tensor kernel
    >>> print(f"{float(K[0, 2, 2]):.4f}")
    0.1250
    """

    smearing: Array | float | None = None
    exclusion_radius: Array | float | None = None
    exclusion_degree: int = static_field(default=1)
    epsilon: Array | float = 0.0
    prefactor: Array | float = 1.0

    def f_cutoff(self, vector: Array) -> Array:
        """Raised-cosine exclusion cutoff evaluated on pair vectors."""
        if self.exclusion_radius is None:
            raise ValueError(
                "Cannot compute cutoff function when `exclusion_radius` is not set"
            )
        r_mag = jnp.linalg.norm(vector, axis=1, keepdims=True)
        r_c = self.exclusion_radius
        return jnp.where(
            r_mag < r_c,
            1 - ((1 - jnp.cos(jnp.pi * (r_mag / r_c))) * 0.5) ** self.exclusion_degree,
            0.0,
        )

    def from_dist(self, vector: Array) -> Array:
        """Full dipolar 3×3 tensor kernel per pair vector, shape (P, 3, 3)."""
        r_mag = jnp.linalg.norm(vector, axis=1, keepdims=True)
        inv_r3 = 1.0 / r_mag**3
        outer = vector[:, :, None] * vector[:, None, :]
        eye = jnp.eye(3, dtype=vector.dtype)
        return self.prefactor * (
            inv_r3[..., None] * eye[None] - 3.0 * outer / r_mag[..., None] ** 5
        )

    def sr_from_dist(self, vector: Array) -> Array:
        """Short-range tensor kernel (full minus LR, or windowed LR)."""
        if self.smearing is None:
            raise ValueError(
                "Cannot compute range-separated potential when `smearing` is "
                "not specified."
            )
        if self.exclusion_radius is None:
            return self.from_dist(vector) - self.lr_from_dist(vector)
        return -self.lr_from_dist(vector) * self.f_cutoff(vector)[..., None]

    def lr_from_dist(self, vector: Array) -> Array:
        r"""Long-range tensor kernel: the Ewald ``B(r) I − C(r) r⊗r`` split."""
        if self.smearing is None:
            raise ValueError(
                "Cannot compute long-range contribution without specifying `smearing`."
            )
        alpha = 1 / (2 * self.smearing**2)
        sqrt_alpha = jnp.sqrt(alpha)
        r_mag = jnp.linalg.norm(vector, axis=1, keepdims=True)
        r2 = r_mag**2
        outer = vector[:, :, None] * vector[:, None, :]
        erfc_term = jax.scipy.special.erfc(sqrt_alpha * r_mag)
        gauss = 2 * jnp.sqrt(alpha / jnp.pi) * jnp.exp(-alpha * r2)
        b_term = 1.0 / r_mag**3 - erfc_term / r_mag**3 - gauss / r2
        c_term = (
            3.0 / r_mag**5
            - 3.0 * erfc_term / r_mag**5
            - gauss * (2 * alpha + 3 / r2) / r2
        )
        eye = jnp.eye(3, dtype=vector.dtype)
        return self.prefactor * (
            b_term[..., None] * eye[None] - outer * c_term[..., None]
        )

    # -- scalar (B, C) forms -------------------------------------------------
    #
    # Every tensor kernel above is ``B(r)·I − C(r)·r⊗r``.  The cell-list
    # window engine (:mod:`torchpme_tpu.ops.rspace_cells_dipole`) contracts
    # the dipoles with the *scalars* instead of materializing (…, 3, 3)
    # tensors per pair: ``μᵢᵀKμⱼ = B(μᵢ·μⱼ) − C(μᵢ·r)(μⱼ·r)``.

    def scalar_kernels(self, dist: Array) -> tuple[Array, Array]:
        r"""Direct-mode ``(B, C)`` with ``B = p/r³``, ``C = 3p/r⁵``."""
        inv_r2 = 1.0 / dist**2
        b = self.prefactor * inv_r2 / dist
        return b, 3.0 * b * inv_r2

    def scalar_kernel_derivative(self, dist: Array, b: Array, c: Array) -> Array:
        r"""Direct-mode :math:`dC/dr` (note :math:`dB/dr = -C\,r` holds
        *identically* for every ``B·I − C·r⊗r`` interaction tensor that is a
        gradient field, so only ``C′`` needs a hook)."""
        del c
        return -15.0 * b / dist**3

    def window_scalar_math(self, cutoff: float):
        r"""Kernel-ready ``d -> (B, C, C')`` for the fused dipolar Pallas
        window (:mod:`torchpme_tpu.ops.pallas.window_dipole_pallas`).

        Direct mode evaluates the exact rational scalars (they are already
        transcendental-free); range-separated mode returns the
        Chebyshev/Clenshaw fits of the entire SR numerators
        (:func:`torchpme_tpu.ops.polyfit.dipole_window_scalar_math`).
        ``None`` for traced parameters, an exclusion window (its extra
        ``f(r)`` terms are not covered), or an unreachable fit tolerance.
        """
        import jax as _jax

        from ..ops.polyfit import dipole_window_scalar_math

        if self.exclusion_radius is not None:
            return None
        if any(
            isinstance(leaf, _jax.core.Tracer)
            for leaf in _jax.tree_util.tree_leaves(self)
        ):
            return None
        if self.smearing is None:
            prefactor = float(self.prefactor)

            def scalar_math(d):
                inv_d2 = 1.0 / (d * d)
                b = prefactor * inv_d2 / d
                c = 3.0 * b * inv_d2
                cp = -15.0 * b * inv_d2 / d
                return b, c, cp

            return scalar_math
        return dipole_window_scalar_math(
            self.prefactor, self.smearing, float(cutoff)
        )

    def sr_scalar_kernel_derivative(self, dist: Array, b: Array, c: Array) -> Array:
        r"""Short-range :math:`dC/dr` for the fused dipolar force pass.

        Substituting :math:`E = \mathrm{erfc}(\sqrt\alpha r)` out via the
        already-computed ``b`` collapses the derivative to one new ``exp``:

        .. math:: C' = -\Bigl(\frac{15\,B}{r^3}
                  + p\,g(r)\bigl(\tfrac{4\alpha^2}{r}
                  + \tfrac{10\alpha}{r^3}\bigr)\Bigr),
                  \quad g = 2\sqrt{\alpha/\pi}\,e^{-\alpha r^2}

        (verified against autodiff of :meth:`sr_scalar_kernels` to 3e-13).
        Valid for the pure Ewald split (``exclusion_radius`` unset) — the
        exclusion-windowed variant has extra ``f(r)`` terms and keeps the
        autodiff path.
        """
        del c
        alpha = 1 / (2 * self.smearing**2)
        gauss = 2 * jnp.sqrt(alpha / jnp.pi) * jnp.exp(-alpha * dist**2)
        return -(
            15.0 * b / dist**3
            + self.prefactor * gauss * (4 * alpha**2 / dist + 10 * alpha / dist**3)
        )

    def window_scalar_math_sq(self, dist_sq: Array) -> tuple[Array, Array, Array]:
        r"""``(B(d), C(d), C'(d)/d)`` as functions of :math:`d^2` — the
        float32 dipolar window fast path (the dipolar analog of
        :meth:`CoulombPotential.sr_window_math`).

        One shared Gaussian feeds the A&S-7.1.26 erfc, both scalars, and the
        force hook; every divide is an ``rsqrt`` power of the squared
        distance the window already has.  The exact path pays erfc + two
        ``exp`` + ``sqrt`` + a stack of divides per candidate slot.  Direct
        mode (``smearing=None``) is pure rationals of :math:`d^2`.  Valid
        only without an exclusion window (its :math:`f(r)` terms are not
        covered) — the engine's analytic gate already enforces that.
        """
        from .coulomb import erfc_f32_from_gauss

        rd = jax.lax.rsqrt(dist_sq)
        rd2 = rd * rd
        if self.smearing is None:
            b = self.prefactor * rd2 * rd
            return b, 3.0 * b * rd2, -15.0 * b * (rd2 * rd2)
        alpha = 1 / (2 * self.smearing**2)
        gauss_raw = jnp.exp(-alpha * dist_sq)
        erfc = erfc_f32_from_gauss(alpha**0.5 * (dist_sq * rd), gauss_raw)
        g = 2 * (alpha / jnp.pi) ** 0.5 * gauss_raw
        b = self.prefactor * (erfc * (rd2 * rd) + g * rd2)
        c = self.prefactor * (
            3.0 * erfc * (rd2 * rd2 * rd) + g * (2 * alpha + 3.0 * rd2) * rd2
        )
        cp_over_d = -(
            15.0 * b * (rd2 * rd2)
            + self.prefactor * g * (4 * alpha**2 * rd2 + 10 * alpha * (rd2 * rd2))
        )
        return b, c, cp_over_d

    def _lr_scalar_kernels(self, dist: Array) -> tuple[Array, Array]:
        alpha = 1 / (2 * self.smearing**2)
        r2 = dist**2
        erfc_term = jax.scipy.special.erfc(jnp.sqrt(alpha) * dist)
        gauss = 2 * jnp.sqrt(alpha / jnp.pi) * jnp.exp(-alpha * r2)
        b = 1.0 / dist**3 - erfc_term / dist**3 - gauss / r2
        c = (
            3.0 / dist**5
            - 3.0 * erfc_term / dist**5
            - gauss * (2 * alpha + 3 / r2) / r2
        )
        return self.prefactor * b, self.prefactor * c

    def sr_scalar_kernels(self, dist: Array) -> tuple[Array, Array]:
        r"""Short-range ``(B, C)`` scalars (Ewald split, or windowed LR).

        Consistent with :meth:`sr_from_dist`:
        ``sr_from_dist(v) == B(|v|)·I − C(|v|)·v⊗v`` element-wise.
        """
        if self.smearing is None:
            raise ValueError(
                "Cannot compute range-separated potential when `smearing` is "
                "not specified."
            )
        b_lr, c_lr = self._lr_scalar_kernels(dist)
        if self.exclusion_radius is None:
            b_full, c_full = self.scalar_kernels(dist)
            return b_full - b_lr, c_full - c_lr
        r_c = self.exclusion_radius
        f = jnp.where(
            dist < r_c,
            1
            - ((1 - jnp.cos(jnp.pi * (dist / r_c))) * 0.5)
            ** self.exclusion_degree,
            0.0,
        )
        return -b_lr * f, -c_lr * f

    def lr_from_k_sq(self, k_sq: Array) -> Array:
        """Same Gaussian-screened Fourier kernel as the Coulomb potential."""
        if self.smearing is None:
            raise ValueError(
                "Cannot compute long-range kernel without specifying `smearing`."
            )
        masked = jnp.where(k_sq == 0, 1.0, k_sq)  # NaN-safe backward
        return self.prefactor * jnp.where(
            k_sq == 0,
            0.0,
            4 * jnp.pi * jnp.exp(-0.5 * self.smearing**2 * masked) / masked,
        )

    def self_contribution(self) -> Array:
        if self.smearing is None:
            raise ValueError(
                "Cannot compute long-range contribution without specifying `smearing`."
            )
        alpha = 1 / (2 * self.smearing**2)
        return self.prefactor * 4 * jnp.pi / 3 * jnp.sqrt((alpha / jnp.pi) ** 3)

    def background_correction(self, volume: Array) -> Array:
        """Dielectric surface term, 4π/(2ε+1)/V (zero for ε = 0)."""
        eps = jnp.asarray(self.epsilon)
        safe = jnp.where(eps == 0.0, 1.0, 2 * eps + 1)
        return jnp.where(
            eps == 0.0, 0.0, self.prefactor * 4 * jnp.pi / safe / volume
        )
