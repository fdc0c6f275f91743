"""Scalar math primitives for range-separated potentials.

TPU-native counterpart of the reference math tier
(``/root/reference/src/torchpme/lib/math.py:1-104``).  Unlike the reference,
which hand-ports the E1 power series / continued fraction from scipy and wraps
it in a custom ``autograd.Function``, JAX ships differentiable
``jax.scipy.special.exp1`` natively, so the whole tier reduces to thin,
jit-friendly compositions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array
from jax.scipy import special as _jsp

__all__ = [
    "gamma",
    "exp1",
    "gammainc_over_powerlaw",
    "gammaincc_over_powerlaw",
    "CustomExp1",
    "inv3",
]


def inv3(cell: Array) -> Array:
    r"""Closed-form inverse of a 3×3 matrix (adjugate over determinant).

    ``jnp.linalg.inv`` lowers to an LU-factorization custom call (LAPACK on
    CPU) that (a) cannot ride :mod:`torchpme_tpu.deploy`'s ``jax.export``
    round-trip into a fresh process (the deserialized custom call crashes on
    current jaxlib) and (b) is a scalar library call on TPU.  Every cell
    matrix in this library is 3×3, so the branch-free cofactor form is both
    deployable and compiler-friendly; it is exact elementary arithmetic and
    fully differentiable.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> m = jnp.asarray([[2.0, 0, 0], [1, 3, 0], [0, 1, 4]])
    >>> print(bool(jnp.allclose(inv3(m) @ m, jnp.eye(3), atol=1e-6)))
    True
    """
    r0, r1, r2 = cell[0], cell[1], cell[2]
    c0 = jnp.cross(r1, r2)
    c1 = jnp.cross(r2, r0)
    c2 = jnp.cross(r0, r1)
    det = jnp.dot(r0, c0)
    return jnp.stack([c0, c1, c2], axis=-1) / det


def gamma(x: Array) -> Array:
    r"""(Complete) Gamma function :math:`\Gamma(x)` for positive arguments.

    Composed as ``exp(gammaln(x))`` so it is differentiable and jittable
    (parity with reference ``lib/math.py:5-13``).
    """
    return jnp.exp(_jsp.gammaln(x))


@jax.custom_jvp
def _exp1_f32(x: Array) -> Array:
    """f32 :math:`E_1(x)` by the Abramowitz & Stegun rational forms.

    ``jax.scipy.special.exp1`` evaluates a series / continued fraction
    under ``lax.while_loop`` — on a TPU that serializes every vector lane
    (the same pathology as ``gammainc``; this sits inside the k-space
    filter of the :math:`1/r^3` and :math:`1/r^5` potentials, evaluated
    over the whole mesh every step).  A&S 5.1.53 (x ≤ 1, abs err < 2e-7)
    and 5.1.56 (x ≥ 1, abs err < 2e-8 on :math:`x e^x E_1`) are branch-free
    polynomial/rational forms at f32 roundoff."""
    xs = jnp.maximum(x, jnp.asarray(1e-30, x.dtype))
    # x <= 1: E1 = -ln x + Σ a_k x^k  (A&S 5.1.53)
    a = (-0.57721566, 0.99999193, -0.24991055, 0.05519968, -0.00976004,
         0.00107857)
    xl = jnp.minimum(xs, 1.0)
    p_small = a[5]
    for c in a[4::-1]:
        p_small = p_small * xl + c
    small = p_small - jnp.log(xl)
    # x >= 1: E1 = e^-x/x · (x⁴ + a1 x³ + …) / (x⁴ + b1 x³ + …)
    # (A&S 5.1.56, the 4-term set: |err| < 2e-8 on x·eˣ·E1)
    a1, a2, a3, a4 = 8.5733287401, 18.0590169730, 8.6347608925, 0.2677737343
    b1, b2, b3, b4 = 9.5733223454, 25.6329561486, 21.0996530827, 3.9584969228
    xb = jnp.maximum(xs, 1.0)
    num = ((((xb + a1) * xb + a2) * xb + a3) * xb) + a4
    den = ((((xb + b1) * xb + b2) * xb + b3) * xb) + b4
    big = jnp.exp(-xb) / xb * num / den
    result = jnp.where(xs <= 1.0, small, big)
    # domain edge: E1(x) → +inf as x → 0⁺ and is undefined for x ≤ 0; match
    # the float64 path (jax.scipy exp1 returns inf at 0) instead of silently
    # returning the clamped finite value
    return jnp.where(x > 0.0, result, jnp.asarray(jnp.inf, x.dtype))


@_exp1_f32.defjvp
def _exp1_f32_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    xs = jnp.maximum(x, jnp.asarray(1e-30, x.dtype))
    return _exp1_f32(x), dx * (-jnp.exp(-xs) / xs)


def exp1(x: Array) -> Array:
    r"""Exponential integral :math:`E_1(x) = \int_x^\infty e^{-t}/t\,dt` for x > 0.

    Differentiable (:math:`dE_1/dx = -e^{-x}/x`) — the reference needed a
    hand-written ``autograd.Function`` for this (``lib/math.py:16-76``).
    float64 rides :func:`jax.scipy.special.exp1`; float32 — the fast-path
    dtype, where that function's ``while_loop`` serializes TPU vector
    lanes — uses the A&S rational forms (:func:`_exp1_f32`), accurate to
    ~2e-7 absolute (at/below f32 roundoff of the downstream filters).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> print(f"{float(exp1(jnp.asarray(1.0))):.6f}")  # E1(1) = 0.219384...
    0.219384
    """
    x = jnp.asarray(x)
    if x.dtype == jnp.float32:
        return _exp1_f32(x)
    return _jsp.exp1(x)


# Backwards-compat name mirroring the reference's private autograd class;
# in JAX the primitive is already differentiable so it is the same function.
CustomExp1 = exp1


def gammainc_over_powerlaw(exponent: int, z: Array) -> Array:
    r"""Closed forms of :math:`P(p/2, z)\,/\,z^{p/2}` (regularized LOWER
    incomplete gamma over the power law), for integer exponents ``p = 1..6``.

    This is the long-range real-space kernel of :math:`1/r^p` potentials
    (`InversePowerLawPotential.lr_from_dist`).  ``jax.scipy.special.gammainc``
    evaluates a series / continued fraction under ``lax.while_loop`` — on a
    TPU that serializes every vector lane to the slowest element (measured
    **215–375 ms** for one 102k-atom pair window at p = 2..3, ~40–60× the
    whole Coulomb window).  For half-integer ``p/2`` the function is
    elementary (erf + exp by the standard recurrence
    :math:`P(a{+}1,z) = P(a,z) - z^a e^{-z}/\Gamma(a{+}1)`), so spell the
    closed forms out like :func:`gammaincc_over_powerlaw` does for the
    upper tail.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> from jax.scipy import special as jsp
    >>> z = jnp.asarray([0.03, 0.4, 2.1, 9.0])
    >>> for p in range(1, 7):
    ...     ours = gammainc_over_powerlaw(p, z)
    ...     ref = jsp.gammainc(p / 2, z) / z ** (p / 2)
    ...     assert jnp.allclose(ours, ref, rtol=1e-6), (p, ours, ref)
    """
    if not 1 <= exponent <= 6:
        raise ValueError(f"Unsupported exponent: {exponent}")
    # The closed forms difference nearly-equal terms as z → 0 (e.g. p = 3 is
    # erf(√z) − 2√z e^{-z}/√π over z^{3/2}: both terms ~ 2√z/√π, so the
    # difference loses ~all mantissa bits below z ≈ 1e-3 in f32).  Switch to
    # the ascending series P(a,z)/z^a = e^{-z} Σ_k z^k / Γ(a+k+1) there —
    # 15 terms keep the truncation below 1e-13 relative at the z = 0.5 seam.
    import math as _math

    a = exponent / 2
    small = z < 0.5
    # clamps keep both branches finite; `where` (not min/max) so the
    # boundary z == 0.5 keeps its full cotangent in the selected branch
    # (lax.max's tie gradient is 1/2, which halved dP/dz exactly there)
    zc = jnp.where(small, 0.5, z)  # cancellation-safe closed-form domain
    zs = jnp.where(small, z, 0.5)  # convergent series domain
    sz = jnp.sqrt(zc)
    if exponent == 1:
        closed = _jsp.erf(sz) / sz
    elif exponent == 2:
        closed = -jnp.expm1(-zc) / zc
    elif exponent == 3:
        closed = (
            _jsp.erf(sz) - 2 / jnp.sqrt(jnp.pi) * sz * jnp.exp(-zc)
        ) / (zc * sz)
    elif exponent == 4:
        closed = (-jnp.expm1(-zc) - zc * jnp.exp(-zc)) / zc**2
    elif exponent == 5:
        closed = (
            _jsp.erf(sz)
            - 2 / jnp.sqrt(jnp.pi) * sz * (1 + 2 * zc / 3) * jnp.exp(-zc)
        ) / (zc**2 * sz)
    else:
        closed = (-jnp.expm1(-zc) - (zc + zc**2 / 2) * jnp.exp(-zc)) / zc**3

    series = jnp.zeros_like(z)
    for k in range(14, -1, -1):  # Horner over Σ_k z^k / Γ(a+k+1)
        series = series * zs + 1.0 / _math.gamma(a + k + 1)
    series = series * jnp.exp(-zs)
    return jnp.where(small, series, closed)


def gammaincc_over_powerlaw(exponent: int, z: Array) -> Array:
    r"""Closed forms of :math:`\Gamma(1 - p/2, z)\, z^{p/2 - 1}`-type integrals.

    Evaluates the upper-incomplete-gamma-over-power-law combination that enters
    the Fourier transform of :math:`1/r^p` potentials, for integer exponents
    ``p = 1..6`` (parity with reference ``lib/math.py:79-104``; this closed-form
    table is what limits the supported exponents).

    :param exponent: static integer exponent ``p`` of the power law.
    :param z: positive values at which to evaluate.
    """
    if exponent == 1:
        return jnp.exp(-z) / z
    if exponent == 2:
        return jnp.sqrt(jnp.pi / z) * _jsp.erfc(jnp.sqrt(z))
    if exponent == 3:
        return exp1(z)
    if exponent == 4:
        return 2 * (jnp.exp(-z) - jnp.sqrt(jnp.pi * z) * _jsp.erfc(jnp.sqrt(z)))
    if exponent == 5:
        return jnp.exp(-z) - z * exp1(z)
    if exponent == 6:
        return (
            (2 - 4 * z) * jnp.exp(-z)
            + 4 * jnp.sqrt(jnp.pi * z**3) * _jsp.erfc(jnp.sqrt(z))
        ) / 3
    raise ValueError(f"Unsupported exponent: {exponent}")
