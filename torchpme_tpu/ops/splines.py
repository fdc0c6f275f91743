"""Natural cubic splines and their radial Fourier transforms, jit-friendly.

TPU-native counterpart of the reference spline tier
(``/root/reference/src/torchpme/lib/splines.py:1-364``).  Differences from the
reference, driven by XLA:

* the Thomas tridiagonal solve is expressed with ``lax.scan`` instead of
  Python ``for`` loops (reference ``splines.py:117-146``), so it traces to a
  fixed-size compiled loop and can run on device;
* splines are immutable pytree dataclasses (functional core) instead of
  ``nn.Module`` with buffers;
* the cosine-integral entering the long-range tail of the radial FT uses
  ``jax.scipy.special.sici`` directly, so :func:`compute_spline_ft` is fully
  jittable (the reference must round-trip through scipy/numpy,
  ``splines.py:309-332``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array, lax
from jax.scipy import special as _jsp

__all__ = [
    "CubicSpline",
    "CubicSplineReciprocal",
    "solve_tridiagonal",
    "compute_second_derivatives",
    "compute_spline_ft",
]


def solve_tridiagonal(a: Array, b: Array, c: Array, d: Array) -> Array:
    """Solve a tridiagonal linear system with the Thomas algorithm.

    :param a: sub-diagonal, entries ``a[1..n-1]`` are used.
    :param b: main diagonal, ``b[0..n-1]``.
    :param c: super-diagonal, entries ``c[0..n-2]`` are used.
    :param d: right-hand side, ``d[0..n-1]``.
    :return: solution vector ``x`` with ``len(d)`` entries.

    Implemented as two ``lax.scan`` sweeps (forward elimination, backward
    substitution) so it compiles to a fixed-trip-count loop on TPU.
    """
    n = d.shape[0]

    def fwd(carry, abcd):
        c_prev, d_prev = carry
        ai, bi, ci, di = abcd
        denom = bi - ai * c_prev
        c_new = ci / denom
        d_new = (di - ai * d_prev) / denom
        return (c_new, d_new), (c_new, d_new)

    # First row has no sub-diagonal coupling.
    c0 = c[0] / b[0]
    d0 = d[0] / b[0]
    (_, _), (c_rest, d_rest) = lax.scan(
        fwd, (c0, d0), (a[1:], b[1:], c[1:], d[1:])
    )
    c_prime = jnp.concatenate([c0[None], c_rest])
    d_prime = jnp.concatenate([d0[None], d_rest])
    # zero out the (unused) last super-diagonal coefficient like the textbook
    # algorithm so backward substitution starts from x[n-1] = d'[n-1]
    c_prime = c_prime.at[n - 1].set(0.0)

    def bwd(x_next, cd):
        ci, di = cd
        x_i = di - ci * x_next
        return x_i, x_i

    _, xs_rev = lax.scan(
        bwd, d_prime[-1], (c_prime[:-1][::-1], d_prime[:-1][::-1])
    )
    return jnp.concatenate([xs_rev[::-1], d_prime[-1][None]])


def compute_second_derivatives(x_points: Array, y_points: Array) -> Array:
    """Second derivatives of a natural cubic spline through ``(x, y)`` points.

    Natural boundary conditions (zero curvature at both ends). Parity with
    reference ``lib/splines.py:149-188`` but fully vectorized.
    """
    x = jnp.asarray(x_points)
    y = jnp.asarray(y_points)
    h = x[1:] - x[:-1]
    dy = (y[1:] - y[:-1]) / h

    n = x.shape[0]
    zeros = jnp.zeros_like(x)
    a = zeros.at[1 : n - 1].set(h[:-1] / 6)
    b = jnp.ones_like(x).at[1 : n - 1].set((h[:-1] + h[1:]) / 3)
    c = zeros.at[1 : n - 1].set(h[1:] / 6)
    d = zeros.at[1 : n - 1].set(dy[1:] - dy[:-1])
    return solve_tridiagonal(a, b, c, d)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CubicSpline:
    """Natural cubic spline of a real-valued function, as an immutable pytree.

    Counterpart of reference ``lib/splines.py:4-40``.  Construct with
    :meth:`from_points`; evaluation is a pure function of the pytree leaves,
    so instances can be passed through ``jit`` / ``vmap`` / ``grad``.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> x = jnp.linspace(0.0, 2.0 * jnp.pi, 200)
    >>> spline = CubicSpline.from_points(x, jnp.sin(x))
    >>> print(f"{float(spline(jnp.asarray(jnp.pi / 2))):.5f}")
    1.00000
    """

    x_points: Array
    y_points: Array
    d2y_points: Array

    @classmethod
    def from_points(cls, x_points: Array, y_points: Array) -> "CubicSpline":
        x_points = jnp.asarray(x_points)
        y_points = jnp.asarray(y_points)
        return cls(x_points, y_points, compute_second_derivatives(x_points, y_points))

    def __call__(self, x: Array) -> Array:
        i = jnp.searchsorted(self.x_points, x, side="right") - 1
        i = jnp.clip(i, 0, self.x_points.shape[0] - 2)
        h = self.x_points[i + 1] - self.x_points[i]
        t_hi = (self.x_points[i + 1] - x) / h
        t_lo = (x - self.x_points[i]) / h
        h2over6 = h * h / 6
        return t_hi * (
            self.y_points[i] + (t_hi * t_hi - 1) * self.d2y_points[i] * h2over6
        ) + t_lo * (
            self.y_points[i + 1] + (t_lo * t_lo - 1) * self.d2y_points[i + 1] * h2over6
        )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CubicSplineReciprocal:
    """Cubic spline on a ``1/x`` axis, converging smoothly to zero at infinity.

    Counterpart of reference ``lib/splines.py:43-114``: the long-range branch
    splines :math:`y(1/x)` (zero-extended to ``x → ∞``), and a small direct
    spline bridges the gap between the first grid point and zero.
    """

    rev_spline: CubicSpline
    zero_spline: CubicSpline

    @classmethod
    def from_points(
        cls,
        x_points: Array,
        y_points: Array,
        y_at_zero: Array | float | None = None,
    ) -> "CubicSplineReciprocal":
        x_points = jnp.asarray(x_points)
        y_points = jnp.asarray(y_points)
        ix = jnp.concatenate(
            [jnp.zeros((1,), dtype=x_points.dtype), 1.0 / x_points[::-1]]
        )
        iy = jnp.concatenate([jnp.zeros((1,), dtype=y_points.dtype), y_points[::-1]])
        rev = CubicSpline.from_points(ix, iy)

        if y_at_zero is None:
            y_at_zero = y_points[0]
        zero = CubicSpline.from_points(
            jnp.stack(
                [jnp.zeros((), dtype=x_points.dtype), x_points[0], x_points[1]]
            ),
            jnp.stack([jnp.asarray(y_at_zero, dtype=y_points.dtype), y_points[0], y_points[1]]),
        )
        return cls(rev, zero)

    def __call__(self, x: Array) -> Array:
        x_lo = self.zero_spline.x_points[1]
        safe_x = jnp.where(x < x_lo, x_lo, x)
        return jnp.where(
            x < x_lo, self.zero_spline(x), self.rev_spline(1.0 / safe_x)
        )


def compute_spline_ft(
    k_points: Array,
    x_points: Array,
    y_points: Array,
    d2y_points: Array,
) -> Array:
    r"""Radial Fourier transform of a cubic-splined function.

    Evaluates :math:`\hat f(k) = 4\pi\int dr\, \frac{\sin kr}{k} r f(r)` where
    :math:`f` is the natural cubic spline through ``(x, y)`` with curvatures
    ``d2y``, plus an analytic :math:`1/x`-spline tail correction from the last
    grid point to infinity (the tail matters for Coulomb-like kernels no
    matter how far the real-space grid extends).

    Parity with reference ``lib/splines.py:193-364``; the per-interval
    integral has a removable :math:`k^{-6}` pole handled by (a) a Horner form,
    (b) trig-identity differences for :math:`\cos/\sin` increments, and (c) an
    analytic ``k → 0`` limit.  Unlike the reference this is fully jittable
    because ``sici`` is a JAX primitive.
    """
    dtype = x_points.dtype
    k = k_points.reshape(-1, 1).astype(dtype)
    ri = x_points[None, :-1]
    yi = y_points[None, :-1]
    d2yi = d2y_points[None, :-1]
    dr = x_points[None, 1:] - x_points[None, :-1]
    dy = y_points[None, 1:] - y_points[None, :-1]
    dd2y = d2y_points[None, 1:] - d2y_points[None, :-1]

    cos_i = jnp.cos(k * ri)
    sin_i = jnp.sin(k * ri)
    # increments cos(k(r+dr)) - cos(kr), sin(k(r+dr)) - sin(kr) computed via
    # product identities: numerically stable for small k·dr
    half = k * dr / 2
    dcos = 2 * jnp.sin(half) * jnp.sin(k * (dr / 2 + ri))
    dsin = -2 * jnp.sin(half) * jnp.cos(k * (dr / 2 + ri))

    # Per-interval integral ∫ spline_i(r) · 4π r sin(kr)/k dr in Horner form in
    # k; the overall k^-6 division is applied at the end, conditionally on k≠0.
    poly = 24 * dcos * dd2y + k * (
        6 * dsin * (3 * d2yi * dr + dd2y * (4 * dr + ri))
        - 24 * dd2y * dr * sin_i
        + k
        * (
            6 * cos_i * dr * (3 * d2yi * dr + dd2y * (2 * dr + ri))
            - 2 * dcos * (6 * dy + dr * ((6 * d2yi + 5 * dd2y) * dr + 3 * (d2yi + dd2y) * ri))
            + k
            * (
                dr
                * (12 * dy + 3 * d2yi * dr * (dr + 2 * ri) + dd2y * dr * (2 * dr + 3 * ri))
                * sin_i
                + dsin
                * (
                    -6 * dy * ri
                    - 3 * d2yi * dr**2 * (dr + ri)
                    - 2 * dd2y * dr**2 * (dr + ri)
                    - 6 * dr * (2 * dy + yi)
                )
                + k
                * (
                    6 * dcos * dr * (dr + ri) * (dy + yi)
                    + cos_i * (6 * dr * ri * yi - 6 * dr * (dr + ri) * (dy + yi))
                )
            )
        )
    )

    # Tail: spline the last two points on a 1/r axis (plus the implicit zero at
    # infinity) and integrate analytically from r_N to ∞.  Contains Ci(k·r_N).
    tail_d2y = compute_second_derivatives(
        jnp.stack(
            [jnp.zeros((), dtype=dtype), 1.0 / x_points[-1], 1.0 / x_points[-2]]
        ),
        jnp.stack([jnp.zeros((), dtype=dtype), y_points[-1], y_points[-2]]),
    )
    r_n = x_points[-1]
    y_n = y_points[-1]
    d2y_n = tail_d2y[1]
    _, cosint = _jsp.sici(k * r_n)
    # tail contribution, pre-multiplied by k**2 to keep the pole removable
    tail_k2 = (
        -2
        * jnp.pi
        * (
            (d2y_n - 6 * r_n**2 * y_n) * jnp.cos(k * r_n)
            + d2y_n * k * r_n * (k * r_n * cosint - jnp.sin(k * r_n))
        )
    ) / (3.0 * r_n)

    interval_sum = jnp.pi * 2 / 3 * jnp.sum(poly / dr, axis=1).reshape(-1, 1)
    # analytic k → 0 limit of the per-interval integrals (finite: the k^-6
    # divergence cancels against the numerator zeros)
    limit_k0 = jnp.sum(
        -(
            dr
            * jnp.pi
            * (
                3 * d2yi * dr**2 * (3 * dr**2 + 10 * dr * ri + 10 * ri**2)
                + dd2y * dr**2 * (5 * dr**2 + 16 * dr * ri + 15 * ri**2)
                - 30
                * (
                    6 * ri**2 * (dy + 2 * yi)
                    + 4 * dr * ri * (2 * dy + 3 * yi)
                    + dr**2 * (3 * dy + 4 * yi)
                )
            )
        )
        / 90,
        axis=1,
    )

    safe_k = jnp.where(k == 0, 1.0, k)
    out = jnp.where(
        k == 0,
        limit_k0.reshape(-1, 1),
        interval_sum / safe_k**6 + tail_k2 / safe_k**2,
    )
    return out.reshape(k_points.shape).astype(k_points.dtype)
