"""Spline tests (parity with reference ``tests/lib/test_splines.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu.ops import (
    CubicSpline,
    CubicSplineReciprocal,
    compute_second_derivatives,
    compute_spline_ft,
    solve_tridiagonal,
)


def test_tridiagonal_solver_against_dense():
    rng = np.random.default_rng(0)
    n = 12
    a = rng.uniform(0.1, 1, n)
    b = rng.uniform(2, 3, n)  # diagonally dominant
    c = rng.uniform(0.1, 1, n)
    d = rng.uniform(-1, 1, n)
    dense = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
    expected = np.linalg.solve(dense, d)
    result = solve_tridiagonal(*map(jnp.asarray, (a, b, c, d)))
    np.testing.assert_allclose(result, expected, rtol=1e-12)


def test_second_derivatives_match_scipy():
    from scipy.interpolate import CubicSpline as ScipyCubicSpline

    x = jnp.linspace(0, 2 * jnp.pi, 32)
    y = jnp.sin(x)
    d2y = compute_second_derivatives(x, y)
    ref = ScipyCubicSpline(np.asarray(x), np.asarray(y), bc_type="natural")
    np.testing.assert_allclose(
        d2y, ref(np.asarray(x), 2), rtol=1e-9, atol=1e-12
    )


def test_cubic_spline_interpolates_sine():
    x = jnp.linspace(0, 2 * jnp.pi, 128)
    spline = CubicSpline.from_points(x, jnp.sin(x))
    xq = jnp.linspace(0.01, 2 * jnp.pi - 0.01, 500)
    np.testing.assert_allclose(spline(xq), jnp.sin(xq), atol=5e-7)


def test_cubic_spline_gradient():
    x = jnp.linspace(0, 2 * jnp.pi, 256)
    spline = CubicSpline.from_points(x, jnp.sin(x))
    xq = jnp.linspace(0.5, 5.5, 40)
    grads = jax.vmap(jax.grad(spline))(xq)
    np.testing.assert_allclose(grads, jnp.cos(xq), atol=5e-5)


def test_reciprocal_spline_long_range_tail():
    """1/x-axis spline must track a Coulomb-like tail and vanish at infinity."""
    x = jnp.geomspace(0.5, 50.0, 128)
    y = 1.0 / x
    spline = CubicSplineReciprocal.from_points(x, y)
    xq = jnp.geomspace(0.6, 40.0, 100)
    np.testing.assert_allclose(spline(xq), 1.0 / xq, rtol=1e-6)
    # converges to zero beyond the grid
    assert abs(float(spline(jnp.asarray(1e5)))) < 1e-4


def test_spline_ft_matches_gaussian():
    r"""FT of exp(-r²/2σ²) is (2π)^{3/2} σ³ exp(-k²σ²/2) (4π∫ sin(kr)/k r f dr)."""
    sigma = 1.0
    x = jnp.linspace(1e-4, 12.0, 512)
    y = jnp.exp(-0.5 * x**2 / sigma**2)
    d2y = compute_second_derivatives(x, y)
    k = jnp.linspace(0.0, 6.0, 50)
    ft = compute_spline_ft(k, x, y, d2y)
    expected = (2 * jnp.pi) ** 1.5 * sigma**3 * jnp.exp(-0.5 * k**2 * sigma**2)
    np.testing.assert_allclose(ft, expected, atol=2e-4 * float(expected[0]))


def test_spline_ft_is_jittable():
    x = jnp.linspace(1e-4, 8.0, 64)
    y = jnp.exp(-(x**2))
    d2y = compute_second_derivatives(x, y)
    k = jnp.linspace(0.0, 4.0, 16)
    eager = compute_spline_ft(k, x, y, d2y)
    jitted = jax.jit(compute_spline_ft)(k, x, y, d2y)
    np.testing.assert_allclose(eager, jitted, rtol=1e-12)


@pytest.mark.parametrize("high_accuracy", [True, False])
def test_spline_ft_k0_limit(high_accuracy):
    """k=0 entry equals the analytic 4π ∫ r² f(r) dr limit."""
    x = jnp.linspace(1e-4, 10.0, 1024 if high_accuracy else 256)
    y = jnp.exp(-0.5 * x**2)
    d2y = compute_second_derivatives(x, y)
    ft0 = compute_spline_ft(jnp.zeros(1), x, y, d2y)[0]
    expected = (2 * jnp.pi) ** 1.5  # σ=1 Gaussian
    np.testing.assert_allclose(ft0, expected, rtol=1e-3)
