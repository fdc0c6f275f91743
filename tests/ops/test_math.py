"""Math-kernel tests (parity with reference ``tests/lib/test_math.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from torchpme_tpu.ops import exp1, gamma, gammaincc_over_powerlaw


def finite_difference(f, x, eps=1e-6):
    return (f(x + eps) - f(x - eps)) / (2 * eps)


def test_gamma_matches_scipy():
    x = jnp.linspace(0.1, 10.0, 50)
    np.testing.assert_allclose(gamma(x), scipy.special.gamma(np.asarray(x)), rtol=1e-12)


def test_exp1_matches_scipy():
    x = jnp.logspace(-3, 2, 200)
    np.testing.assert_allclose(exp1(x), scipy.special.exp1(np.asarray(x)), rtol=1e-10)


def test_exp1_derivative():
    x = jnp.linspace(0.2, 5.0, 20)
    grads = jax.vmap(jax.grad(exp1))(x)
    expected = -jnp.exp(-x) / x
    np.testing.assert_allclose(grads, expected, rtol=1e-10)


@pytest.mark.parametrize("exponent", [1, 2, 3, 4, 5, 6])
def test_gammaincc_over_powerlaw_matches_scipy(exponent):
    """Closed forms must equal Γ(a, z) / z^a with a = (3-p)/2.

    Verified against scipy's (un)regularized upper incomplete gamma where
    a > 0, and via the recurrence Γ(a+1, z) = a Γ(a, z) + z^a e^{-z} for the
    analytic continuation to a ≤ 0.
    """
    z = np.linspace(0.05, 10.0, 64)
    ours = np.asarray(gammaincc_over_powerlaw(exponent, jnp.asarray(z)))

    a = (3 - exponent) / 2
    if a > 0:
        gam = scipy.special.gammaincc(a, z) * scipy.special.gamma(a)
    else:
        # analytic continuation via Γ(a, z) = (Γ(a+1, z) - z^a e^{-z}) / a,
        # seeded at Γ(0, z) = E1(z) (integer a) or Γ(1/2, z) (half-integer a)
        if a == int(a):
            cur, gam = 0.0, scipy.special.exp1(z)
        else:
            cur = 0.5
            gam = scipy.special.gammaincc(cur, z) * scipy.special.gamma(cur)
        while cur > a + 1e-12:
            cur -= 1.0
            gam = (gam - z**cur * np.exp(-z)) / cur
    ref = gam / z**a
    np.testing.assert_allclose(ours, ref, rtol=5e-7)


def test_gammaincc_over_powerlaw_invalid_exponent():
    with pytest.raises(ValueError, match="Unsupported exponent"):
        gammaincc_over_powerlaw(7, jnp.asarray(1.0))


@pytest.mark.parametrize("exponent", [1, 2, 3, 4, 5, 6])
def test_gammainc_over_powerlaw_matches_scipy(exponent):
    """Closed forms + small-z series must equal P(p/2, z) / z^{p/2}.

    The elementary forms replace jax.scipy's while_loop-based gammainc
    (which serializes TPU vector lanes — measured 215-375 ms per 102k-atom
    pair window at p = 2..3); the series branch covers the cancellation
    region z < 1/2 of the erf/expm1 differences."""
    from torchpme_tpu.ops.math import gammainc_over_powerlaw

    z = np.logspace(-14, 2, 200)
    ours = np.asarray(gammainc_over_powerlaw(exponent, jnp.asarray(z)))
    ref = scipy.special.gammainc(exponent / 2, z) / z ** (exponent / 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_gammainc_over_powerlaw_gradients_finite():
    from torchpme_tpu.ops.math import gammainc_over_powerlaw

    for exponent in (1, 3, 5, 6):
        for z in (1e-14, 0.3, 0.5, 0.5000001, 50.0):
            g = float(
                jax.grad(lambda x: gammainc_over_powerlaw(exponent, x))(
                    jnp.asarray(z)
                )
            )
            assert np.isfinite(g), (exponent, z, g)
    # finite-difference spot check on both sides of the series/closed seam
    for z in (0.3, 1.7):
        g = float(
            jax.grad(lambda x: gammainc_over_powerlaw(3, x))(jnp.asarray(z))
        )
        fd = float(
            gammainc_over_powerlaw(3, jnp.asarray(z + 1e-7))
            - gammainc_over_powerlaw(3, jnp.asarray(z - 1e-7))
        ) / 2e-7
        np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_gammainc_over_powerlaw_invalid_exponent():
    from torchpme_tpu.ops.math import gammainc_over_powerlaw

    with pytest.raises(ValueError, match="Unsupported exponent"):
        gammainc_over_powerlaw(7, jnp.asarray(1.0))


def test_inv3_matches_numpy():
    from torchpme_tpu.ops.math import inv3

    rng = np.random.default_rng(0)
    for _ in range(8):
        m = rng.normal(size=(3, 3)) + 3 * np.eye(3)  # well-conditioned
        np.testing.assert_allclose(
            np.asarray(inv3(jnp.asarray(m))), np.linalg.inv(m), rtol=1e-12
        )
    # differentiable: d(inv(M))/dM against the identity dA⁻¹ = -A⁻¹ dA A⁻¹
    m = jnp.asarray(rng.normal(size=(3, 3)) + 3 * np.eye(3))
    dm = jnp.asarray(rng.normal(size=(3, 3)))
    got = jax.jvp(inv3, (m,), (dm,))[1]
    inv = np.linalg.inv(np.asarray(m))
    ref = -inv @ np.asarray(dm) @ inv
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-10)


def test_exp1_f32_fast_path_matches_scipy():
    """The f32 exp1 (A&S rational forms — jax.scipy's while_loop serializes
    TPU vector lanes) must match scipy to ~1e-6 relative over the physical
    range, with the exact-derivative custom JVP."""
    x = np.logspace(-6, 1.3, 300)  # x <= 20: E1 >= 1e-10
    ours = np.asarray(exp1(jnp.asarray(x, jnp.float32))).astype(np.float64)
    ref = scipy.special.exp1(x)
    np.testing.assert_allclose(ours, ref, rtol=3e-6)
    g = jax.vmap(jax.grad(lambda v: exp1(v)))(jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(g, np.float64), -np.exp(-x) / x, rtol=1e-5
    )
    # the f64 entry point stays on jax.scipy (scipy-grade accuracy)
    o64 = np.asarray(exp1(jnp.asarray(x)))
    np.testing.assert_allclose(o64, ref, rtol=1e-12)
