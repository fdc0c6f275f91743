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
