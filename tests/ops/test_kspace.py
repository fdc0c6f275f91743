"""K-space filter tests (parity with reference ``tests/lib/test_kspace_filter.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import CoulombPotential
from torchpme_tpu.ops import (
    KSpaceFilter,
    P3MKSpaceFilter,
    apply_kspace_filter,
    apply_kspace_filter_dft,
    compute_kspace_filter,
    p3m_influence_function,
)


class UnitKernel:
    def kernel_from_k_sq(self, k_sq):
        return jnp.ones_like(k_sq)


class GaussianKernel:
    def __init__(self, sigma):
        self.sigma = sigma

    def kernel_from_k_sq(self, k_sq):
        return jnp.exp(-0.5 * self.sigma**2 * k_sq)


@pytest.fixture
def mesh_field():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(2, 8, 16, 12)))


def test_unit_kernel_is_identity(mesh_field):
    cell = jnp.eye(3) * 4.0
    kf = KSpaceFilter(cell, (8, 16, 12), UnitKernel(), "backward", "forward")
    n_mesh = 8 * 16 * 12
    # backward/forward pair is unnormalized both ways → n_mesh × identity
    np.testing.assert_allclose(kf(mesh_field), mesh_field * n_mesh, rtol=1e-9)
    kf2 = KSpaceFilter(cell, (8, 16, 12), UnitKernel(), "ortho", "ortho")
    np.testing.assert_allclose(kf2(mesh_field), mesh_field, rtol=1e-9)


def test_gaussian_filter_conserves_mass(mesh_field):
    cell = jnp.eye(3) * 4.0
    kf = KSpaceFilter(cell, (8, 16, 12), GaussianKernel(0.4), "ortho", "ortho")
    out = kf(mesh_field)
    np.testing.assert_allclose(
        out.sum(axis=(1, 2, 3)), mesh_field.sum(axis=(1, 2, 3)), rtol=1e-9
    )


def test_dft_matches_fft(mesh_field):
    rng = np.random.default_rng(1)
    filt = jnp.asarray(rng.normal(size=(8, 16, 7)))
    a = apply_kspace_filter(mesh_field, filt, "backward", "forward")
    b = apply_kspace_filter_dft(mesh_field, filt)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8 * float(jnp.abs(a).max()))


def test_potential_as_kernel():
    """Any Potential satisfies the KSpaceKernel protocol."""
    cell = jnp.eye(3) * 4.0
    pot = CoulombPotential(smearing=0.5)
    filt = compute_kspace_filter(pot.kernel_from_k_sq, cell, (8, 8, 8))
    assert filt.shape == (8, 8, 5)
    assert float(filt[0, 0, 0]) == 0.0  # k=0 zeroed


def test_p3m_influence_mode0_is_inverse_u2():
    cell = jnp.eye(3) * 4.0
    ns = (8, 8, 8)
    inf = p3m_influence_function(cell, ns, interpolation_nodes=3, mode=0)
    assert inf.shape == (8, 8, 5)
    assert float(inf[0, 0, 0]) == pytest.approx(1.0)  # sinc(0)^... = 1
    assert np.all(np.asarray(inf) >= 1.0 - 1e-12)  # 1/U² ≥ 1


@pytest.mark.parametrize("mode", [1, 2, 3])
@pytest.mark.parametrize("diff_order", [1, 2, 6])
def test_p3m_influence_other_modes_finite(mode, diff_order):
    cell = jnp.eye(3) * 4.0
    inf = p3m_influence_function(
        cell, (8, 8, 8), 3, mode=mode, differential_order=diff_order
    )
    assert np.all(np.isfinite(np.asarray(inf)))


def test_p3m_influence_cell_gradient_consistent():
    """Cell gradients of the P3M influence function must agree between eager
    vjp, jvp, jitted vjp, and finite differences on a TRICLINIC cell.

    Regression: a triclinic k-grid produces accidental near-zero k·h entries
    (~1e-17) where the quotient-rule derivative of sinc suffers catastrophic
    cancellation — each AD mode produced different O(1)-to-O(1e16) garbage
    (the jit one broke P3M stress by ~60 absolute).  Fixed by the Taylor
    branch in ``torchpme_tpu.ops.kspace._sinc``.
    """
    cell = (jnp.eye(3) * 10.0).at[1, 0].add(0.8).at[2, 1].add(-0.5)
    ns = (128, 16, 16)
    proj = jax.random.normal(jax.random.PRNGKey(0), (128, 16, 9))

    def f(c):
        return jnp.sum(p3m_influence_function(c, ns, 3, mode=0) * proj)

    tangent = jnp.zeros((3, 3)).at[1, 0].set(1.0)
    _, jvp_val = jax.jvp(f, (cell,), (tangent,))
    g_eager = jax.grad(f)(cell)
    g_jit = jax.jit(jax.grad(f))(cell)
    eps = 1e-5
    fd = (f(cell.at[1, 0].add(eps)) - f(cell.at[1, 0].add(-eps))) / (2 * eps)
    for name, val in (
        ("jvp", jvp_val),
        ("eager vjp", g_eager[1, 0]),
        ("jit vjp", g_jit[1, 0]),
    ):
        np.testing.assert_allclose(
            float(val), float(fd), rtol=1e-6,
            err_msg=f"{name} cell gradient diverged from finite differences",
        )
    np.testing.assert_allclose(np.asarray(g_jit), np.asarray(g_eager), rtol=1e-10)


def test_p3m_filter_class(mesh_field):
    cell = jnp.eye(3) * 4.0
    kf = P3MKSpaceFilter(
        cell, (8, 16, 12), interpolation_nodes=3, kernel=GaussianKernel(0.4)
    )
    out = kf(mesh_field)
    assert out.shape == mesh_field.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_invalid_options():
    cell = jnp.eye(3)
    with pytest.raises(ValueError, match="Invalid option"):
        KSpaceFilter(cell, (4, 4, 4), UnitKernel(), fft_norm="spam")
    with pytest.raises(ValueError, match="`mode` should be one of"):
        P3MKSpaceFilter(cell, (4, 4, 4), 3, UnitKernel(), mode=7)
    with pytest.raises(ValueError, match="differential_order"):
        P3MKSpaceFilter(cell, (4, 4, 4), 3, UnitKernel(), differential_order=0)
    with pytest.raises(ValueError, match="4 dimensional"):
        apply_kspace_filter(jnp.zeros((4, 4, 4)), jnp.zeros((4, 4, 3)))
    with pytest.raises(ValueError, match="inconsistent"):
        apply_kspace_filter(jnp.zeros((1, 4, 4, 4)), jnp.zeros((4, 4, 9)))


def test_kspace_filter_nan_guard_under_jit():
    """The NaN guard is always-on (reference parity): raises eagerly, and
    under jit it fires at run time through a debug callback instead of
    breaking the trace."""
    class UnitKernel:
        def kernel_from_k_sq(self, k_sq):
            return jnp.ones_like(k_sq)

    kf = KSpaceFilter(jnp.eye(3), (4, 4, 4), UnitKernel())
    field = jnp.arange(64.0).reshape(1, 4, 4, 4)
    np.testing.assert_allclose(jax.jit(kf)(field), field, atol=1e-10)

    bad = field.at[0, 0, 0, 0].set(jnp.nan)
    with pytest.raises(ValueError, match="NaNs detected"):
        kf(bad)
    with pytest.raises(Exception, match="NaNs detected|callback"):
        jax.block_until_ready(jax.jit(kf)(bad))
