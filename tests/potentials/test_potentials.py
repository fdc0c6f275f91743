"""Potential-function tests (parity with reference ``tests/test_potentials.py``):
SR + LR = full split, reduction of 1/r^p to closed forms, FT consistency,
combined-potential algebra, exclusion cutoff, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from torchpme_tpu.potentials import (
    CombinedPotential,
    CoulombPotential,
    InversePowerLawPotential,
    PotentialDipole,
    SplinePotential,
)

SMEARINGS = [0.5, 1.0, 1.5]
DISTS = jnp.linspace(0.3, 6.0, 128)


@pytest.mark.parametrize("smearing", SMEARINGS)
@pytest.mark.parametrize("exponent", [1, 2, 3, 4, 5, 6])
def test_sr_plus_lr_is_full(smearing, exponent):
    pot = InversePowerLawPotential(exponent=exponent, smearing=smearing)
    total = pot.sr_from_dist(DISTS) + pot.lr_from_dist(DISTS)
    np.testing.assert_allclose(total, pot.from_dist(DISTS), rtol=1e-10)


@pytest.mark.parametrize("smearing", SMEARINGS)
def test_inverse_power_law_p1_matches_coulomb(smearing):
    ipl = InversePowerLawPotential(exponent=1, smearing=smearing)
    clb = CoulombPotential(smearing=smearing)
    np.testing.assert_allclose(
        ipl.lr_from_dist(DISTS), clb.lr_from_dist(DISTS), rtol=1e-12
    )
    k_sq = jnp.linspace(0.0, 20.0, 64)
    np.testing.assert_allclose(
        ipl.lr_from_k_sq(k_sq), clb.lr_from_k_sq(k_sq), rtol=1e-12
    )
    np.testing.assert_allclose(
        ipl.self_contribution(), clb.self_contribution(), rtol=1e-12
    )
    np.testing.assert_allclose(
        ipl.background_correction(), clb.background_correction(), rtol=1e-12
    )


def test_coulomb_lr_is_erf_over_r():
    smearing = 0.8
    pot = CoulombPotential(smearing=smearing)
    expected = scipy.special.erf(np.asarray(DISTS) / smearing / np.sqrt(2)) / np.asarray(
        DISTS
    )
    np.testing.assert_allclose(pot.lr_from_dist(DISTS), expected, rtol=1e-12)


def test_coulomb_ft_formula_and_k0():
    smearing = 1.2
    pot = CoulombPotential(smearing=smearing)
    k_sq = jnp.asarray([0.0, 0.5, 1.0, 7.3])
    vals = pot.lr_from_k_sq(k_sq)
    assert float(vals[0]) == 0.0
    expected = 4 * np.pi * np.exp(-0.5 * smearing**2 * np.asarray(k_sq[1:])) / np.asarray(
        k_sq[1:]
    )
    np.testing.assert_allclose(vals[1:], expected, rtol=1e-12)


def test_coulomb_k0_gradient_not_nan():
    """The double-where trick must keep d/dσ finite at k=0."""
    pot_grad = jax.grad(
        lambda s: CoulombPotential(smearing=s).lr_from_k_sq(jnp.zeros(1)).sum()
    )(1.0)
    assert np.isfinite(pot_grad)


@pytest.mark.parametrize("exponent", [4, 5, 6])
def test_ipl_k0_limit_p_gt_3(exponent):
    """For p > 3 the k→0 limit is finite and continuous."""
    pot = InversePowerLawPotential(exponent=exponent, smearing=1.0)
    at_zero = pot.lr_from_k_sq(jnp.zeros(1))[0]
    # the kernel has a √x cusp at x = σ²k²/2 → continuity only to O(√x)
    near_zero = pot.lr_from_k_sq(jnp.asarray([1e-8]))[0]
    np.testing.assert_allclose(at_zero, near_zero, rtol=1e-3)
    assert np.isfinite(float(at_zero))


def test_exclusion_radius_zeroes_local_region():
    pot = CoulombPotential(smearing=1.0, exclusion_radius=2.0)
    # inside: SR = -LR·f_cut; combined with k-space LR the total vanishes as
    # f_cut → 1 (at r → 0)
    f = pot.f_cutoff(jnp.asarray([0.0, 1.0, 1.999, 2.5]))
    assert float(f[0]) == pytest.approx(1.0)
    assert float(f[2]) == pytest.approx(0.0, abs=1e-5)
    assert float(f[3]) == 0.0


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_exclusion_degree_sharpness(degree):
    pot = CoulombPotential(smearing=1.0, exclusion_radius=1.0, exclusion_degree=degree)
    r = jnp.asarray([0.5])
    expected = 1 - ((1 - np.cos(np.pi * 0.5)) / 2) ** degree
    np.testing.assert_allclose(pot.f_cutoff(r), expected, rtol=1e-12)


def test_combined_potential_weighted_sum():
    p1 = InversePowerLawPotential(exponent=1, smearing=1.0)
    p2 = InversePowerLawPotential(exponent=2, smearing=1.0)
    combined = CombinedPotential(
        [p1, p2], initial_weights=jnp.asarray([2.0, -0.5]), smearing=1.0
    )
    expected = 2.0 * p1.lr_from_dist(DISTS) - 0.5 * p2.lr_from_dist(DISTS)
    np.testing.assert_allclose(combined.lr_from_dist(DISTS), expected, rtol=1e-12)
    k_sq = jnp.linspace(0.1, 5.0, 16)
    expected_k = 2.0 * p1.lr_from_k_sq(k_sq) - 0.5 * p2.lr_from_k_sq(k_sq)
    np.testing.assert_allclose(combined.lr_from_k_sq(k_sq), expected_k, rtol=1e-12)


def test_combined_potential_weights_trainable():
    """Weights are pytree leaves: gradients flow through them."""
    p1 = CoulombPotential(smearing=1.0)
    p2 = InversePowerLawPotential(exponent=2, smearing=1.0)
    combined = CombinedPotential([p1, p2], smearing=1.0)

    def loss(pot):
        return pot.lr_from_dist(DISTS).sum()

    grads = jax.grad(loss)(combined)
    assert grads.weights.shape == (2,)
    assert np.all(np.isfinite(grads.weights))


def test_combined_potential_validation():
    direct = CoulombPotential()
    separated = CoulombPotential(smearing=1.0)
    with pytest.raises(ValueError, match="Cannot combine direct"):
        CombinedPotential([direct, separated], smearing=1.0)
    with pytest.raises(ValueError, match="should specify a `smearing`"):
        CombinedPotential([separated, separated])
    with pytest.raises(ValueError, match="Cannot specify `smearing`"):
        CombinedPotential([direct, direct], smearing=1.0)
    with pytest.raises(ValueError, match="number of initial weights"):
        CombinedPotential(
            [separated], initial_weights=jnp.ones(3), smearing=1.0
        )


def test_spline_potential_matches_coulomb_lr():
    """Splining the Coulomb LR part reproduces both real and k-space kernels."""
    smearing = 1.0
    coulomb = CoulombPotential(smearing=smearing)
    r_grid = jnp.geomspace(0.1, 20.0, 512)
    y_grid = coulomb.lr_from_dist(r_grid)
    spline = SplinePotential(r_grid, y_grid, reciprocal=True)
    r_test = jnp.linspace(0.2, 15.0, 64)
    np.testing.assert_allclose(
        spline.lr_from_dist(r_test), coulomb.lr_from_dist(r_test), rtol=1e-5
    )
    # the splined radial FT is accurate in absolute terms; the Gaussian decay
    # makes relative comparison meaningless in the tail
    k_sq_test = jnp.linspace(0.5, 10.0, 32)
    np.testing.assert_allclose(
        spline.lr_from_k_sq(k_sq_test),
        coulomb.lr_from_k_sq(k_sq_test),
        atol=1e-2,
    )


def test_spline_potential_explicit_kernels():
    r_grid = jnp.linspace(0.1, 5.0, 32)
    y_grid = jnp.exp(-r_grid)
    k_grid = jnp.linspace(0.0, 4.0, 16)
    yhat_grid = jnp.exp(-(k_grid**2))
    pot = SplinePotential(r_grid, y_grid, k_grid=k_grid, yhat_grid=yhat_grid)
    np.testing.assert_allclose(
        pot.lr_from_k_sq(k_grid**2), yhat_grid, rtol=1e-10
    )


def test_coulomb_sr_derivative_matches_autodiff():
    """The analytic MD-fast-path hook must equal d(sr_from_dist)/dr."""
    for smearing, prefactor in ((1.0, 1.0), (0.43, 2.5)):
        pot = CoulombPotential(smearing=smearing, prefactor=prefactor)
        r = jnp.linspace(0.3, 6.0, 64)
        sr = pot.sr_from_dist(r)
        analytic = pot.sr_derivative(r, sr)
        autodiff = jax.vmap(jax.grad(lambda x: pot.sr_from_dist(x)))(r)
        # atol floors the erfc-underflow tail (values ~1e-18 at r >> sigma)
        np.testing.assert_allclose(
            np.asarray(analytic), np.asarray(autodiff), rtol=1e-12, atol=1e-16
        )


def test_coulomb_sr_pair_force_matches_derivative():
    """sr_pair_force(d, vq, vq*V) must equal vq * sr_derivative(d, V)."""
    for smearing, prefactor in ((1.0, 1.0), (0.43, 2.5)):
        pot = CoulombPotential(smearing=smearing, prefactor=prefactor)
        r = jnp.linspace(0.3, 6.0, 64)
        vq = jnp.linspace(-2.0, 2.0, 64)
        sr = pot.sr_from_dist(r)
        np.testing.assert_allclose(
            np.asarray(pot.sr_pair_force(r, vq, vq * sr)),
            np.asarray(vq * pot.sr_derivative(r, sr)),
            rtol=1e-12,
            atol=1e-16,
        )


def test_ipl_sr_hooks_match_autodiff():
    """The 1/r^p analytic MD-fast-path hooks must equal d(sr_from_dist)/dr
    at every closed-form exponent (Coulomb is the p = 1 case)."""
    from torchpme_tpu.potentials import InversePowerLawPotential

    r = jnp.linspace(0.3, 6.0, 64)
    vq = jnp.linspace(-2.0, 2.0, 64)
    for p in range(1, 7):
        pot = InversePowerLawPotential(exponent=p, smearing=0.9, prefactor=1.7)
        sr = pot.sr_from_dist(r)
        analytic = pot.sr_derivative(r, sr)
        autodiff = jax.vmap(jax.grad(lambda x: pot.sr_from_dist(x)))(r)
        np.testing.assert_allclose(
            np.asarray(analytic), np.asarray(autodiff), rtol=1e-11, atol=1e-16,
            err_msg=f"exponent {p}",
        )
        np.testing.assert_allclose(
            np.asarray(pot.sr_pair_force(r, vq, vq * sr)),
            np.asarray(vq * analytic),
            rtol=1e-11,
            atol=1e-16,
            err_msg=f"exponent {p}",
        )


def test_combined_sr_derivative_matches_autodiff():
    """A concrete CombinedPotential exposes the analytic hook as the
    weight-folded sum of its members'; members without the hook disable it."""
    from torchpme_tpu.potentials import (
        CombinedPotential,
        InversePowerLawPotential,
        SplinePotential,
    )

    pot = CombinedPotential(
        [
            CoulombPotential(smearing=0.8),
            InversePowerLawPotential(exponent=4, smearing=0.8),
        ],
        initial_weights=jnp.asarray([2.0, 0.5]),
        smearing=0.8,
    )
    r = jnp.linspace(0.3, 5.0, 48)
    analytic = pot.sr_derivative(r, pot.sr_from_dist(r))
    autodiff = jax.vmap(jax.grad(lambda x: pot.sr_from_dist(x)))(r)
    np.testing.assert_allclose(
        np.asarray(analytic), np.asarray(autodiff), rtol=1e-11, atol=1e-16
    )

    r_grid = jnp.linspace(0.1, 10.0, 256)
    spline = SplinePotential(r_grid, 1.0 / r_grid, smearing=0.8)
    no_hook = CombinedPotential(
        [CoulombPotential(smearing=0.8), spline], smearing=0.8
    )
    assert no_hook.sr_derivative is None


def test_spline_potential_prefactor_applied_once():
    """Direct-mode (smearing=None) from_dist scales linearly with prefactor.

    Regression for a prefactor**2 bug: ``from_dist`` wrapped ``prefactor``
    around ``lr_from_dist``, which already multiplies it (the reference has
    the same defect at /root/reference/src/torchpme/potentials/spline.py:136).
    """
    r_grid = jnp.geomspace(0.1, 10.0, 128)
    y_grid = 1.0 / r_grid
    base = SplinePotential(r_grid, y_grid, reciprocal=True)
    scaled = SplinePotential(r_grid, y_grid, reciprocal=True, prefactor=2.0)
    r_test = jnp.linspace(0.5, 5.0, 16)
    np.testing.assert_allclose(
        scaled.from_dist(r_test), 2.0 * base.from_dist(r_test), rtol=1e-12
    )
    np.testing.assert_allclose(
        scaled.lr_from_dist(r_test), 2.0 * base.lr_from_dist(r_test), rtol=1e-12
    )
    np.testing.assert_allclose(
        scaled.lr_from_k_sq(r_test**2), 2.0 * base.lr_from_k_sq(r_test**2),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        scaled.self_contribution(), 2.0 * base.self_contribution(), rtol=1e-12
    )


def test_spline_potential_grid_mismatch():
    with pytest.raises(ValueError, match="mismatch"):
        SplinePotential(jnp.linspace(0.1, 1, 8), jnp.zeros(7))
    with pytest.raises(ValueError, match="Positive-valued radial grid"):
        SplinePotential(jnp.linspace(0.0, 1, 8), jnp.zeros(8), reciprocal=True)


def test_dipole_sr_plus_lr_is_full():
    pot = PotentialDipole(smearing=1.0)
    rng = np.random.default_rng(0)
    vectors = jnp.asarray(rng.normal(size=(32, 3))) * 2.0
    total = pot.sr_from_dist(vectors) + pot.lr_from_dist(vectors)
    np.testing.assert_allclose(total, pot.from_dist(vectors), rtol=1e-8, atol=1e-10)


def test_dipole_full_kernel_values():
    pot = PotentialDipole()
    v = jnp.asarray([[2.0, 0.0, 0.0]])
    kernel = pot.from_dist(v)[0]
    # along x: V_xx = 1/r³ − 3/r³ = −2/8; V_yy = V_zz = 1/8
    np.testing.assert_allclose(kernel, np.diag([-2 / 8, 1 / 8, 1 / 8]), atol=1e-12)


def test_potentials_jit_and_vmap():
    pot = InversePowerLawPotential(exponent=2, smearing=0.7)
    eager = pot.lr_from_dist(DISTS)
    jitted = jax.jit(lambda p, d: p.lr_from_dist(d))(pot, DISTS)
    np.testing.assert_allclose(eager, jitted, rtol=1e-12)
    batched = jax.vmap(pot.lr_from_dist)(jnp.stack([DISTS, DISTS * 2]))
    np.testing.assert_allclose(batched[0], eager, rtol=1e-12)


def test_unset_smearing_raises():
    pot = CoulombPotential()
    with pytest.raises(ValueError, match="smearing"):
        pot.lr_from_dist(DISTS)
    with pytest.raises(ValueError, match="smearing"):
        pot.lr_from_k_sq(DISTS)
    with pytest.raises(ValueError, match="smearing"):
        pot.self_contribution()
    with pytest.raises(ValueError, match="smearing"):
        pot.background_correction()
    with pytest.raises(ValueError, match="exclusion_radius"):
        pot.f_cutoff(DISTS)
