"""Fused Pallas pair-window kernel ≡ XLA window engine (interpret mode on
CPU): value and every cotangent of the real-space window, over charge
channels, triclinic cells, split i-side charges (the sharded-slab layout),
and block padding; plus the `window_pair_math` availability gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu.ops import rspace_cells as rc
from torchpme_tpu.ops.pallas import window_pallas as wp
from torchpme_tpu.potentials import CoulombPotential


def make_system(n, box, cutoff, smearing, n_channels=1, triclinic=False, seed=0):
    rng = np.random.default_rng(seed)
    cell = np.eye(3) * box
    if triclinic:
        cell[1, 0] = 0.15 * box
        cell[2, 0] = -0.1 * box
        cell[2, 1] = 0.12 * box
    cell = jnp.asarray(cell, jnp.float32)
    positions = jnp.asarray(
        rng.uniform(0, 1, (n, 3)) @ np.asarray(cell), jnp.float32
    )
    charges = jnp.asarray(rng.normal(size=(n, n_channels)), jnp.float32)
    pot = CoulombPotential(smearing=smearing)
    clist = rc.compute_cell_list(positions, cell, cutoff)
    return pot, charges, positions, cell, clist


def check_against_xla(pot, charges, positions, cell, clist, cutoff, split=False):
    pc_t, q_g, mf_g, offs, _valid, chunks = rc._prepare(
        charges, positions, cell, clist
    )
    qi_g = None
    if split:
        rng = np.random.default_rng(42)
        mask = jnp.asarray(
            rng.uniform(size=q_g.shape[:3]) > 0.3, jnp.float32
        )[..., None, None]
        qi_g = q_g * mask
    spec = (float(clist.cutoff), chunks, True)
    e_x, g_x = rc._we_value_and_grad(spec, pot, pc_t, q_g, mf_g, offs, qi_g)
    spec_p = spec + (True,)
    e_p, g_p = wp.pallas_window_value_and_grad(
        spec_p, pot, pc_t, q_g, mf_g, offs, qi_g
    )
    np.testing.assert_allclose(e_p, e_x, rtol=2e-5)
    names = ["d_pot", "d_pc", "d_q", "d_mf", "d_offs", "d_qi"]
    # d_offs is a cancellation-heavy global reduction: both engines carry
    # ~1e-4 rel-to-peak f32 noise vs f64 truth (verified), they just order
    # the sums differently
    tols = {"d_pc": 2e-5, "d_q": 2e-5, "d_offs": 5e-4, "d_qi": 2e-5}
    for name, a, b in zip(names, g_p, g_x):
        if name in ("d_pot", "d_mf"):
            continue
        scale = max(float(jnp.max(jnp.abs(b))), 1e-12)
        np.testing.assert_allclose(
            np.asarray(a) / scale,
            np.asarray(b) / scale,
            atol=tols[name],
            err_msg=name,
        )


@pytest.mark.parametrize("n_channels", [1, 3])
def test_window_kernel_matches_xla(n_channels):
    args = make_system(600, 12.0, 3.0, 0.75, n_channels=n_channels)
    check_against_xla(*args, cutoff=3.0)


@pytest.mark.parametrize("exponent", [2, 3, 6])
def test_window_kernel_inverse_power_law(exponent):
    """The kernel pair math covers the whole 1/r^p family: the incomplete
    gamma Q(p/2, (αr)²) rides the same Chebyshev/Clenshaw treatment."""
    from torchpme_tpu.potentials import InversePowerLawPotential

    pot, charges, positions, cell, clist = make_system(
        500, 11.0, 3.0, 0.9, seed=exponent
    )
    pot = InversePowerLawPotential(
        exponent=exponent, smearing=0.9, prefactor=1.3
    )
    check_against_xla(pot, charges, positions, cell, clist, cutoff=3.0)


def test_window_kernel_triclinic():
    args = make_system(700, 13.0, 3.0, 0.9, triclinic=True, seed=5)
    check_against_xla(*args, cutoff=3.0)


def test_window_kernel_split_charges():
    args = make_system(600, 12.0, 3.0, 0.75, seed=7)
    check_against_xla(*args, cutoff=3.0, split=True)


def test_window_kernel_block_padding():
    # 5×5×5 = 125 cells does not divide the block size: exercises padding
    args = make_system(1500, 16.0, 3.1, 0.8, seed=9)
    assert np.prod(args[4].slot_mask.shape[0]) % 8 != 0
    check_against_xla(*args, cutoff=3.1)


def test_rows_entry_point_with_pallas_engine():
    pot, charges, positions, cell, clist = make_system(800, 12.0, 3.0, 0.8)

    def e_fn(impl):
        def f(pos):
            return rc.cell_list_rspace_energy(
                pot, charges, pos, cell, clist, window_impl=impl
            )

        return jax.jit(jax.value_and_grad(f))

    e_x, f_x = e_fn("xla")(positions)
    e_p, f_p = e_fn("pallas")(positions)
    np.testing.assert_allclose(e_p, e_x, rtol=2e-5)
    scale = float(jnp.max(jnp.abs(f_x)))
    np.testing.assert_allclose(f_p / scale, f_x / scale, atol=2e-5)


def test_window_kernel_combined_potential():
    """A frozen (concrete-weight) CombinedPotential rides the kernel as the
    weight-folded sum of its members' pair maths."""
    from torchpme_tpu.potentials import (
        CombinedPotential,
        InversePowerLawPotential,
    )

    _, charges, positions, cell, clist = make_system(500, 11.0, 3.0, 0.9)
    pot = CombinedPotential(
        [
            CoulombPotential(smearing=0.9),
            InversePowerLawPotential(exponent=3, smearing=0.9),
        ],
        initial_weights=jnp.asarray([1.5, 0.7]),
        smearing=0.9,
    )
    assert pot.sr_derivative is not None
    check_against_xla(pot, charges, positions, cell, clist, cutoff=3.0)

    # trainable weights (traced leaves): both hooks must refuse
    def traced(w):
        p = CombinedPotential(
            [CoulombPotential(smearing=0.9)], initial_weights=w, smearing=0.9
        )
        return jnp.asarray(p.window_pair_math(3.0) is None)

    assert jax.jit(traced)(jnp.asarray([1.0]))


def test_pair_math_gates():
    # direct mode: no SR split to fit
    assert CoulombPotential(smearing=None).window_pair_math(3.0) is None
    # exclusion window changes the pair term
    assert (
        CoulombPotential(smearing=1.0, exclusion_radius=1.0).window_pair_math(3.0)
        is None
    )
    # extreme alpha*cutoff: the fit cannot reach tolerance -> fall back
    assert CoulombPotential(smearing=0.15).window_pair_math(10.0) is None
    # traced parameters: kernel mode yields no cotangents -> refuse
    def probe(s):
        return CoulombPotential(smearing=s).window_pair_math(3.0) is None

    assert jax.jit(lambda s: jnp.asarray(probe(s)))(jnp.asarray(1.0))
    # the strict spec builder raises a curated error
    pot, charges, positions, cell, clist = make_system(300, 36.0, 10.0, 0.15)
    with pytest.raises(ValueError, match="window_impl='pallas' requires"):
        rc.cell_list_rspace_energy(
            pot, charges, positions, cell, clist, window_impl="pallas"
        )
    with pytest.raises(ValueError, match="requires a Potential"):
        rc.cell_list_rspace_energy(
            lambda d: 1.0 / d, charges, positions, cell, clist,
            window_impl="pallas",
        )


def test_polyfit_accuracy():
    from scipy import special

    from torchpme_tpu.ops.polyfit import clenshaw, fit_f32_cheb

    alpha = 0.6
    c = fit_f32_cheb(lambda r: special.erfc(alpha * r), 0.0, 5.0)
    r = np.linspace(0, 5.0, 3000)
    u = (2 * r / 5.0 - 1).astype(np.float32)
    err = np.max(np.abs(clenshaw(c, u) - special.erfc(alpha * r)))
    assert err < 4e-7
    # p = 6 incomplete gamma — the case the power-basis form could not fit
    c6 = fit_f32_cheb(
        lambda r: special.gammaincc(3.0, ((r / (1.1 * 2**0.5)) ** 2)), 0.0, 5.0
    )
    assert c6 is not None
    assert fit_f32_cheb(lambda r: np.exp(-((3.0 * r) ** 2)), 0.0, 50.0) is None
