"""Fused dipolar Pallas window kernel ≡ XLA dipolar engine (interpret mode
on CPU): value and every cotangent (positions, dipoles, offsets), over SR
and direct modes, triclinic cells, split i-side dipoles (the sharded-slab
layout), and block padding; plus the `window_scalar_math` gates and the
MDFastPathDipole wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu.ops import rspace_cells as rc
from torchpme_tpu.ops import rspace_cells_dipole as rcd
from torchpme_tpu.ops.pallas import window_dipole_pallas as wdp
from torchpme_tpu.potentials import PotentialDipole


def make_system(n, box, cutoff, smearing, triclinic=False, seed=0):
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
    dipoles = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    pot = PotentialDipole(smearing=smearing, prefactor=1.3)
    # spill-free: the Pallas window kernel tests drive the window alone
    # (extras take the separate XLA side-pass, like the scalar engine)
    clist = rc.compute_cell_list(positions, cell, cutoff, spill=False)
    return pot, dipoles, positions, cell, clist


def check_against_xla(pot, dipoles, positions, cell, clist, split=False):
    pc_t, mu_g, mf_g, offs, _valid, chunks = rc._prepare(
        dipoles, positions, cell, clist
    )
    mui_g = None
    if split:
        rng = np.random.default_rng(42)
        mask = jnp.asarray(
            rng.uniform(size=mu_g.shape[:3]) > 0.3, jnp.float32
        )[..., None, None]
        mui_g = mu_g * mask
    spec = (float(clist.cutoff), chunks, True)
    e_x, g_x = rcd._dw_value_and_grad(spec, pot, pc_t, mu_g, mf_g, offs, mui_g)
    spec_p = spec + (True,)
    e_p, g_p = wdp.pallas_dipole_window_value_and_grad(
        spec_p, pot, pc_t, mu_g, mf_g, offs, mui_g
    )
    np.testing.assert_allclose(e_p, e_x, rtol=3e-5)
    names = ["d_pot", "d_pc", "d_mu", "d_mf", "d_offs", "d_mui"]
    # d_offs is a cancellation-heavy global reduction (see the scalar twin)
    tols = {"d_pc": 3e-5, "d_mu": 3e-5, "d_offs": 5e-4, "d_mui": 3e-5}
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


@pytest.mark.parametrize("smearing", [0.75, None])
def test_dipole_window_kernel_matches_xla(smearing):
    args = make_system(500, 12.0, 3.0, smearing)
    check_against_xla(*args)


def test_dipole_window_kernel_triclinic():
    args = make_system(600, 13.0, 3.0, 0.9, triclinic=True, seed=5)
    check_against_xla(*args)


def test_dipole_window_kernel_split_dipoles():
    args = make_system(500, 12.0, 3.0, 0.75, seed=7)
    check_against_xla(*args, split=True)


def test_dipole_window_kernel_block_padding():
    # 125 cells does not divide the block size: exercises grid padding
    args = make_system(1200, 16.0, 3.1, 0.8, seed=9)
    check_against_xla(*args)


def test_dipole_rows_entry_point_with_pallas_engine():
    pot, dipoles, positions, cell, clist = make_system(700, 12.0, 3.0, 0.8)

    def e_fn(impl):
        def f(mu, pos):
            return rcd.cell_list_rspace_dipole_energy(
                pot, mu, pos, cell, clist, window_impl=impl
            )

        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))

    e_x, (h_x, f_x) = e_fn("xla")(dipoles, positions)
    e_p, (h_p, f_p) = e_fn("pallas")(dipoles, positions)
    np.testing.assert_allclose(e_p, e_x, rtol=3e-5)
    for a, b in ((h_p, h_x), (f_p, f_x)):
        scale = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-5
        )


def test_dipole_scalar_math_fit_accuracy():
    """The Chebyshev (B, C, C') evaluations match the exact SR scalars to
    f32 roundoff over the whole domain."""
    from torchpme_tpu.ops.polyfit import dipole_window_scalar_math

    pot = PotentialDipole(smearing=0.7, prefactor=1.3)
    sm = dipole_window_scalar_math(1.3, 0.7, 3.0)
    assert sm is not None
    d = jnp.linspace(0.05, 3.0, 2000, dtype=jnp.float64)
    b_ref, c_ref = pot.sr_scalar_kernels(d)
    cp_ref = pot.sr_scalar_kernel_derivative(d, b_ref, c_ref)
    b, c, cp = sm(d.astype(jnp.float32))
    for a, ref in ((b, b_ref), (c, c_ref), (cp, cp_ref)):
        err = jnp.max(jnp.abs(a.astype(jnp.float64) - ref)) / jnp.max(
            jnp.abs(ref)
        )
        assert float(err) < 2e-6


def test_dipole_scalar_math_gates():
    # exclusion window changes the pair term
    assert (
        PotentialDipole(smearing=1.0, exclusion_radius=1.0).window_scalar_math(
            3.0
        )
        is None
    )
    # extreme alpha*cutoff: the fit cannot reach tolerance -> fall back
    assert PotentialDipole(smearing=0.1).window_scalar_math(10.0) is None
    # direct mode is exact rational math — always kernel-ready
    assert PotentialDipole(smearing=None).window_scalar_math(3.0) is not None

    # traced parameters: kernel mode yields no cotangents -> refuse
    def probe(s):
        return PotentialDipole(smearing=s).window_scalar_math(3.0) is None

    assert jax.jit(lambda s: jnp.asarray(probe(s)))(jnp.asarray(1.0))

    # the strict spec builder raises a curated error
    pot, dipoles, positions, cell, clist = make_system(200, 36.0, 10.0, 0.1)
    with pytest.raises(ValueError, match="window_impl='pallas' requires"):
        rcd.cell_list_rspace_dipole_energy(
            pot, dipoles, positions, cell, clist, window_impl="pallas"
        )
    with pytest.raises(ValueError, match="must be 'xla' or 'pallas'"):
        rcd.cell_list_rspace_dipole_energy(
            pot, dipoles, positions, cell, clist, window_impl="mosaic"
        )


def test_md_fast_path_dipole_window_impl():
    """MDFastPathDipole plumbs window_impl through to the rows engine and
    matches the XLA engine through the full (SR + k-space) energy."""
    import torchpme_tpu as tpme

    rng = np.random.default_rng(11)
    n, box = 300, 10.0
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    dipoles = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    cell = jnp.eye(3, dtype=jnp.float32) * box
    calc = tpme.CalculatorDipole(
        tpme.PotentialDipole(smearing=0.9), lr_wavelength=2.0
    )

    fps = {
        impl: tpme.MDFastPathDipole.create(
            calc, positions, cell, cutoff=2.5, window_impl=impl
        )
        for impl in ("xla", "pallas")
    }
    assert fps["pallas"].window_impl == "pallas"
    # auto resolves to xla off-TPU (measured-winner policy)
    auto = tpme.MDFastPathDipole.create(calc, positions, cell, cutoff=2.5)
    assert auto.window_impl == "xla"

    results = {}
    for impl, fp in fps.items():
        rows = fp.bucket(positions)
        e, g = jax.jit(jax.value_and_grad(fp.energy, argnums=2))(
            dipoles, cell, rows
        )
        results[impl] = (e, fp.unbucket(g))
        # rebucket preserves the resolved engine
        assert fp.rebucket(rows, cell).window_impl == impl
    e_x, f_x = results["xla"]
    e_p, f_p = results["pallas"]
    np.testing.assert_allclose(e_p, e_x, rtol=3e-5)
    scale = float(jnp.max(jnp.abs(f_x)))
    np.testing.assert_allclose(
        np.asarray(f_p) / scale, np.asarray(f_x) / scale, atol=3e-5
    )
