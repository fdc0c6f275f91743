"""Dipolar PME (mesh k-space for point dipoles) against the O(N·n_k) Ewald
dipolar calculator: energies and every gradient to mesh accuracy, internal
consistency of the quadratic form, fast-path composition, and the
validation surface.  No reference counterpart — the reference's dipolar
calculator is Ewald-only (beyond-parity capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchpme_tpu as tpme
from torchpme_tpu.utils.neighbors import neighbor_list


def make_system(n=60, box=7.0, cutoff=3.0, triclinic=False, seed=0):
    rng = np.random.default_rng(seed)
    cell = np.eye(3) * box
    if triclinic:
        cell[1, 0] = 0.2 * box
        cell[2, 1] = -0.15 * box
    cell = jnp.asarray(cell)
    positions = jnp.asarray(rng.uniform(0, 1, (n, 3)) @ np.asarray(cell))
    dipoles = jnp.asarray(rng.normal(size=(n, 3)))
    idx, _, shifts = map(
        jnp.asarray, neighbor_list(positions, cell=cell, cutoff=cutoff)
    )
    vec = (
        positions[idx[:, 1]]
        - positions[idx[:, 0]]
        + shifts.astype(positions.dtype) @ cell
    )
    return dipoles, positions, cell, idx, vec, shifts


SMEARING = 0.9


def calcs(mesh_spacing=0.45, **kwargs):
    pme = tpme.PMECalculatorDipole(
        tpme.PotentialDipole(smearing=SMEARING),
        mesh_spacing=mesh_spacing,
        **kwargs,
    )
    ewald = tpme.CalculatorDipole(
        tpme.PotentialDipole(smearing=SMEARING), lr_wavelength=0.4
    )
    return pme, ewald


@pytest.mark.parametrize("triclinic", [False, True])
def test_pme_dipole_matches_ewald(triclinic):
    """Per-atom fields and total energy match the converged Ewald dipolar
    calculator to mesh accuracy (~1e-5 rel)."""
    dipoles, positions, cell, idx, vec, _ = make_system(triclinic=triclinic)
    pme, ewald = calcs()
    f_pme = pme(dipoles, cell, positions, idx, vec)
    f_ew = ewald(dipoles, cell, positions, idx, vec)
    e_pme = float(jnp.sum(f_pme * dipoles))
    e_ew = float(jnp.sum(f_ew * dipoles))
    assert abs(e_pme - e_ew) < 2e-5 * abs(e_ew)
    scale = float(jnp.max(jnp.abs(f_ew)))
    np.testing.assert_allclose(
        np.asarray(f_pme) / scale, np.asarray(f_ew) / scale, atol=2e-5
    )


def test_pme_dipole_gradients_match_ewald():
    """Forces, fields, and the stress seed agree with the Ewald dipolar
    calculator (both fully differentiable through their k-space)."""
    dipoles, positions, cell, idx, _, shifts = make_system()
    pme, ewald = calcs()
    ns_pme = pme.get_ns_mesh(cell)
    ns_ew = ewald.get_ns_kvectors(cell)

    def make_f(calc, ns):
        def f(mu, c, p):
            v = p[idx[:, 1]] - p[idx[:, 0]] + shifts.astype(p.dtype) @ c
            return calc.energy(mu, c, p, idx, v, ns_kvectors=ns)

        return f

    g_p = jax.jit(jax.grad(make_f(pme, ns_pme), argnums=(0, 1, 2)))(
        dipoles, cell, positions
    )
    g_e = jax.grad(make_f(ewald, ns_ew), argnums=(0, 1, 2))(
        dipoles, cell, positions
    )
    for name, a, b in zip(("field", "cell", "force"), g_e, g_p):
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(
            np.asarray(b) / scale,
            np.asarray(a) / scale,
            atol=2e-5,
            err_msg=name,
        )


def test_pme_dipole_energy_consistency_and_backends():
    """`energy()` equals `sum(call·mu)` exactly, and the FFT and
    DFT-by-matmul filter backends agree to roundoff."""
    dipoles, positions, cell, idx, vec, _ = make_system(seed=3)
    pme, _ = calcs()
    e_call = jnp.sum(pme(dipoles, cell, positions, idx, vec) * dipoles)
    e_en = pme.energy(dipoles, cell, positions, idx, vec)
    np.testing.assert_allclose(float(e_en), float(e_call), rtol=1e-13)

    e_fft = calcs(fft_backend="fft")[0].energy(
        dipoles, cell, positions, idx, vec
    )
    e_dft = calcs(fft_backend="dft")[0].energy(
        dipoles, cell, positions, idx, vec
    )
    np.testing.assert_allclose(float(e_fft), float(e_dft), rtol=1e-10)


def test_pme_dipole_md_fast_path_composition():
    """MDFastPathDipole runs unchanged on the PME dipolar calculator (its
    `get_ns_kvectors` serves the mesh shape) and matches the cell-list
    energy() to machine precision — dipolar MD with O(N log N) k-space."""
    from torchpme_tpu.ops.rspace_cells import compute_cell_list

    dipoles, positions, cell, idx, vec, _ = make_system(seed=5)
    pme, ewald = calcs()
    fp = tpme.MDFastPathDipole.create(pme, positions, cell, cutoff=2.3)
    rows = fp.bucket(positions)
    e, g = jax.jit(jax.value_and_grad(fp.energy, argnums=2))(
        dipoles, cell, rows
    )
    clist = compute_cell_list(
        positions, cell, 2.3, capacity=fp.clist.slot_mask.shape[1], spill=False
    )
    e_ref = pme.energy(
        dipoles, cell, positions, cell_list=clist, ns_kvectors=fp.ns_kvectors
    )
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-12)
    # and the whole fast path agrees with the Ewald fast path physically
    fp_ew = tpme.MDFastPathDipole.create(ewald, positions, cell, cutoff=2.3)
    e_ew = fp_ew.energy(dipoles, cell, fp_ew.bucket(positions))
    np.testing.assert_allclose(float(e), float(e_ew), rtol=3e-5)


def test_pme_dipole_validation():
    pot = tpme.PotentialDipole(smearing=SMEARING)
    with pytest.raises(ValueError, match="smearing"):
        tpme.PMECalculatorDipole(tpme.PotentialDipole())
    with pytest.raises(ValueError, match="lr_wavelength"):
        tpme.PMECalculatorDipole(pot, lr_wavelength=1.0)
    with pytest.raises(ValueError, match="must be positive"):
        tpme.PMECalculatorDipole(pot, mesh_spacing=-0.1)
    with pytest.raises(ValueError, match="Lagrange"):
        tpme.PMECalculatorDipole(pot, interpolation_nodes=5, _method="P3M")
    with pytest.raises(TypeError, match="PotentialDipole"):
        tpme.PMECalculatorDipole(tpme.CoulombPotential(smearing=1.0))
    pme = tpme.PMECalculatorDipole(pot, mesh_spacing=0.45)
    with pytest.raises(NotImplementedError, match="ns_kvectors"):
        pme.compute_kvectors(jnp.eye(3))
    dipoles, positions, cell, idx, vec, _ = make_system(n=20)
    with pytest.raises(ValueError, match="not an explicit"):
        pme._compute_kspace(
            dipoles, cell, positions, kvectors=jnp.zeros((4, 3))
        )


def test_pme_dipole_fast_path_tiled_backend():
    """MDFastPathDipole with the tiled mesh backend (bucket-reused gradient
    stencils, refreshed per step) matches the scatter backend exactly and
    keeps the staleness NaN contract through the tiled mesh."""
    rng = np.random.default_rng(0)
    n, box, cutoff = 200, 10.0, 3.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
    mu = jnp.asarray(rng.normal(size=(n, 3)))
    cell = jnp.eye(3) * box

    fps = {}
    for backend in ("scatter", "tiled"):
        calc = tpme.PMECalculatorDipole(
            tpme.PotentialDipole(smearing=1.0),
            mesh_spacing=0.5,
            mesh_backend=backend,
        )
        fps[backend] = tpme.MDFastPathDipole.create(calc, pos, cell, cutoff)
    assert fps["tiled"].tiled is not None
    assert fps["scatter"].tiled is None

    outs = {}
    for backend, fp in fps.items():
        rows = fp.bucket(pos)
        e, g = jax.jit(jax.value_and_grad(fp.energy, argnums=2))(mu, cell, rows)
        outs[backend] = (float(e), np.asarray(fp.unbucket(g)))
    e_s, f_s = outs["scatter"]
    e_t, f_t = outs["tiled"]
    np.testing.assert_allclose(e_t, e_s, rtol=1e-12)
    scale = np.max(np.abs(f_s))
    np.testing.assert_allclose(f_t / scale, f_s / scale, atol=1e-12)

    # drifted rows must NaN-poison under jit (and raise eagerly)
    fp = fps["tiled"]
    rows = fp.bucket(pos)
    assert bool(jnp.isnan(jax.jit(fp.energy)(mu, cell, rows + 4.0)))
    with pytest.raises(ValueError, match="stale"):
        fp.energy(mu, cell, rows + 4.0)
