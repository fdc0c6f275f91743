"""Randomized equivalence battery for the dipolar MD fast path.

For random (triclinic) systems of point dipoles, the cell-list window
engine (:mod:`torchpme_tpu.ops.rspace_cells_dipole`) composed with the
Ewald k-space term must reproduce the neighbor-list per-atom-potential
path: energies and all gradients (positions, dipoles, cell), under jit.
Mirrors ``test_fastpath_fuzz.py`` for the scalar calculators.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import CalculatorDipole, PotentialDipole
from torchpme_tpu.ops.rspace_cells import compute_cell_list
from torchpme_tpu.utils.neighbors import neighbor_list


def _random_system(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 90))
    box = float(rng.uniform(7.0, 10.0))
    skew = rng.uniform(-0.4, 0.4, size=3)
    cell = jnp.asarray(
        [[box, 0, 0], [skew[0], box, 0], [skew[1], skew[2], box]]
    )
    positions = jnp.asarray(rng.uniform(-1.0, box + 1.0, (n, 3)))
    dipoles = jnp.asarray(rng.normal(size=(n, 3)))
    cutoff = float(rng.uniform(2.0, 2.8))
    return positions, dipoles, cell, cutoff, rng


def _assert_match(e_fast, e_ref, args):
    e1, g1 = jax.jit(jax.value_and_grad(e_fast, argnums=(0, 1, 2)))(*args)
    e2, g2 = jax.value_and_grad(e_ref, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-10)
    for a, b in zip(g1, g2):
        scale = max(1e-10, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-9 * scale
        )


@pytest.mark.parametrize("seed", [401, 402, 403])
def test_dipole_ewald_fast_path_matches_reference_path(seed):
    positions, dipoles, cell, cutoff, rng = _random_system(seed)
    smearing = float(rng.uniform(0.8, 1.2))
    calc = CalculatorDipole(
        PotentialDipole(smearing=smearing), lr_wavelength=1.0
    )
    ns_k = calc.get_ns_kvectors(cell)
    idx, _dist, shifts = map(
        jnp.asarray,
        neighbor_list(np.asarray(positions), np.asarray(cell), cutoff),
    )
    clist = compute_cell_list(positions, cell, cutoff, capacity=64, spill=False)

    def e_fast(p, m, c):
        return calc.energy(m, c, p, cell_list=clist, ns_kvectors=ns_k)

    def e_ref(p, m, c):
        vec = p[idx[:, 1]] - p[idx[:, 0]] + shifts.astype(p.dtype) @ c
        return jnp.sum(calc(m, c, p, idx, vec, ns_kvectors=ns_k) * m)

    _assert_match(e_fast, e_ref, (positions, dipoles, cell))


@pytest.mark.parametrize("seed", [411, 412])
def test_dipole_direct_fast_path_matches_reference_path(seed):
    """Direct mode (no smearing): full 1/r^3 kernel on the same pair set."""
    positions, dipoles, cell, cutoff, _rng = _random_system(seed)
    calc = CalculatorDipole(PotentialDipole())
    idx, _dist, shifts = map(
        jnp.asarray,
        neighbor_list(np.asarray(positions), np.asarray(cell), cutoff),
    )
    clist = compute_cell_list(positions, cell, cutoff, capacity=64, spill=False)

    def e_fast(p, m, c):
        return calc.energy(m, c, p, cell_list=clist)

    def e_ref(p, m, c):
        vec = p[idx[:, 1]] - p[idx[:, 0]] + shifts.astype(p.dtype) @ c
        return jnp.sum(calc(m, c, p, idx, vec) * m)

    _assert_match(e_fast, e_ref, (positions, dipoles, cell))


def test_dipole_exclusion_radius_fast_path():
    """Windowed-LR mode (exclusion_radius set) through the scalar kernels."""
    positions, dipoles, cell, cutoff, _rng = _random_system(421)
    calc = CalculatorDipole(
        PotentialDipole(smearing=1.0, exclusion_radius=cutoff),
        lr_wavelength=1.0,
    )
    ns_k = calc.get_ns_kvectors(cell)
    idx, _dist, shifts = map(
        jnp.asarray,
        neighbor_list(np.asarray(positions), np.asarray(cell), cutoff),
    )
    clist = compute_cell_list(positions, cell, cutoff, capacity=64, spill=False)

    def e_fast(p, m, c):
        return calc.energy(m, c, p, cell_list=clist, ns_kvectors=ns_k)

    def e_ref(p, m, c):
        vec = p[idx[:, 1]] - p[idx[:, 0]] + shifts.astype(p.dtype) @ c
        return jnp.sum(calc(m, c, p, idx, vec, ns_kvectors=ns_k) * m)

    _assert_match(e_fast, e_ref, (positions, dipoles, cell))


@pytest.mark.parametrize("seed", [431, 432])
def test_dipole_cell_list_spill_matches_reference_path(seed):
    """A tight capacity with the overflow side list (inhomogeneous systems)
    must reproduce the neighbor-list path — values and all gradients."""
    rng = np.random.default_rng(seed)
    box = 12.0
    cluster = rng.normal(0, 0.9, (50, 3)) + 6.0
    gas = rng.uniform(0, box, (50, 3))
    positions = jnp.asarray(np.concatenate([cluster, gas]))
    dipoles = jnp.asarray(rng.normal(size=(100, 3)))
    cell = jnp.eye(3) * box
    cutoff = 3.0
    calc = CalculatorDipole(
        PotentialDipole(smearing=0.9), lr_wavelength=1.2
    )
    ns_k = calc.get_ns_kvectors(cell)
    clist = compute_cell_list(positions, cell, cutoff, capacity=8, spill=True)
    assert clist.extra_index is not None and int(clist.extra_mask.sum()) > 0
    idx, _d, shifts = map(
        jnp.asarray,
        neighbor_list(np.asarray(positions), np.asarray(cell), cutoff),
    )

    def e_fast(p, m, c):
        return calc.energy(m, c, p, cell_list=clist, ns_kvectors=ns_k)

    def e_ref(p, m, c):
        vec = p[idx[:, 1]] - p[idx[:, 0]] + shifts.astype(p.dtype) @ c
        return jnp.sum(calc(m, c, p, idx, vec, ns_kvectors=ns_k) * m)

    _assert_match(e_fast, e_ref, (positions, dipoles, cell))

    # the rows fast path carries the extras as tail rows
    from torchpme_tpu import MDFastPathDipole

    fp = MDFastPathDipole.create(
        calc, positions, cell, cutoff, cell_capacity=8, _spill=True
    )
    rows = fp.bucket(positions)
    np.testing.assert_allclose(
        np.asarray(fp.unbucket(rows)), np.asarray(positions)
    )
    e_rows, g_rows = jax.jit(jax.value_and_grad(fp.energy, argnums=2))(
        dipoles, cell, rows
    )
    e2, g2 = jax.value_and_grad(e_ref, argnums=0)(positions, dipoles, cell)
    np.testing.assert_allclose(float(e_rows), float(e2), rtol=1e-10)
    scale = float(jnp.max(jnp.abs(g2)))
    np.testing.assert_allclose(
        np.asarray(fp.unbucket(g_rows)), np.asarray(g2), atol=1e-9 * scale
    )


def test_dipole_energy_requires_some_pair_source():
    positions, dipoles, cell, _cutoff, _rng = _random_system(441)
    calc = CalculatorDipole(PotentialDipole())
    with pytest.raises(ValueError, match="cell_list"):
        calc.energy(dipoles, cell, positions)


def test_dipole_energy_rejects_both_pair_sources():
    positions, dipoles, cell, cutoff, _rng = _random_system(451)
    calc = CalculatorDipole(PotentialDipole())
    idx, _d, shifts = map(
        jnp.asarray,
        neighbor_list(np.asarray(positions), np.asarray(cell), cutoff),
    )
    vec = positions[idx[:, 1]] - positions[idx[:, 0]] + shifts @ cell
    clist = compute_cell_list(positions, cell, cutoff, capacity=64, spill=False)
    with pytest.raises(ValueError, match="not both"):
        calc.energy(
            dipoles,
            cell,
            positions,
            neighbor_indices=idx,
            neighbor_vectors=vec,
            cell_list=clist,
        )


@pytest.mark.parametrize("smeared", [True, False])
def test_dipole_rows_state_matches_cell_list_path(smeared):
    """MDFastPathDipole (bucket-order rows) == cell-list path: energy and
    all gradients, up to the row permutation."""
    from torchpme_tpu import MDFastPathDipole

    positions, dipoles, cell, cutoff, _rng = _random_system(471)
    if smeared:
        calc = CalculatorDipole(PotentialDipole(smearing=1.0), lr_wavelength=1.0)
    else:
        calc = CalculatorDipole(PotentialDipole())
    fp = MDFastPathDipole.create(calc, positions, cell, cutoff=cutoff)
    rows = fp.bucket(positions)
    e1, g1 = jax.jit(jax.value_and_grad(fp.energy, argnums=(0, 1, 2)))(
        dipoles, cell, rows
    )
    clist = compute_cell_list(
        positions, cell, cutoff, capacity=fp.clist.slot_mask.shape[1],
        spill=False,
    )
    kw = {"ns_kvectors": fp.ns_kvectors} if smeared else {}
    e2, g2 = jax.value_and_grad(
        lambda m, c, p: calc.energy(m, c, p, cell_list=clist, **kw),
        argnums=(0, 1, 2),
    )(dipoles, cell, positions)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(fp.unbucket(g1[2])), np.asarray(g2[2]), atol=1e-9
    )


def test_dipole_rows_state_staleness_poisons():
    from torchpme_tpu import MDFastPathDipole

    positions, dipoles, cell, cutoff, _rng = _random_system(481)
    calc = CalculatorDipole(PotentialDipole(smearing=1.0), lr_wavelength=1.0)
    fp = MDFastPathDipole.create(calc, positions, cell, cutoff=cutoff)
    rows = fp.bucket(positions)
    assert np.isfinite(float(jax.jit(fp.energy)(dipoles, cell, rows)))
    drifted = rows.at[fp.row_of_atom[3]].add(
        jnp.asarray([1.8 * cutoff, 0.0, 0.0])
    )
    assert np.isnan(float(jax.jit(fp.energy)(dipoles, cell, drifted)))
    fp2 = fp.rebucket(drifted, cell)
    e2 = fp2.energy(dipoles, cell, fp2.bucket(fp.unbucket(drifted)))
    assert np.isfinite(float(e2))


def test_dipole_scalar_kernels_match_tensor_kernels():
    """(B, C) scalars must reproduce the 3×3 tensor kernels element-wise."""
    rng = np.random.default_rng(461)
    vec = jnp.asarray(rng.normal(size=(32, 3)) * 2.0)
    d = jnp.linalg.norm(vec, axis=1)
    eye = jnp.eye(3)
    outer = vec[:, :, None] * vec[:, None, :]
    for pot in (
        PotentialDipole(prefactor=1.7),
        PotentialDipole(smearing=1.1, prefactor=0.6),
        PotentialDipole(smearing=0.9, exclusion_radius=3.0, exclusion_degree=2),
    ):
        if pot.smearing is None:
            b, c = pot.scalar_kernels(d)
            ref = pot.from_dist(vec)
        else:
            b, c = pot.sr_scalar_kernels(d)
            ref = pot.sr_from_dist(vec)
        built = b[:, None, None] * eye[None] - c[:, None, None] * outer
        np.testing.assert_allclose(np.asarray(built), np.asarray(ref), atol=1e-13)


def test_dipole_analytic_force_gate_and_equality():
    """The fused analytic dipolar VJP engages for concrete potentials, the
    autodiff path for traced ones — and both give the same gradients."""
    from torchpme_tpu.ops.rspace_cells_dipole import (
        _can_use_analytic_dipole,
        cell_list_rspace_dipole_energy,
    )

    positions, dipoles, cell, cutoff, rng = _random_system(421)
    clist = compute_cell_list(positions, cell, cutoff, capacity=64, spill=False)
    pot = PotentialDipole(smearing=1.0, prefactor=1.3)
    assert _can_use_analytic_dipole(pot)
    assert not _can_use_analytic_dipole(
        PotentialDipole(smearing=1.0, exclusion_radius=1.0)
    )

    def e_analytic(p, m, c):
        return cell_list_rspace_dipole_energy(pot, m, p, c, clist)

    def e_traced(p, m, c, pref):
        # traced prefactor -> the gate refuses, plain autodiff runs
        pot_t = PotentialDipole(smearing=1.0, prefactor=pref)
        return cell_list_rspace_dipole_energy(pot_t, m, p, c, clist)

    args = (positions, dipoles, cell)
    e1, g1 = jax.jit(jax.value_and_grad(e_analytic, argnums=(0, 1, 2)))(*args)
    e2, g2 = jax.jit(jax.value_and_grad(e_traced, argnums=(0, 1, 2)))(
        *args, jnp.asarray(1.3)
    )
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-12)
    for a, b in zip(g1, g2):
        scale = max(1e-10, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12 * scale)
    # the traced path still carries potential-parameter gradients
    gp = jax.grad(e_traced, argnums=3)(*args, jnp.asarray(1.3))
    np.testing.assert_allclose(float(gp), float(e2) / 1.3, rtol=1e-10)


def test_dipole_scalar_kernel_derivatives_match_autodiff():
    from torchpme_tpu.potentials import PotentialDipole as PD

    d = jnp.linspace(0.4, 4.0, 40)
    pot = PD(smearing=0.8, prefactor=2.1)
    b, c = pot.sr_scalar_kernels(d)
    cp = pot.sr_scalar_kernel_derivative(d, b, c)
    cp_auto = jax.vmap(jax.grad(lambda x: pot.sr_scalar_kernels(x)[1]))(d)
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cp_auto), rtol=1e-9)
    # dB/dr = -C r identity (the engine relies on it)
    bp_auto = jax.vmap(jax.grad(lambda x: pot.sr_scalar_kernels(x)[0]))(d)
    np.testing.assert_allclose(np.asarray(bp_auto), np.asarray(-c * d), rtol=1e-9)
    potd = PD(prefactor=2.1)
    bd, cd = potd.scalar_kernels(d)
    cpd_auto = jax.vmap(jax.grad(lambda x: potd.scalar_kernels(x)[1]))(d)
    np.testing.assert_allclose(
        np.asarray(potd.scalar_kernel_derivative(d, bd, cd)),
        np.asarray(cpd_auto),
        rtol=1e-12,
    )


@pytest.mark.parametrize("mode", ["sr", "direct"])
def test_dipole_window_scalar_math_sq_accuracy(mode):
    """The fused f32 ``(B, C, C'/d)``-of-d² hook must agree with the exact
    f64 scalar kernels to A&S-7.1.26 + f32-roundoff accuracy over the
    physical pair range (errors scaled by the range maximum — what dipolar
    force-RMS accuracy actually sees)."""
    pot = PotentialDipole(smearing=None if mode == "direct" else 1.1, prefactor=1.3)
    d = jnp.linspace(0.3, 5.0, 2001, dtype=jnp.float64)
    if mode == "direct":
        b64, c64 = pot.scalar_kernels(d)
        cp64 = pot.scalar_kernel_derivative(d, b64, c64) / d
    else:
        b64, c64 = pot.sr_scalar_kernels(d)
        cp64 = pot.sr_scalar_kernel_derivative(d, b64, c64) / d
    d32 = d.astype(jnp.float32)
    b32, c32, cp32 = pot.window_scalar_math_sq(d32 * d32)
    for a, b in ((b32, b64), (c32, c64), (cp32, cp64)):
        err = np.max(
            np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        ) / np.max(np.abs(np.asarray(b, np.float64)))
        assert err < 2e-6, err


def test_dipole_f32_window_math_end_to_end():
    """f32 dipolar window energy + every cotangent through the fused hook
    must match the exact f64 path to f32 roundoff, and the hook must be the
    path actually taken (engaged on f32, never on f64)."""
    from torchpme_tpu.ops import rspace_cells_dipole as rcd
    from torchpme_tpu.ops.rspace_cells_dipole import cell_list_rspace_dipole_energy

    calls = {"f32": 0, "f64": 0}
    orig = rcd._resolve_dipole_window_math

    def spy(spec, potential, dtype):
        r = orig(spec, potential, dtype)
        if r is not None:
            calls["f32" if dtype == jnp.float32 else "f64"] += 1
        return r

    positions, dipoles, cell, cutoff, rng = _random_system(433)
    clist = compute_cell_list(positions, cell, cutoff, capacity=64, spill=False)

    def run(dtype):
        p = positions.astype(dtype)
        m = dipoles.astype(dtype)
        c = cell.astype(dtype)
        pot = PotentialDipole(smearing=jnp.asarray(1.0, dtype), prefactor=1.3)
        e, g = jax.value_and_grad(
            lambda p_, m_, c_: cell_list_rspace_dipole_energy(pot, m_, p_, c_, clist),
            argnums=(0, 1, 2),
        )(p, m, c)
        return float(e), [np.asarray(x, np.float64) for x in g]

    rcd._resolve_dipole_window_math = spy
    try:
        e32, g32 = run(jnp.float32)
        e64, g64 = run(jnp.float64)
    finally:
        rcd._resolve_dipole_window_math = orig

    assert calls["f32"] >= 1, "fused dipolar hook not engaged on the f32 path"
    assert calls["f64"] == 0, "fused dipolar hook must never engage on f64"
    assert abs(e32 - e64) / abs(e64) < 1e-5
    for a, b in zip(g32, g64):
        scale = np.max(np.abs(b))
        assert np.sqrt(np.mean((a - b) ** 2)) / scale < 1e-5
        assert np.max(np.abs(a - b)) / scale < 1e-4
