"""Bucket-order MD state API: the production step without per-step gathers.

The rows layout must be an exact re-parameterization of the generic fast
path — same energies, same gradients (up to the row permutation), same
NaN-staleness contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchpme_tpu as tpme
from torchpme_tpu.ops.rspace_cells import compute_cell_list


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(5)
    n, box = 150, 8.0
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
    charges = jnp.asarray(rng.normal(size=(n, 1)))
    charges = charges - charges.mean()
    cell = jnp.eye(3) * box
    return charges, cell, positions


NS = (32, 32, 32)
CUTOFF = 1.0


def _calc(kind="pme"):
    pot = tpme.CoulombPotential(smearing=0.5)
    if kind == "p3m":
        return tpme.P3MCalculator(pot, interpolation_nodes=3)
    return tpme.PMECalculator(pot, interpolation_nodes=4)


@pytest.mark.parametrize("calc_kind", ["pme", "p3m"])
def test_md_fastpath_matches_generic_fast_path(system, calc_kind):
    charges, cell, positions = system
    calc = _calc(calc_kind)
    fp = tpme.MDFastPath.create(calc, positions, cell, CUTOFF, NS)
    rows = fp.bucket(positions)
    clist = compute_cell_list(positions, cell, CUTOFF)

    def f_rows(q, c, r):
        return fp.energy(q, c, r)

    def f_ref(q, c, p):
        return calc.energy(q, c, p, cell_list=clist, ns_mesh=NS)

    e_rows = jax.jit(f_rows)(charges, cell, rows)
    e_ref = f_ref(charges, cell, positions)
    np.testing.assert_allclose(float(e_rows), float(e_ref), rtol=1e-11)

    g_rows = jax.jit(jax.grad(f_rows, argnums=(0, 1, 2)))(charges, cell, rows)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(charges, cell, positions)
    np.testing.assert_allclose(
        np.asarray(g_rows[0]), np.asarray(g_ref[0]), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(g_rows[1]), np.asarray(g_ref[1]), atol=1e-10
    )
    # row-layout forces equal atom-order forces after unbucketing
    np.testing.assert_allclose(
        np.asarray(fp.unbucket(g_rows[2])), np.asarray(g_ref[2]), atol=1e-11
    )
    # padded rows carry no force
    force_norms = jnp.linalg.norm(g_rows[2], axis=-1)
    occupied = jnp.zeros(fp.n_rows, bool).at[fp.row_of_atom].set(True)
    np.testing.assert_allclose(
        np.asarray(force_norms[~occupied]), 0.0, atol=1e-12
    )


def test_md_fastpath_bucket_roundtrip(system):
    charges, cell, positions = system
    fp = tpme.MDFastPath.create(_calc(), positions, cell, CUTOFF, NS)
    rows = fp.bucket(positions)
    np.testing.assert_allclose(
        np.asarray(fp.unbucket(rows)), np.asarray(positions), rtol=0, atol=0
    )


def test_md_fastpath_spill_extras(system):
    """A clustered system spills into the side list; rows cover the extras."""
    charges, cell, positions = system
    rng = np.random.default_rng(9)
    cluster = 0.5 + 0.3 * jnp.asarray(rng.uniform(size=(40, 3)))
    positions2 = jnp.concatenate([positions, cluster])
    charges2 = jnp.concatenate([charges, jnp.ones((40, 1))])
    charges2 = charges2 - charges2.mean()
    fp = tpme.MDFastPath.create(_calc(), positions2, cell, CUTOFF, NS)
    assert fp.clist.extra_index is not None, "test system did not spill"
    rows = fp.bucket(positions2)
    clist = compute_cell_list(positions2, cell, CUTOFF)
    e_rows = jax.jit(fp.energy)(charges2, cell, rows)
    e_ref = _calc().energy(charges2, cell, positions2, cell_list=clist, ns_mesh=NS)
    np.testing.assert_allclose(float(e_rows), float(e_ref), rtol=1e-11)


def test_md_fastpath_stale_rows_poison(system):
    charges, cell, positions = system
    fp = tpme.MDFastPath.create(_calc(), positions, cell, CUTOFF, NS)
    rows = fp.bucket(positions)
    drifted = rows.at[int(fp.row_of_atom[0]), 0].add(float(cell[0, 0]) / 2)
    e = jax.jit(fp.energy)(charges, cell, drifted)
    assert bool(jnp.isnan(e)), "stale rows not detected"
    f = jax.jit(jax.grad(fp.energy, argnums=2))(charges, cell, drifted)
    assert bool(jnp.all(jnp.isnan(f[jnp.asarray(fp.row_of_atom)]))), (
        "stale-row forces not poisoned"
    )


def test_md_fastpath_rebucket(system):
    charges, cell, positions = system
    fp = tpme.MDFastPath.create(_calc(), positions, cell, CUTOFF, NS)
    rows = fp.bucket(positions)
    drifted = rows.at[int(fp.row_of_atom[0]), 0].add(float(cell[0, 0]) / 2)
    fp2 = fp.rebucket(drifted, cell)
    rows2 = fp2.bucket(fp.unbucket(drifted))
    e = jax.jit(fp2.energy)(charges, cell, rows2)
    assert bool(jnp.isfinite(e)), "rebucketed energy should be finite"


def test_md_fastpath_validation(system):
    charges, cell, positions = system
    with pytest.raises(ValueError, match="tile"):
        tpme.MDFastPath.create(_calc(), positions, cell, CUTOFF, (24, 24, 24))


def test_analytic_force_hook_engaged(system):
    """The Coulomb fast path must use the analytic V'(d), and a trainable
    (traced) potential must fall back to the vjp pullback with correct
    parameter gradients."""
    from torchpme_tpu.ops.rspace_cells import (
        _can_use_analytic_derivative,
        cell_list_rspace_energy,
    )

    charges, cell, positions = system
    pot = tpme.CoulombPotential(smearing=0.5)
    assert _can_use_analytic_derivative(pot)
    clist = compute_cell_list(positions, cell, CUTOFF)

    # smearing gradient through the fast path (forces the traced branch)
    def e_of_smearing(s):
        return cell_list_rspace_energy(
            tpme.CoulombPotential(smearing=s), charges, positions, cell, clist
        )

    g = jax.grad(e_of_smearing)(0.5)
    eps = 1e-6
    fd = (e_of_smearing(0.5 + eps) - e_of_smearing(0.5 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_md_fastpath_rebucket_preserves_shapes(system):
    """rebucket must reuse the capacities so the compiled step is reused
    (stable row/slot shapes) and explicit capacities are not dropped."""
    charges, cell, positions = system
    fp = tpme.MDFastPath.create(_calc(), positions, cell, CUTOFF, NS)
    rows = fp.bucket(positions)
    fp2 = fp.rebucket(rows + 0.05, cell)
    assert fp2.n_rows == fp.n_rows
    assert fp2.clist.slot_mask.shape == fp.clist.slot_mask.shape
    assert (fp.tiled is None) == (fp2.tiled is None)
    if fp.tiled is not None:
        assert fp2.tiled.local_x.shape == fp.tiled.local_x.shape
    assert (fp.clist.extra_index is None) == (fp2.clist.extra_index is None)


def test_md_fastpath_fused_rejects_unaligned_tile_capacity(system):
    charges, cell, positions = system
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of 8"):
        tpme.MDFastPath.create(
            _calc(), positions, cell, CUTOFF, NS, tile_capacity=100,
            mesh_impl="fused",
        )


def test_md_fastpath_aligned_matches_tiled():
    """The aligned mesh state (fused Pallas spread, rows double as tile
    slots) reproduces the tiled state's step to f32 accuracy."""
    rng = np.random.default_rng(3)
    n, box, cutoff = 240, 14.0, 3.0
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    charges = jnp.asarray(
        np.tile([1.0, -1.0], n // 2).reshape(-1, 1), jnp.float32
    )
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.9,
        interpolation_nodes=4,
    )
    ns = (32, 32, 32)  # tile edge 14/(32/8) = 3.5 >= cutoff 3.0
    out = {}
    for mesh_impl in ("tiled", "aligned"):
        fp = tpme.MDFastPath.create(
            calc, positions, cell, cutoff, ns, mesh_impl=mesh_impl,
        )
        rows = fp.bucket(positions)
        e, g = jax.jit(jax.value_and_grad(fp.energy, argnums=2))(
            charges, cell, rows
        )
        out[mesh_impl] = (float(e), np.asarray(fp.unbucket(g)))
    e_ref, f_ref = out["tiled"]
    e_p, f_p = out["aligned"]
    np.testing.assert_allclose(e_p, e_ref, rtol=2e-5)
    scale = np.max(np.abs(f_ref))
    np.testing.assert_allclose(f_p / scale, f_ref / scale, atol=5e-5)


def test_energy_rows_accepts_plain_callable(system):
    """A bare v(d) callable must take the documented autodiff path, like
    cell_list_rspace_energy, instead of crashing in the custom VJP."""
    import jax

    from torchpme_tpu.ops.rspace_cells import (
        cell_list_rspace_energy,
        cell_list_rspace_energy_rows,
        compute_cell_list,
    )

    charges, cell, positions = system
    clist = compute_cell_list(positions, cell, CUTOFF)
    fp = tpme.MDFastPath.create(_calc(), positions, cell, CUTOFF, NS)
    rows = fp.bucket(positions)
    v = lambda d: 1.0 / d  # noqa: E731
    e_rows = cell_list_rspace_energy_rows(v, charges, rows, cell, fp.clist)
    e_ref = cell_list_rspace_energy(v, charges, positions, cell, clist)
    np.testing.assert_allclose(float(e_rows), float(e_ref), rtol=1e-12)
    g = jax.grad(
        lambda r: cell_list_rspace_energy_rows(v, charges, r, cell, fp.clist)
    )(rows)
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# MDFastPathEwald: the explicit-k-sum counterpart of the mesh fast path
# ---------------------------------------------------------------------------

EWALD_CUTOFF = 2.5


def _ewald_calc():
    return tpme.EwaldCalculator(
        tpme.CoulombPotential(smearing=1.0), lr_wavelength=2.0
    )


def test_md_fastpath_ewald_matches_energy_path(system):
    charges, cell, positions = system
    calc = _ewald_calc()
    fp = tpme.MDFastPathEwald.create(calc, positions, cell, EWALD_CUTOFF)
    rows = fp.bucket(positions)
    clist = compute_cell_list(positions, cell, EWALD_CUTOFF)

    def f_rows(q, c, r):
        return fp.energy(q, c, r)

    def f_ref(q, c, p):
        return calc.energy(
            q, c, p, cell_list=clist, ns_kvectors=fp.ns_kvectors
        )

    e_rows = jax.jit(f_rows)(charges, cell, rows)
    e_ref = f_ref(charges, cell, positions)
    np.testing.assert_allclose(float(e_rows), float(e_ref), rtol=1e-11)

    g_rows = jax.jit(jax.grad(f_rows, argnums=(0, 1, 2)))(charges, cell, rows)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(charges, cell, positions)
    np.testing.assert_allclose(
        np.asarray(g_rows[0]), np.asarray(g_ref[0]), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(g_rows[1]), np.asarray(g_ref[1]), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(fp.unbucket(g_rows[2])), np.asarray(g_ref[2]), atol=1e-11
    )
    # padded rows carry no force: q = 0 rows drop out of the structure factor
    force_norms = jnp.linalg.norm(g_rows[2], axis=-1)
    occupied = jnp.zeros(fp.n_rows, bool).at[fp.row_of_atom].set(True)
    np.testing.assert_allclose(
        np.asarray(force_norms[~occupied]), 0.0, atol=1e-12
    )


def test_md_fastpath_ewald_spill_extras(system):
    charges, cell, positions = system
    rng = np.random.default_rng(9)
    cluster = 0.5 + 0.3 * jnp.asarray(rng.uniform(size=(40, 3)))
    positions2 = jnp.concatenate([positions, cluster])
    charges2 = jnp.concatenate([charges, jnp.ones((40, 1))])
    charges2 = charges2 - charges2.mean()
    calc = _ewald_calc()
    fp = tpme.MDFastPathEwald.create(
        calc, positions2, cell, EWALD_CUTOFF, cell_capacity=16, _spill=True
    )
    assert fp.clist.extra_index is not None, "test system did not spill"
    rows = fp.bucket(positions2)
    clist = compute_cell_list(positions2, cell, EWALD_CUTOFF)
    e_rows = jax.jit(fp.energy)(charges2, cell, rows)
    e_ref = calc.energy(
        charges2, cell, positions2, cell_list=clist, ns_kvectors=fp.ns_kvectors
    )
    np.testing.assert_allclose(float(e_rows), float(e_ref), rtol=1e-11)


def test_md_fastpath_ewald_stale_rows_poison(system):
    charges, cell, positions = system
    fp = tpme.MDFastPathEwald.create(
        _ewald_calc(), positions, cell, EWALD_CUTOFF
    )
    rows = fp.bucket(positions)
    drifted = rows.at[int(fp.row_of_atom[0]), 0].add(float(cell[0, 0]) / 2)
    e = jax.jit(fp.energy)(charges, cell, drifted)
    assert bool(jnp.isnan(e)), "stale rows not detected"
    fp2 = fp.rebucket(drifted, cell)
    assert fp2.n_rows == fp.n_rows
    assert fp2.clist.slot_mask.shape == fp.clist.slot_mask.shape
    rows2 = fp2.bucket(fp.unbucket(drifted))
    assert bool(jnp.isfinite(jax.jit(fp2.energy)(charges, cell, rows2)))


def test_md_fastpath_ewald_rejects_mesh_calculator(system):
    charges, cell, positions = system
    with pytest.raises(ValueError, match="EwaldCalculator"):
        tpme.MDFastPathEwald.create(_calc(), positions, cell, EWALD_CUTOFF)
    with pytest.raises(ValueError, match="window_impl"):
        tpme.MDFastPathEwald.create(
            _ewald_calc(), positions, cell, EWALD_CUTOFF, window_impl="bogus"
        )


def test_md_fastpath_aligned_balance():
    """Aligned mode overflow-balances by default: the capacity drops below
    the unbalanced choice (window work scales with capacity²) while the
    step's values and forces stay exact, and rebucketing preserves the
    balanced shapes (compiled-step reuse)."""
    rng = np.random.default_rng(7)
    n, box, cutoff = 360, 14.0, 3.0
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    charges = jnp.asarray(
        np.tile([1.0, -1.0], n // 2).reshape(-1, 1), jnp.float32
    )
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.9,
        interpolation_nodes=4,
    )
    ns = (32, 32, 32)
    fp_b = tpme.MDFastPath.create(
        calc, positions, cell, cutoff, ns, mesh_impl="aligned"
    )
    fp_p = tpme.MDFastPath.create(
        calc, positions, cell, cutoff, ns, mesh_impl="aligned", balance=False
    )
    assert max(fp_b.clist.slack) > 0.0 and fp_b.aligned_pad >= 1
    assert max(fp_p.clist.slack) == 0.0 and fp_p.aligned_pad == 0
    assert (
        fp_b.clist.slot_mask.shape[1] <= fp_p.clist.slot_mask.shape[1]
    )
    out = {}
    for tag, fp in (("bal", fp_b), ("plain", fp_p)):
        rows = fp.bucket(positions)
        e, g = jax.jit(jax.value_and_grad(fp.energy, argnums=2))(
            charges, cell, rows
        )
        out[tag] = (float(e), np.asarray(fp.unbucket(g)))
    e_b, f_b = out["bal"]
    e_p, f_p = out["plain"]
    np.testing.assert_allclose(e_b, e_p, rtol=2e-6)
    scale = np.max(np.abs(f_p))
    np.testing.assert_allclose(f_b / scale, f_p / scale, atol=2e-6)

    # rebucket keeps the balanced capacity and slack (stable shapes)
    fp_r = fp_b.rebucket(fp_b.bucket(positions), cell)
    assert fp_r.clist.slot_mask.shape == fp_b.clist.slot_mask.shape
    assert fp_r.clist.slack == fp_b.clist.slack
    assert fp_r.aligned_pad == fp_b.aligned_pad
