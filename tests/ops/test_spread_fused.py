"""Fused position→mesh Pallas spread ≡ XLA refresh+spread (interpret mode
on CPU), including the derivative-stencil custom VJP and the recomputed
staleness flag — parametrized over methods, stencil orders, channels, and
non-lane-aligned z extents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchpme_tpu as tpme
from torchpme_tpu.ops.mesh_tiled import (
    compute_tiled_interpolation,
    refresh_tiled_interpolation,
    tiled_points_to_mesh,
)
from torchpme_tpu.ops.pallas.spread_fused import (
    fused_tiled_density,
    supports_fused,
)


def make_system(n_atoms, n_channels=1, seed=0):
    rng = np.random.default_rng(seed)
    cell = jnp.asarray(np.diag([5.0, 5.0, 20.0]), jnp.float32)
    # includes unwrapped atoms slightly outside the cell
    positions = jnp.asarray(
        rng.uniform(-0.2, 1.2, (n_atoms, 3)) @ np.asarray(cell), jnp.float32
    )
    charges = jnp.asarray(rng.normal(size=(n_atoms, n_channels)), jnp.float32)
    return cell, positions, charges


@pytest.mark.parametrize(
    "method,nodes", [("Lagrange", 3), ("Lagrange", 4), ("Lagrange", 5),
                     ("Lagrange", 6), ("P3M", 3), ("P3M", 5)]
)
@pytest.mark.parametrize("n_channels,nz", [(1, 128), (2, 96)])
def test_fused_matches_xla_refresh_spread(method, nodes, n_channels, nz):
    ns = (16, 16, nz)
    cell, positions, charges = make_system(60, n_channels)
    inv = jnp.linalg.inv(cell)
    interp = compute_tiled_interpolation(positions, inv, ns, nodes, method)
    assert supports_fused(interp, jnp.float32)

    new, valid_ref = refresh_tiled_interpolation(interp, positions, inv, method)
    rho_ref = tiled_points_to_mesh(new, charges, impl="xla")
    rho_f, valid_f = fused_tiled_density(interp, positions, inv, charges, method)
    np.testing.assert_allclose(np.asarray(rho_f), np.asarray(rho_ref), atol=1e-5)
    assert bool(valid_ref) == bool(valid_f) is True


@pytest.mark.parametrize("method,nodes", [("Lagrange", 5), ("P3M", 4)])
def test_fused_vjp_matches_xla_autodiff(method, nodes):
    ns = (16, 16, 64)
    cell, positions, charges = make_system(48, 1, seed=1)
    inv = jnp.linalg.inv(cell)
    interp = compute_tiled_interpolation(positions, inv, ns, nodes, method)
    rng = np.random.default_rng(2)

    def rho_shape():
        new, _ = refresh_tiled_interpolation(interp, positions, inv, method)
        return tiled_points_to_mesh(new, charges, impl="xla").shape

    w = jnp.asarray(rng.normal(size=rho_shape()), jnp.float32)

    def loss_xla(p, q):
        new, _ = refresh_tiled_interpolation(interp, p, inv, method)
        return jnp.sum(tiled_points_to_mesh(new, q, impl="xla") * w)

    def loss_fused(p, q):
        rho, _ = fused_tiled_density(interp, p, inv, q, method)
        return jnp.sum(rho * w)

    g_ref = jax.grad(loss_xla, argnums=(0, 1))(positions, charges)
    g_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(positions, charges)
    for a, b in zip(g_ref, g_f):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale
        )


def test_fused_staleness_flag():
    ns, nodes = (16, 16, 32), 5
    cell = jnp.asarray(np.eye(3) * 5.0, jnp.float32)
    inv = jnp.linalg.inv(cell)
    rng = np.random.default_rng(4)
    positions = jnp.asarray(rng.uniform(0, 5, (40, 3)), jnp.float32)
    charges = jnp.asarray(rng.normal(size=(40, 1)), jnp.float32)
    interp = compute_tiled_interpolation(positions, inv, ns, nodes, "Lagrange")
    drifted = positions.at[7].add(jnp.asarray([2.6, 0.0, 0.0], jnp.float32))
    _, valid = fused_tiled_density(interp, drifted, inv, charges, "Lagrange")
    assert not bool(valid)
    _, valid_ref = refresh_tiled_interpolation(interp, drifted, inv, "Lagrange")
    assert not bool(valid_ref)


def test_fused_requires_slot_indices():
    from dataclasses import replace

    ns, nodes = (16, 16, 32), 4
    cell, positions, charges = make_system(30)
    inv = jnp.linalg.inv(cell)
    interp = compute_tiled_interpolation(positions, inv, ns, nodes, "Lagrange")
    stripped = replace(interp, atom_of_slot=None)
    assert not supports_fused(stripped, jnp.float32)
    with pytest.raises(ValueError, match="bucket->atom"):
        fused_tiled_density(stripped, positions, inv, charges, "Lagrange")


def test_mdfastpath_fused_matches_tiled():
    """Full-calculator equivalence: MDFastPath(mesh_impl='fused') ==
    MDFastPath(mesh_impl='tiled'), energy and gradients (rows + cell)."""
    rng = np.random.default_rng(3)
    n, box = 150, 12.0
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    charges = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=1.0),
        mesh_spacing=0.75,
        interpolation_nodes=5,
    )
    ns = calc.get_ns_mesh(cell)
    fp_t = tpme.MDFastPath.create(
        calc, positions, cell, cutoff=3.0, ns_mesh=ns, mesh_impl="tiled"
    )
    fp_f = tpme.MDFastPath.create(
        calc, positions, cell, cutoff=3.0, ns_mesh=ns, mesh_impl="fused"
    )
    rows = fp_t.bucket(positions)
    e1, g1 = jax.value_and_grad(fp_t.energy, argnums=(1, 2))(charges, cell, rows)
    e2, g2 = jax.value_and_grad(fp_f.energy, argnums=(1, 2))(charges, cell, rows)
    assert abs(float(e1 - e2)) < 1e-4 * abs(float(e1))
    for a, b in zip(g1, g2):
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5 * scale
        )


def test_mdfastpath_aligned_matches_tiled():
    """Tile-aligned MD state (cell rows double as mesh-tile slots, spill
    side list exercised) == tiled path: energy + cell + force gradients."""
    rng = np.random.default_rng(3)
    n, box = 400, 16.0
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    positions = jnp.asarray(rng.uniform(-1, box + 1, (n, 3)), jnp.float32)
    charges = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=1.0),
        mesh_spacing=0.5,
        interpolation_nodes=5,
    )
    ns = (32, 32, 32)  # 4x4 tiles, tile edge 4.0 >= cutoff 3.0

    fp_t = tpme.MDFastPath.create(
        calc, positions, cell, cutoff=3.0, ns_mesh=ns, mesh_impl="tiled"
    )
    fp_a = tpme.MDFastPath.create(
        calc, positions, cell, cutoff=3.0, ns_mesh=ns, mesh_impl="aligned"
    )
    assert fp_a.cell_grid[:2] == (4, 4)
    assert fp_a.clist.extra_index is not None  # spill path exercised
    e1, g1 = jax.value_and_grad(fp_t.energy, argnums=(1, 2))(
        charges, cell, fp_t.bucket(positions)
    )
    e2, g2 = jax.jit(jax.value_and_grad(fp_a.energy, argnums=(1, 2)))(
        charges, cell, fp_a.bucket(positions)
    )
    assert abs(float(e1 - e2)) < 2e-4 * abs(float(e1))
    np.testing.assert_allclose(
        np.asarray(g2[0]), np.asarray(g1[0]),
        atol=2e-4 * float(jnp.abs(g1[0]).max()),
    )
    f1, f2 = fp_t.unbucket(g1[1]), fp_a.unbucket(g2[1])
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(f1), atol=2e-4 * float(jnp.abs(f1).max())
    )


def test_mdfastpath_aligned_p3m_matches_tiled():
    """Aligned state over the P3M stencils (even-node floor path)."""
    rng = np.random.default_rng(21)
    n, box = 250, 14.0
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    charges = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    calc = tpme.P3MCalculator(
        tpme.CoulombPotential(smearing=1.0), interpolation_nodes=4
    )
    ns = (32, 32, 32)  # tile edge 3.5 >= cutoff 3.0
    fp_t = tpme.MDFastPath.create(
        calc, positions, cell, cutoff=3.0, ns_mesh=ns, mesh_impl="tiled"
    )
    fp_a = tpme.MDFastPath.create(
        calc, positions, cell, cutoff=3.0, ns_mesh=ns, mesh_impl="aligned"
    )
    e1, g1 = jax.value_and_grad(fp_t.energy, argnums=2)(
        charges, cell, fp_t.bucket(positions)
    )
    e2, g2 = jax.jit(jax.value_and_grad(fp_a.energy, argnums=2))(
        charges, cell, fp_a.bucket(positions)
    )
    assert abs(float(e1 - e2)) < 2e-4 * abs(float(e1))
    np.testing.assert_allclose(
        np.asarray(fp_a.unbucket(g2)), np.asarray(fp_t.unbucket(g1)),
        atol=2e-4 * float(jnp.abs(g1).max()),
    )


def test_mdfastpath_aligned_rejects_bad_geometry():
    """Tile edge below the cutoff must be refused eagerly."""
    rng = np.random.default_rng(9)
    positions = jnp.asarray(rng.uniform(0, 16, (100, 3)), jnp.float32)
    cell = jnp.eye(3, dtype=jnp.float32) * 16.0
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=1.0), interpolation_nodes=4
    )
    with pytest.raises(ValueError, match="aligned MD state"):
        tpme.MDFastPath.create(
            calc, positions, cell, cutoff=3.0, ns_mesh=(128, 128, 128),
            mesh_impl="aligned",  # tile edge 16/16 = 1.0 < 3.0
        )


def test_mdfastpath_aligned_staleness_poisons():
    """Drift an atom out of its cell: the aligned step must return NaN
    (mesh staleness is implied by the cell-list flag)."""
    rng = np.random.default_rng(12)
    n, box = 300, 16.0
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    charges = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=1.0), interpolation_nodes=4
    )
    fp = tpme.MDFastPath.create(
        calc, positions, cell, cutoff=4.0, ns_mesh=(32, 32, 32),
        mesh_impl="aligned",
    )
    rows = fp.bucket(positions)
    e_ok = jax.jit(fp.energy)(charges, cell, rows)
    assert np.isfinite(float(e_ok))
    drifted = rows.at[fp.row_of_atom[5]].add(
        jnp.asarray([4.5, 0.0, 0.0], jnp.float32)
    )
    e_stale = jax.jit(fp.energy)(charges, cell, drifted)
    assert np.isnan(float(e_stale))
    # rebucket recovers, preserving mesh_impl
    fp2 = fp.rebucket(drifted, cell)
    assert fp2.mesh_impl == "aligned"
    e2 = jax.jit(fp2.energy)(charges, cell, fp2.bucket(fp.unbucket(drifted)))
    assert np.isfinite(float(e2))


def test_mdfastpath_rejects_unknown_mesh_impl():
    rng = np.random.default_rng(5)
    positions = jnp.asarray(rng.uniform(0, 8, (50, 3)), jnp.float32)
    cell = jnp.eye(3, dtype=jnp.float32) * 8.0
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=0.6), interpolation_nodes=4
    )
    with pytest.raises(ValueError, match="mesh_impl"):
        tpme.MDFastPath.create(
            calc, positions, cell, cutoff=1.5, ns_mesh=(32, 32, 32),
            mesh_impl="nope",
        )
