"""Tiled (MXU-contraction) mesh backend ≡ scatter reference, exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu.ops.mesh import compute_interpolation, mesh_to_points, points_to_mesh
from torchpme_tpu.ops.mesh_tiled import (
    compute_tiled_interpolation,
    supports_tiling,
    tiled_mesh_to_points,
    tiled_points_to_mesh,
)

CASES = [
    ((32, 32, 32), 5, "Lagrange", 200),
    ((16, 32, 64), 4, "P3M", 77),
    ((32, 16, 32), 3, "Lagrange", 50),
    ((16, 16, 16), 7, "Lagrange", 33),
    ((16, 16, 16), 1, "P3M", 9),
]


def make_system(ns, n_atoms, seed=0):
    rng = np.random.default_rng(seed)
    cell = jnp.asarray(np.diag([7.0, 6.0, 9.0]) + rng.normal(scale=0.3, size=(3, 3)))
    positions = jnp.asarray(rng.uniform(0, 1, (n_atoms, 3))) @ cell
    charges = jnp.asarray(rng.normal(size=(n_atoms, 2)))
    return cell, positions, charges


@pytest.mark.parametrize(("ns", "nodes", "method", "n_atoms"), CASES)
def test_tiled_matches_scatter_exactly(ns, nodes, method, n_atoms):
    cell, positions, charges = make_system(ns, n_atoms)
    inv = jnp.linalg.inv(cell)
    assert supports_tiling(ns, nodes)

    ref = compute_interpolation(positions, inv, ns, nodes, method)
    tiled = compute_tiled_interpolation(positions, inv, ns, nodes, method)
    assert int(tiled.dropped) == 0

    rho_ref = points_to_mesh(ref, charges)
    rho_tiled = tiled_points_to_mesh(tiled, charges)
    np.testing.assert_allclose(rho_tiled, rho_ref, atol=5e-14)

    rng = np.random.default_rng(1)
    field = jnp.asarray(rng.normal(size=rho_ref.shape))
    np.testing.assert_allclose(
        tiled_mesh_to_points(tiled, field), mesh_to_points(ref, field), atol=5e-14
    )


def test_tiled_gradients_match_scatter():
    ns, nodes, method = (32, 32, 32), 4, "Lagrange"
    cell, positions, charges = make_system(ns, 64)
    inv = jnp.linalg.inv(cell)

    def total_scatter(positions, charges):
        interp = compute_interpolation(positions, inv, ns, nodes, method)
        rho = points_to_mesh(interp, charges)
        return jnp.sum(rho**2)

    def total_tiled(positions, charges):
        interp = compute_tiled_interpolation(positions, inv, ns, nodes, method)
        rho = tiled_points_to_mesh(interp, charges)
        return jnp.sum(rho**2)

    g_ref = jax.grad(total_scatter, argnums=(0, 1))(positions, charges)
    g_tiled = jax.grad(total_tiled, argnums=(0, 1))(positions, charges)
    for a, b in zip(g_tiled, g_ref):
        np.testing.assert_allclose(a, b, atol=1e-11)


def test_capacity_overflow_is_counted():
    ns = (16, 16, 16)
    cell = jnp.eye(3) * 4.0
    # all atoms in one corner → single tile, capacity 2 overflows
    positions = jnp.asarray(np.full((20, 3), 0.1))
    tiled = compute_tiled_interpolation(
        positions, jnp.linalg.inv(cell), ns, 3, "Lagrange", capacity=2
    )
    assert int(tiled.dropped) == 18


def test_pme_tiled_backend_raises_on_overflow():
    from torchpme_tpu import CoulombPotential, PMECalculator

    cell = jnp.eye(3) * 4.0
    positions = jnp.asarray(np.full((20, 3), 0.1))
    charges = jnp.asarray(np.ones((20, 1)))
    calc = PMECalculator(
        CoulombPotential(smearing=0.5),
        mesh_spacing=0.25,
        mesh_backend="tiled",
        tile_capacity=2,
    )
    with pytest.raises(ValueError, match="tile capacity"):
        calc(
            charges,
            cell,
            positions,
            jnp.zeros((1, 2), jnp.int32),
            jnp.ones((1,)),
        )


def test_supports_tiling_limits():
    assert not supports_tiling((8, 16, 16), 4)  # x tile grid odd
    assert not supports_tiling((16, 8, 16), 4)
    assert supports_tiling((16, 16, 4), 4)  # z is never tiled
    assert not supports_tiling((16, 16, 16), 10)  # stencil exceeds window


def test_pme_backend_flag_equivalence():
    """mesh_backend='tiled' and 'scatter' agree through the full calculator."""
    from torchpme_tpu import CoulombPotential, PMECalculator

    rng = np.random.default_rng(5)
    cell = jnp.eye(3) * 5.0
    positions = jnp.asarray(rng.uniform(0, 5, (40, 3)))
    charges = jnp.asarray(rng.normal(size=(40, 1)))
    charges = charges - charges.mean()
    idx = jnp.asarray([[0, 1]])
    dist = jnp.asarray([1.0])
    outs = []
    for backend in ("scatter", "tiled"):
        calc = PMECalculator(
            CoulombPotential(smearing=1.0), mesh_spacing=0.3, mesh_backend=backend
        )
        outs.append(calc(charges, cell, positions, idx, dist))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-13)


def test_auto_capacity_handles_clustered_systems():
    """Eager bucketing sizes capacity from the exact max tile occupancy, so
    inhomogeneous (slab/cluster) systems work without manual `capacity`."""
    rng = np.random.default_rng(3)
    cell = jnp.asarray(np.eye(3) * 8.0)
    # all 200 atoms inside one 1 Å corner cube → essentially a single xy tile
    positions = jnp.asarray(rng.uniform(0, 1.0, (200, 3)))
    charges = jnp.asarray(rng.normal(size=(200, 1)))
    ns = (32, 32, 32)
    tiled = compute_tiled_interpolation(
        positions, jnp.linalg.inv(cell), ns, 4, "Lagrange"
    )
    assert int(tiled.dropped) == 0
    interp = compute_interpolation(positions, jnp.linalg.inv(cell), ns, 4, "Lagrange")
    np.testing.assert_allclose(
        tiled_points_to_mesh(tiled, charges),
        points_to_mesh(interp, charges),
        atol=1e-10,
    )


@pytest.mark.parametrize("nodes", [4, 5, 6])
def test_tiled_dipole_matches_scatter(nodes):
    """Tiled dipolar spread/gather (one batched GEMM with per-axis gradient
    stencils concatenated on the reduction dim) equals the scatter reference
    to machine precision — values AND every gradient (mu, cell, positions),
    triclinic cell included."""
    import torchpme_tpu as tpme

    rng = np.random.default_rng(0)
    n, box = 90, 7.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)))
    mu = jnp.asarray(rng.normal(size=(n, 3)))
    cell = jnp.asarray(np.eye(3) * box + rng.normal(scale=0.04, size=(3, 3)))

    calcs = {
        backend: tpme.PMECalculatorDipole(
            tpme.PotentialDipole(smearing=0.9),
            mesh_spacing=0.4,
            interpolation_nodes=nodes,
            mesh_backend=backend,
        )
        for backend in ("scatter", "tiled")
    }
    ns = calcs["scatter"].get_ns_kvectors(cell)

    outs = {}
    for backend, calc in calcs.items():
        def energy(mu, cell, pos, calc=calc):
            return jnp.sum(
                calc._compute_kspace(mu, cell, pos, ns_kvectors=ns) * mu
            )

        outs[backend] = jax.value_and_grad(energy, argnums=(0, 1, 2))(
            mu, cell, pos
        )
    v_s, g_s = outs["scatter"]
    v_t, g_t = outs["tiled"]
    np.testing.assert_allclose(float(v_t), float(v_s), rtol=1e-12)
    for a, b in zip(g_t, g_s):
        scale = float(jnp.max(jnp.abs(b)))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-12
        )


def test_tiled_dipole_requires_derivatives():
    from torchpme_tpu.ops.mesh_tiled import (
        compute_tiled_interpolation,
        tiled_dipoles_to_mesh,
    )

    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.uniform(0, 4.0, (10, 3)))
    interp = compute_tiled_interpolation(
        pos, jnp.eye(3) / 4.0, (16, 16, 16), 4, "Lagrange"
    )
    with pytest.raises(ValueError, match="derivatives=True"):
        tiled_dipoles_to_mesh(interp, jnp.zeros((10, 3)))
