"""Mesh-engine property tests (parity with reference
``tests/lib/test_mesh_interpolator.py``): charge conservation, exact on-grid
round trips, back-interpolation mass preservation, and sum-rule gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu.ops import (
    MeshInterpolator,
    compute_interpolation,
    mesh_to_points,
    points_to_mesh,
)

METHOD_ORDERS = [("Lagrange", n) for n in (3, 4, 5, 6, 7)] + [
    ("P3M", n) for n in (1, 2, 3, 4, 5)
]

CELLS = {
    "cubic": jnp.eye(3) * 3.0,
    "triclinic": jnp.asarray([[3.0, 0, 0], [1.2, 2.6, 0], [-0.3, 0.9, 2.4]]),
}


@pytest.mark.parametrize(("method", "nodes"), METHOD_ORDERS)
@pytest.mark.parametrize("cell_name", ["cubic", "triclinic"])
def test_charge_conservation(method, nodes, cell_name):
    """Spreading must conserve total charge exactly, for every stencil."""
    cell = CELLS[cell_name]
    rng = np.random.default_rng(42)
    positions = jnp.asarray(rng.uniform(0, 1, (17, 3))) @ cell
    charges = jnp.asarray(rng.normal(size=(17, 2)))

    interp = compute_interpolation(
        positions, jnp.linalg.inv(cell), (8, 4, 16), nodes, method
    )
    mesh = points_to_mesh(interp, charges)
    np.testing.assert_allclose(
        mesh.sum(axis=(1, 2, 3)), charges.sum(axis=0), rtol=1e-12, atol=1e-12
    )


@pytest.mark.parametrize("method", ["Lagrange", "P3M"])
def test_exact_on_grid(method):
    """On-grid points with low-order stencils reproduce values exactly.

    P3M order 1 (nearest grid point) and Lagrange order 3 evaluated exactly on
    grid points place all weight on one node.
    """
    cell = jnp.eye(3) * 4.0
    ns = (4, 4, 4)
    nodes = 1 if method == "P3M" else 3
    # grid points at integer multiples of cell/ns
    positions = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0], [2.0, 1.0, 0.0]])
    charges = jnp.asarray([[1.0], [-2.0], [0.5]])
    interp = compute_interpolation(positions, jnp.linalg.inv(cell), ns, nodes, method)
    mesh = points_to_mesh(interp, charges)
    # each atom's full charge lands on its own grid point
    assert float(mesh[0, 0, 0, 0]) == pytest.approx(1.0, abs=1e-14)
    assert float(mesh[0, 1, 2, 3]) == pytest.approx(-2.0, abs=1e-14)
    assert float(mesh[0, 2, 1, 0]) == pytest.approx(0.5, abs=1e-14)
    # and interpolating back returns the original values
    back = mesh_to_points(interp, mesh)
    np.testing.assert_allclose(back, charges, atol=1e-14)


@pytest.mark.parametrize(("method", "nodes"), METHOD_ORDERS)
def test_back_interpolation_mass(method, nodes):
    """Back-interpolation of a constant mesh returns that constant.

    The 1D weights sum to one, so a constant field is reproduced exactly at
    any position.
    """
    cell = CELLS["triclinic"]
    rng = np.random.default_rng(7)
    positions = jnp.asarray(rng.uniform(0, 1, (23, 3))) @ cell
    interp = compute_interpolation(
        positions, jnp.linalg.inv(cell), (8, 8, 8), nodes, method
    )
    mesh = jnp.full((1, 8, 8, 8), 3.25)
    values = mesh_to_points(interp, mesh)
    np.testing.assert_allclose(values, 3.25, rtol=1e-12)


@pytest.mark.parametrize(("method", "nodes"), [("Lagrange", 4), ("P3M", 3)])
def test_sum_rule_gradients(method, nodes):
    """Total spread mass: ∂/∂q = 1, ∂/∂positions = 0, ∂/∂cell = 0."""
    cell = CELLS["triclinic"]
    rng = np.random.default_rng(3)
    positions = jnp.asarray(rng.uniform(0.1, 0.9, (9, 3))) @ cell
    charges = jnp.asarray(rng.normal(size=(9, 1)))

    def total_mass(charges, positions, cell):
        interp = compute_interpolation(
            positions, jnp.linalg.inv(cell), (8, 8, 8), nodes, method
        )
        return points_to_mesh(interp, charges).sum()

    gq, gp, gc = jax.grad(total_mass, argnums=(0, 1, 2))(charges, positions, cell)
    np.testing.assert_allclose(gq, 1.0, rtol=1e-12)
    np.testing.assert_allclose(gp, 0.0, atol=1e-10)
    np.testing.assert_allclose(gc, 0.0, atol=1e-10)


def test_spread_gather_transpose():
    """mesh_to_points is the exact adjoint of points_to_mesh."""
    cell = CELLS["cubic"]
    rng = np.random.default_rng(11)
    positions = jnp.asarray(rng.uniform(0, 1, (13, 3))) @ cell
    interp = compute_interpolation(
        positions, jnp.linalg.inv(cell), (8, 8, 8), 4, "Lagrange"
    )
    q = jnp.asarray(rng.normal(size=(13, 1)))
    f = jnp.asarray(rng.normal(size=(1, 8, 8, 8)))
    # <spread(q), f> == <q, gather(f)>
    lhs = jnp.vdot(points_to_mesh(interp, q), f)
    rhs = jnp.vdot(q, mesh_to_points(interp, f))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_interpolator_class_roundtrip():
    """The stateful shell mirrors the functional core."""
    cell = CELLS["cubic"]
    rng = np.random.default_rng(5)
    positions = jnp.asarray(rng.uniform(0, 1, (6, 3))) @ cell
    mi = MeshInterpolator(cell, (8, 8, 8), interpolation_nodes=4, method="Lagrange")
    mi.compute_weights(positions)
    charges = jnp.asarray(rng.normal(size=(6, 1)))
    mesh = mi.points_to_mesh(charges)
    np.testing.assert_allclose(mesh.sum(), charges.sum(), rtol=1e-12)
    xyz = mi.get_mesh_xyz()
    assert xyz.shape == (8, 8, 8, 3)


def test_invalid_method_and_orders():
    cell = CELLS["cubic"]
    with pytest.raises(ValueError, match="not supported"):
        MeshInterpolator(cell, (4, 4, 4), 4, method="spam")
    with pytest.raises(ValueError, match="from 3 to 7"):
        MeshInterpolator(cell, (4, 4, 4), 2, method="Lagrange")
    with pytest.raises(ValueError, match="from 1 to 5"):
        MeshInterpolator(cell, (4, 4, 4), 6, method="P3M")
