"""Pallas mesh kernels ≡ XLA tiled backend (interpret mode on CPU),
including the custom-VJP gradients through positions and charges —
parametrized over charge channels and non-lane-aligned z extents
(multi-channel LODE-style spreading rides the same kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu.ops.mesh_tiled import (
    compute_tiled_interpolation,
    tiled_mesh_to_points,
    tiled_points_to_mesh,
)
from torchpme_tpu.ops.pallas.mesh_pallas import supports_pallas


def make_system(ns, n_atoms, n_channels=1, seed=0):
    rng = np.random.default_rng(seed)
    cell = jnp.asarray(np.diag([5.0, 5.0, 20.0]), jnp.float32)
    positions = jnp.asarray(
        rng.uniform(0, 1, (n_atoms, 3)) @ np.asarray(cell), jnp.float32
    )
    charges = jnp.asarray(rng.normal(size=(n_atoms, n_channels)), jnp.float32)
    return cell, positions, charges


@pytest.mark.parametrize("nodes", [3, 4, 5])
@pytest.mark.parametrize("n_channels,nz", [(1, 128), (3, 128), (2, 96)])
def test_pallas_matches_xla(nodes, n_channels, nz):
    ns = (16, 16, nz)
    cell, positions, charges = make_system(ns, 60, n_channels)
    inv = jnp.linalg.inv(cell)
    interp = compute_tiled_interpolation(positions, inv, ns, nodes, "Lagrange")
    assert supports_pallas(interp, n_channels, jnp.float32)

    rho_x = tiled_points_to_mesh(interp, charges, impl="xla")
    rho_p = tiled_points_to_mesh(interp, charges, impl="pallas")
    np.testing.assert_allclose(rho_p, rho_x, atol=1e-6)

    rng = np.random.default_rng(1)
    field = jnp.asarray(rng.normal(size=rho_x.shape), jnp.float32)
    g_x = tiled_mesh_to_points(interp, field, impl="xla")
    g_p = tiled_mesh_to_points(interp, field, impl="pallas")
    np.testing.assert_allclose(g_p, g_x, atol=1e-6)


@pytest.mark.parametrize("n_channels,nz", [(1, 128), (2, 96)])
def test_pallas_custom_vjp_matches_xla_autodiff(n_channels, nz):
    ns, nodes = (16, 16, nz), 5
    cell, positions, charges = make_system(ns, 48, n_channels)
    inv = jnp.linalg.inv(cell)

    def make_loss(impl):
        def loss(positions, charges):
            interp = compute_tiled_interpolation(positions, inv, ns, nodes, "Lagrange")
            rho = tiled_points_to_mesh(interp, charges, impl=impl)
            back = tiled_mesh_to_points(interp, rho * 1.5, impl=impl)
            return jnp.sum(rho**2) + jnp.sum(back * charges)

        return loss

    g_x = jax.grad(make_loss("xla"), argnums=(0, 1))(positions, charges)
    g_p = jax.grad(make_loss("pallas"), argnums=(0, 1))(positions, charges)
    scale = float(jnp.abs(g_x[0]).max())
    np.testing.assert_allclose(g_p[0], g_x[0], atol=2e-6 * scale)
    np.testing.assert_allclose(g_p[1], g_x[1], atol=1e-5)


def test_supports_pallas_gates():
    ns = (16, 16, 128)
    cell, positions, _ = make_system(ns, 20)
    interp = compute_tiled_interpolation(
        positions, jnp.linalg.inv(cell), ns, 4, "Lagrange"
    )
    assert supports_pallas(interp, 1, jnp.float32)
    assert supports_pallas(interp, 2, jnp.float32)  # multi-channel works
    assert not supports_pallas(interp, 1, jnp.float64)  # dtype
    odd_z = compute_tiled_interpolation(
        positions, jnp.linalg.inv(cell), (16, 16, 64), 4, "Lagrange"
    )
    assert supports_pallas(odd_z, 1, jnp.float32)  # any z extent works

    from torchpme_tpu.ops.mesh_tiled import tiled_points_to_mesh

    with pytest.raises(ValueError, match="Pallas mesh kernels require"):
        tiled_points_to_mesh(
            odd_z, jnp.ones((20, 1), jnp.float64), impl="pallas"
        )
