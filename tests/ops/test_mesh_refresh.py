"""Bucket-reuse (refresh) path of the tiled mesh backend: same-positions
refresh is exact, small drifts stay valid and correct, large drifts flag."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import CoulombPotential, PMECalculator
from torchpme_tpu.ops.mesh_tiled import (
    compute_tiled_interpolation,
    refresh_tiled_interpolation,
    tiled_points_to_mesh,
)


def make_system(seed=0, n=80):
    rng = np.random.default_rng(seed)
    cell = jnp.asarray(np.eye(3) * 6.0, jnp.float32)
    positions = jnp.asarray(rng.uniform(0, 6, (n, 3)), jnp.float32)
    charges = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    return cell, positions, charges


NS, NODES = (32, 32, 32), 4


def test_refresh_same_positions_is_identity():
    cell, positions, charges = make_system()
    inv = jnp.linalg.inv(cell)
    interp = compute_tiled_interpolation(positions, inv, NS, NODES, "Lagrange")
    refreshed, valid = refresh_tiled_interpolation(interp, positions, inv, "Lagrange")
    assert bool(valid)
    np.testing.assert_allclose(refreshed.weights, interp.weights, atol=1e-6)
    np.testing.assert_array_equal(refreshed.local_x, interp.local_x)
    np.testing.assert_array_equal(refreshed.start_z, interp.start_z)
    rho_a = tiled_points_to_mesh(interp, charges)
    rho_b = tiled_points_to_mesh(refreshed, charges)
    np.testing.assert_allclose(rho_a, rho_b, atol=1e-7)


def test_refresh_small_drift_matches_rebucket():
    cell, positions, charges = make_system()
    inv = jnp.linalg.inv(cell)
    interp = compute_tiled_interpolation(positions, inv, NS, NODES, "Lagrange")
    rng = np.random.default_rng(1)
    moved = positions + jnp.asarray(
        rng.uniform(-0.02, 0.02, positions.shape), jnp.float32
    )
    refreshed, valid = refresh_tiled_interpolation(interp, moved, inv, "Lagrange")
    fresh = compute_tiled_interpolation(moved, inv, NS, NODES, "Lagrange")
    rho_refreshed = tiled_points_to_mesh(refreshed, charges)
    rho_fresh = tiled_points_to_mesh(fresh, charges)
    if bool(valid):
        np.testing.assert_allclose(rho_refreshed, rho_fresh, atol=1e-6)


def test_refresh_large_drift_flags_invalid():
    cell, positions, charges = make_system()
    inv = jnp.linalg.inv(cell)
    interp = compute_tiled_interpolation(positions, inv, NS, NODES, "Lagrange")
    # shift every atom by two full tiles: every stencil leaves its window
    moved = positions + 3.0
    _, valid = refresh_tiled_interpolation(interp, moved, inv, "Lagrange")
    assert not bool(valid)


def test_pme_with_reused_buckets_matches_and_differentiates():
    cell, positions, charges = make_system()
    calc = PMECalculator(
        CoulombPotential(smearing=jnp.float32(0.8)),
        mesh_spacing=0.4,
        mesh_backend="tiled",
    )
    ns = calc.get_ns_mesh(cell)
    interp = compute_tiled_interpolation(
        positions, jnp.linalg.inv(cell), ns, calc.interpolation_nodes, "Lagrange"
    )
    idx = jnp.asarray([[0, 1]])
    dist = jnp.asarray([1.0], jnp.float32)

    ref = calc(charges, cell, positions, idx, dist, ns_mesh=ns)
    reused = calc(charges, cell, positions, idx, dist, tiled_interp=interp)
    np.testing.assert_allclose(np.asarray(reused), np.asarray(ref), atol=1e-6)

    # gradients flow through the refreshed weights to positions
    def energy(positions):
        pot = calc(charges, cell, positions, idx, dist, tiled_interp=interp)
        return jnp.sum(pot * charges)

    def energy_fresh(positions):
        pot = calc(charges, cell, positions, idx, dist, ns_mesh=ns)
        return jnp.sum(pot * charges)

    g_reuse = jax.grad(energy)(positions)
    g_fresh = jax.grad(energy_fresh)(positions)
    np.testing.assert_allclose(
        np.asarray(g_reuse), np.asarray(g_fresh), atol=2e-4
    )


def test_refresh_requires_atom_indices():
    cell, positions, _ = make_system()
    inv = jnp.linalg.inv(cell)
    interp = compute_tiled_interpolation(positions, inv, NS, NODES, "Lagrange")
    stripped = jax.tree_util.tree_map(lambda x: x, interp)
    object.__setattr__(stripped, "atom_of_slot", None)
    with pytest.raises(ValueError, match="bucket->atom"):
        refresh_tiled_interpolation(stripped, positions, inv, "Lagrange")


class TestStalenessGuards:
    """Drift/overflow must be observable: eager raises, jit returns NaN
    (never silently wrong forces)."""

    def setup_method(self):
        self.cell, self.positions, self.charges = make_system()
        self.calc = PMECalculator(
            CoulombPotential(smearing=jnp.float32(0.8)),
            mesh_spacing=0.4,
            mesh_backend="tiled",
        )
        self.ns = self.calc.get_ns_mesh(self.cell)
        self.idx = jnp.asarray([[0, 1]])
        self.dist = jnp.asarray([1.0], jnp.float32)

    def test_eager_drift_raises(self):
        interp = compute_tiled_interpolation(
            self.positions, jnp.linalg.inv(self.cell), self.ns,
            self.calc.interpolation_nodes, "Lagrange",
        )
        with pytest.raises(ValueError, match="stale"):
            self.calc(
                self.charges, self.cell, self.positions + 3.0,
                self.idx, self.dist, tiled_interp=interp,
            )

    def test_jitted_drift_poisons_with_nan(self):
        interp = compute_tiled_interpolation(
            self.positions, jnp.linalg.inv(self.cell), self.ns,
            self.calc.interpolation_nodes, "Lagrange",
        )

        @jax.jit
        def step(pos):
            return self.calc(
                self.charges, self.cell, pos, self.idx, self.dist,
                tiled_interp=interp,
            )

        ok = np.asarray(step(self.positions))
        assert np.all(np.isfinite(ok))
        bad = np.asarray(step(self.positions + 3.0))
        assert np.all(np.isnan(bad))

    def test_jitted_capacity_overflow_poisons_with_nan(self):
        calc = PMECalculator(
            CoulombPotential(smearing=jnp.float32(0.8)),
            mesh_spacing=0.4,
            mesh_backend="tiled",
            tile_capacity=1,
        )

        @jax.jit
        def step(pos):
            return calc(
                self.charges, self.cell, pos, self.idx, self.dist,
                ns_mesh=self.ns,
            )

        bad = np.asarray(step(self.positions))
        assert np.all(np.isnan(bad))

    def test_jitted_forces_poison_too(self):
        interp = compute_tiled_interpolation(
            self.positions, jnp.linalg.inv(self.cell), self.ns,
            self.calc.interpolation_nodes, "Lagrange",
        )

        @jax.jit
        def forces(pos):
            def energy(pos):
                pot = self.calc(
                    self.charges, self.cell, pos, self.idx, self.dist,
                    tiled_interp=interp,
                )
                return jnp.sum(pot * self.charges)

            return jax.grad(energy)(pos)

        assert np.all(np.isfinite(np.asarray(forces(self.positions))))
        assert np.all(np.isnan(np.asarray(forces(self.positions + 3.0))))
