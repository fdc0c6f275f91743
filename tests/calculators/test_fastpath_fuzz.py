"""Randomized equivalence battery for the MD fast path.

For random (triclinic) systems, the full fast-path stack — cell-list real
space (with and without spill) + quadratic k-space energy — must reproduce
the neighbor-list + per-atom-potentials path: energies and all gradients
(positions, charges, cell), under jit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchpme_tpu as tpme
from torchpme_tpu.ops.rspace_cells import compute_cell_list
from torchpme_tpu.utils.neighbors import compute_distances, neighbor_list


@pytest.mark.parametrize("seed", [101, 102, 103])
def test_fast_path_matches_reference_path(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 120))
    box = float(rng.uniform(7.0, 10.0))
    skew = rng.uniform(-0.4, 0.4, size=3)
    cell = jnp.asarray(
        [[box, 0, 0], [skew[0], box, 0], [skew[1], skew[2], box]]
    )
    positions = jnp.asarray(rng.uniform(-1.0, box + 1.0, (n, 3)))
    charges = jnp.asarray(rng.normal(size=(n, 1)))
    cutoff = float(rng.uniform(2.0, 2.8))
    smearing = float(rng.uniform(0.8, 1.2))

    idx, dist, shifts = map(
        jnp.asarray,
        neighbor_list(np.asarray(positions), np.asarray(cell), cutoff),
    )
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=smearing), mesh_spacing=0.45
    )
    ns = calc.get_ns_mesh(cell)

    def e_ref(p, q, c):
        d = compute_distances(p, idx, cell=c, neighbor_shifts=shifts)
        return jnp.sum(calc(q, c, p, idx, d, ns_mesh=ns) * q)

    # tight capacity forces the spill side-list on roughly half the seeds
    clist = compute_cell_list(positions, cell, cutoff, capacity=8, spill=True)

    def e_fast(p, q, c):
        return calc.energy(q, c, p, cell_list=clist, ns_mesh=ns)

    args = (positions, charges, cell)
    e1, g1 = jax.jit(jax.value_and_grad(e_fast, argnums=(0, 1, 2)))(*args)
    e2, g2 = jax.value_and_grad(e_ref, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-10)
    for a, b in zip(g1, g2):
        scale = max(1e-10, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-9 * scale
        )


@pytest.mark.parametrize("seed", [201, 202])
def test_ewald_fast_path_matches_reference_path(seed):
    """Same battery for Ewald: cell-list real space + structure-factor
    quadratic k-space energy vs the per-atom neighbor-list path."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 80))
    box = float(rng.uniform(6.0, 9.0))
    cell = jnp.eye(3) * box
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
    charges = jnp.asarray(rng.normal(size=(n, 2)))
    cutoff = float(rng.uniform(2.0, 2.6))
    calc = tpme.EwaldCalculator(
        tpme.CoulombPotential(smearing=1.0), lr_wavelength=1.0
    )
    ns_k = calc.get_ns_kvectors(cell)
    idx, dist, shifts = map(
        jnp.asarray,
        neighbor_list(np.asarray(positions), np.asarray(cell), cutoff),
    )
    clist = compute_cell_list(positions, cell, cutoff)

    def e_fast(p, q, c):
        return calc.energy(q, c, p, cell_list=clist, ns_kvectors=ns_k)

    def e_ref(p, q, c):
        d = compute_distances(p, idx, cell=c, neighbor_shifts=shifts)
        return jnp.sum(calc(q, c, p, idx, d, ns_kvectors=ns_k) * q)

    args = (positions, charges, cell)
    e1, g1 = jax.jit(jax.value_and_grad(e_fast, argnums=(0, 1, 2)))(*args)
    e2, g2 = jax.value_and_grad(e_ref, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-10)
    for a, b in zip(g1, g2):
        scale = max(1e-10, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-9 * scale
        )


def test_direct_fast_path_matches_reference_path():
    """Direct (no-smearing) calculator: cell-list energy vs NL per-atom."""
    rng = np.random.default_rng(301)
    n, box = 50, 7.5
    cell = jnp.eye(3) * box
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
    charges = jnp.asarray(rng.normal(size=(n, 1)))
    cutoff = 2.4
    calc = tpme.Calculator(tpme.CoulombPotential())
    idx, dist, shifts = map(
        jnp.asarray,
        neighbor_list(np.asarray(positions), np.asarray(cell), cutoff),
    )
    clist = compute_cell_list(positions, cell, cutoff)

    def e_fast(p):
        return calc.energy(charges, cell, p, cell_list=clist)

    def e_ref(p):
        d = compute_distances(p, idx, cell=cell, neighbor_shifts=shifts)
        return jnp.sum(calc(charges, cell, p, idx, d) * charges)

    e1, g1 = jax.jit(jax.value_and_grad(e_fast))(positions)
    e2, g2 = jax.value_and_grad(e_ref)(positions)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-9)
