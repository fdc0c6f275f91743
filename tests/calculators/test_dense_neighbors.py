"""Dense per-atom neighbor layout ≡ pair-list layout (the TPU-native
scatter-free real-space path)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import Calculator, CoulombPotential, EwaldCalculator, PMECalculator
from torchpme_tpu.utils.neighbors import (
    compute_distances_dense,
    dense_neighbor_format,
    neighbor_list,
)

sys.path.append(str(Path(__file__).parents[1]))


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(9)
    n, box = 48, 7.0
    positions = rng.uniform(0, box, (n, 3))
    charges = rng.normal(size=(n, 1))
    charges -= charges.mean()
    cell = np.eye(3) * box
    idx, dist, shifts = neighbor_list(positions, cell, cutoff=2.5)
    return (
        jnp.asarray(positions),
        jnp.asarray(charges),
        jnp.asarray(cell),
        idx,
        dist,
        shifts,
    )


def test_converter_shapes_and_mask(system):
    positions, charges, cell, idx, dist, shifts = system
    n = positions.shape[0]
    dense = dense_neighbor_format(idx, dist, n, neighbor_shifts=shifts)
    C = dense["indices"].shape[1]
    assert dense["indices"].shape == (n, C)
    assert dense["distances"].shape == (n, C)
    assert dense["mask"].shape == (n, C)
    assert dense["shifts"].shape == (n, C, 3)
    # every pair appears twice in the dense (full) layout
    assert int(dense["mask"].sum()) == 2 * idx.shape[0]
    # capacity error when too small
    with pytest.raises(ValueError, match="below the densest atom"):
        dense_neighbor_format(idx, dist, n, capacity=1)


@pytest.mark.parametrize("calc_kind", ["direct", "ewald", "pme"])
def test_dense_equals_pairlist(system, calc_kind):
    positions, charges, cell, idx, dist, shifts = system
    n = positions.shape[0]
    dense = dense_neighbor_format(idx, dist, n)

    if calc_kind == "direct":
        calc = Calculator(CoulombPotential())
        extra = {}
    elif calc_kind == "ewald":
        calc = EwaldCalculator(CoulombPotential(smearing=0.8), lr_wavelength=0.4)
        extra = {"ns_kvectors": calc.get_ns_kvectors(cell)}
    else:
        calc = PMECalculator(CoulombPotential(smearing=0.8), mesh_spacing=0.4)
        extra = {"ns_mesh": calc.get_ns_mesh(cell)}

    ref = calc(charges, cell, positions, jnp.asarray(idx), jnp.asarray(dist), **extra)
    out = calc(
        charges,
        cell,
        positions,
        jnp.asarray(dense["indices"]),
        jnp.asarray(dense["distances"]),
        pair_mask=jnp.asarray(dense["mask"]),
        **extra,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_dense_forces_match_pairlist(system):
    positions, charges, cell, idx, dist, shifts = system
    n = positions.shape[0]
    dense = dense_neighbor_format(idx, dist, n, neighbor_shifts=shifts)
    calc = EwaldCalculator(CoulombPotential(smearing=0.8), lr_wavelength=0.4)
    ns_k = calc.get_ns_kvectors(cell)
    nbr = jnp.asarray(dense["indices"])
    mask = jnp.asarray(dense["mask"])
    dshifts = jnp.asarray(dense["shifts"])

    from torchpme_tpu.utils.neighbors import compute_distances

    def energy_dense(positions):
        d = compute_distances_dense(positions, nbr, cell=cell, neighbor_shifts=dshifts)
        pot = calc(charges, cell, positions, nbr, d, pair_mask=mask, ns_kvectors=ns_k)
        return jnp.sum(pot * charges)

    idx_j = jnp.asarray(idx)
    shifts_j = jnp.asarray(shifts)

    def energy_pairs(positions):
        d = compute_distances(positions, idx_j, cell=cell, neighbor_shifts=shifts_j)
        pot = calc(charges, cell, positions, idx_j, d, ns_kvectors=ns_k)
        return jnp.sum(pot * charges)

    e_dense, f_dense = jax.value_and_grad(energy_dense)(positions)
    e_pairs, f_pairs = jax.value_and_grad(energy_pairs)(positions)
    np.testing.assert_allclose(float(e_dense), float(e_pairs), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_dense), np.asarray(f_pairs), atol=1e-11)
