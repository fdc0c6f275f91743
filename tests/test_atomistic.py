"""Labeled atomistic interface tests (parity with reference
``tests/metatensor/test_calculator_metatensor.py`` /
``test_workflow_metatensor.py`` validation and workflow semantics)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import CoulombPotential
from torchpme_tpu.atomistic import (
    EwaldCalculator,
    NeighborList,
    PMECalculator,
    System,
)

sys.path.append(str(Path(__file__).parents[0]))
from helpers import neighbor_list


def make_system_and_neighbors(charge_data=True):
    positions = jnp.asarray([[0.0, 0, 0], [0.5, 0.5, 0.5]])
    cell = jnp.eye(3)
    types = jnp.asarray([55, 17])
    system = System(types=types, positions=positions, cell=cell)
    if charge_data:
        system = system.add_data("charge", jnp.asarray([[1.0], [-1.0]]))

    idx, dist, shifts = neighbor_list(
        np.asarray(positions), np.asarray(cell), cutoff=0.9
    )
    vectors = (
        np.asarray(positions)[idx[:, 1]]
        - np.asarray(positions)[idx[:, 0]]
        + shifts @ np.asarray(cell)
    )
    samples = jnp.asarray(np.concatenate([idx, shifts], axis=1))
    neighbors = NeighborList(samples=samples, vectors=jnp.asarray(vectors)[..., None])
    return system, neighbors


def test_labeled_output_matches_plain_calculator():
    from torchpme_tpu import EwaldCalculator as PlainEwald

    system, neighbors = make_system_and_neighbors()
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    out = calc(system, neighbors)
    plain = PlainEwald(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    expected = plain(
        system.get_data("charge"),
        system.cell,
        system.positions,
        neighbors.indices,
        neighbors.distances,
    )
    np.testing.assert_allclose(out.values, expected, rtol=1e-12)
    # labeled metadata: samples are (system, atom), properties charges_channel
    assert out.sample_names == ("system", "atom")
    assert out.property_names == ("charges_channel",)
    np.testing.assert_array_equal(np.asarray(out.samples)[:, 1], [0, 1])


def test_missing_charge_data_raises():
    system, neighbors = make_system_and_neighbors(charge_data=False)
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    with pytest.raises(ValueError, match="does not contain `charge` data"):
        calc(system, neighbors)


def test_invalid_sample_names_raise():
    system, neighbors = make_system_and_neighbors()
    bad = NeighborList(
        samples=neighbors.samples,
        vectors=neighbors.vectors,
        sample_names=("i", "j", "a", "b", "c"),
    )
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    with pytest.raises(ValueError, match="Invalid samples for `neighbors`"):
        calc(system, bad)


def test_invalid_components_raise():
    system, neighbors = make_system_and_neighbors()
    bad = NeighborList(
        samples=neighbors.samples,
        vectors=neighbors.vectors,
        component_names=("abc",),
    )
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    with pytest.raises(ValueError, match="Invalid components"):
        calc(system, bad)


def test_wrong_system_type_raises():
    _, neighbors = make_system_and_neighbors()
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    with pytest.raises(TypeError, match="must be a torchpme_tpu.atomistic.System"):
        calc("not a system", neighbors)


def test_pme_labeled_wrapper():
    system, neighbors = make_system_and_neighbors()
    calc = PMECalculator(CoulombPotential(smearing=0.2), mesh_spacing=0.1)
    out = calc(system, neighbors)
    assert out.values.shape == (2, 1)
    madelung = -float(jnp.sum(out.values * system.get_data("charge")))
    np.testing.assert_allclose(madelung, 2.0353610945, rtol=1e-4)


def test_multi_channel_labeled():
    system, neighbors = make_system_and_neighbors(charge_data=False)
    q = np.array([[1.0, 0.0], [0.0, -1.0]])  # one-hot species channels
    system = system.add_data("charge", jnp.asarray(q))
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    out = calc(system, neighbors)
    assert out.values.shape == (2, 2)
