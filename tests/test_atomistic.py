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


# --- metatensor boundary converters (torchpme_tpu/atomistic/convert.py) ----
#
# The real packages (metatensor / metatomic) cannot be installed on this box
# (no network egress), so two tiers:
#  * structural tests against duck-typed stand-ins mirroring the exact
#    attribute surface the reference wrapper touches
#    (/root/reference/src/torchpme/metatensor/calculator.py:40-166);
#  * importorskip-gated roundtrips that activate when the packages exist.


class _FakeLabels:
    def __init__(self, names, values):
        self.names = list(names)
        self.values = np.asarray(values)


class _FakeBlock:
    def __init__(self, values, samples, components=(), properties=None):
        self.values = values
        self.samples = samples
        self.components = list(components)
        self.properties = properties


class _FakeTensorMap:
    def __init__(self, blocks):
        self._blocks = blocks

    def __len__(self):
        return len(self._blocks)

    def block(self):
        return self._blocks[0]


class _FakeMetatomicSystem:
    def __init__(self, types, positions, cell, data=None):
        self.types = types
        self.positions = positions
        self.cell = cell
        self._data = data or {}

    def known_data(self):
        return list(self._data)

    def get_data(self, name):
        return self._data[name]


def _fake_mts_pair(torch_arrays=False):
    """A (System, neighbors TensorBlock) pair shaped like metatomic's."""
    box = lambda a: a  # noqa: E731
    if torch_arrays:
        torch = pytest.importorskip("torch")
        box = torch.as_tensor
    positions = np.asarray([[0.0, 0, 0], [0.5, 0.5, 0.5]])
    cell = np.eye(3)
    idx, dist, shifts = neighbor_list(positions, cell, cutoff=0.9)
    vectors = positions[idx[:, 1]] - positions[idx[:, 0]] + shifts @ cell
    charge_block = _FakeBlock(
        values=box(np.asarray([[1.0], [-1.0]])),
        samples=_FakeLabels(["atom"], np.arange(2).reshape(-1, 1)),
    )
    system = _FakeMetatomicSystem(
        types=box(np.asarray([55, 17])),
        positions=box(positions),
        cell=box(cell),
        data={"charge": _FakeTensorMap([charge_block])},
    )
    nb = _FakeBlock(
        values=box(vectors[..., None]),
        samples=_FakeLabels(
            ["first_atom", "second_atom", "cell_shift_a", "cell_shift_b",
             "cell_shift_c"],
            np.concatenate([idx, shifts], axis=1),
        ),
        components=[_FakeLabels(["xyz"], np.arange(3).reshape(-1, 1))],
        properties=_FakeLabels(["distance"], np.zeros((1, 1), np.int32)),
    )
    return system, nb


@pytest.mark.parametrize("torch_arrays", [False, True])
def test_convert_structural_roundtrip(torch_arrays):
    from torchpme_tpu.atomistic import (
        neighborlist_from_metatensor,
        system_from_metatensor,
    )

    mts_system, mts_nb = _fake_mts_pair(torch_arrays)
    system = system_from_metatensor(mts_system)
    neighbors = neighborlist_from_metatensor(mts_nb)

    ref_system, ref_neighbors = make_system_and_neighbors()
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    out = calc(system, neighbors)
    expected = calc(ref_system, ref_neighbors)
    np.testing.assert_allclose(out.values, expected.values, rtol=1e-12)


def test_convert_missing_charge_raises():
    from torchpme_tpu.atomistic import system_from_metatensor

    mts_system, _ = _fake_mts_pair()
    mts_system._data = {}
    with pytest.raises(ValueError, match="does not contain `charge` data"):
        system_from_metatensor(mts_system)


def test_convert_bad_sample_names_raises():
    from torchpme_tpu.atomistic import neighborlist_from_metatensor

    _, nb = _fake_mts_pair()
    nb.samples.names = ["i", "j", "a", "b", "c"]
    with pytest.raises(ValueError, match="Invalid samples"):
        neighborlist_from_metatensor(nb)


def test_convert_charge_with_components_raises():
    from torchpme_tpu.atomistic import system_from_metatensor

    mts_system, _ = _fake_mts_pair()
    mts_system._data["charge"].block().components.append(
        _FakeLabels(["xyz"], np.arange(3).reshape(-1, 1))
    )
    with pytest.raises(ValueError, match="should not have components"):
        system_from_metatensor(mts_system)


def test_labeled_to_metatensor_needs_backend():
    from torchpme_tpu.atomistic import labeled_to_metatensor, metatensor_backend

    system, neighbors = make_system_and_neighbors()
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    out = calc(system, neighbors)
    if metatensor_backend() is None:
        with pytest.raises(ImportError, match="metatensor"):
            labeled_to_metatensor(out)
    else:
        tmap = labeled_to_metatensor(out)
        block = tmap.block()
        assert list(block.samples.names) == ["system", "atom"]
        assert list(block.properties.names) == ["charges_channel"]
        np.testing.assert_allclose(
            np.asarray(block.values), np.asarray(out.values), rtol=1e-12
        )


def test_real_metatensor_roundtrip():
    """Full roundtrip through REAL metatensor objects (skips if absent)."""
    mts = pytest.importorskip("metatensor")
    from torchpme_tpu.atomistic import labeled_to_metatensor

    system, neighbors = make_system_and_neighbors()
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    out = calc(system, neighbors)
    tmap = labeled_to_metatensor(out, backend="numpy")
    assert isinstance(tmap, mts.TensorMap)
    np.testing.assert_allclose(
        np.asarray(tmap.block().values), np.asarray(out.values), rtol=1e-12
    )
