"""Negative tests for every input-validation branch (parity with reference
``tests/calculators/test_calculator.py:51-244``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import Calculator, CoulombPotential


@pytest.fixture
def good_inputs():
    return dict(
        charges=jnp.asarray([[1.0], [-1.0]]),
        cell=jnp.eye(3),
        positions=jnp.asarray([[0.0, 0, 0], [0.5, 0.5, 0.5]]),
        neighbor_indices=jnp.asarray([[0, 1]]),
        neighbor_distances=jnp.asarray([0.866]),
    )


@pytest.fixture
def calc():
    return Calculator(CoulombPotential())


def test_good_inputs_pass(calc, good_inputs):
    out = calc(**good_inputs)
    assert out.shape == (2, 1)


def test_positions_shape(calc, good_inputs):
    good_inputs["positions"] = jnp.zeros((2, 4))
    with pytest.raises(ValueError, match=r"positions.*\[n_atoms, 3\]"):
        calc(**good_inputs)


def test_cell_shape(calc, good_inputs):
    good_inputs["cell"] = jnp.eye(4)
    with pytest.raises(ValueError, match=r"cell.*\[3, 3\]"):
        calc(**good_inputs)


def test_cell_dtype(calc, good_inputs):
    good_inputs["cell"] = jnp.eye(3, dtype=jnp.float32)
    with pytest.raises(TypeError, match="type of `cell`"):
        calc(**good_inputs)


def test_charges_dim(calc, good_inputs):
    good_inputs["charges"] = jnp.asarray([1.0, -1.0])
    with pytest.raises(ValueError, match="2-dimensional"):
        calc(**good_inputs)


def test_charges_atom_count(calc, good_inputs):
    good_inputs["charges"] = jnp.ones((3, 1))
    with pytest.raises(ValueError, match=r"\[n_atoms, n_channels\]"):
        calc(**good_inputs)


def test_charges_dtype(calc, good_inputs):
    good_inputs["charges"] = jnp.ones((2, 1), dtype=jnp.float32)
    with pytest.raises(TypeError, match="type of `charges`"):
        calc(**good_inputs)


def test_neighbor_indices_shape(calc, good_inputs):
    good_inputs["neighbor_indices"] = jnp.zeros((1, 3), dtype=jnp.int32)
    with pytest.raises(ValueError, match=r"\[num_neighbors, 2\]"):
        calc(**good_inputs)


def test_neighbor_distances_shape(calc, good_inputs):
    good_inputs["neighbor_distances"] = jnp.ones((2,))
    with pytest.raises(ValueError, match="need to have shapes"):
        calc(**good_inputs)


def test_one_sided_neighbor_args_raise(calc, good_inputs):
    """Passing exactly one of indices/distances gets the guidance error, not
    an AttributeError (regression: the one-None case fell through)."""
    for drop in ("neighbor_indices", "neighbor_distances"):
        inputs = dict(good_inputs)
        inputs[drop] = None
        with pytest.raises(ValueError, match="together"):
            calc(**inputs)


def test_energy_validates_inputs(calc, good_inputs):
    """Calculator.energy runs the same input validation as __call__."""
    good_inputs["charges"] = jnp.ones((2,))  # 1D: curated shape error
    with pytest.raises(ValueError, match="`charges`"):
        calc.energy(**good_inputs)


def test_energy_without_neighbors_or_cell_list_raises(calc, good_inputs):
    """No NL and no cell list gets the curated guidance, not a TypeError
    (regression: the scalar path bypassed _rspace_from_inputs)."""
    good_inputs["neighbor_indices"] = None
    good_inputs["neighbor_distances"] = None
    with pytest.raises(ValueError, match="compute_cell_list"):
        calc.energy(**good_inputs)


def test_neighbor_distances_dtype(calc, good_inputs):
    good_inputs["neighbor_distances"] = jnp.ones((1,), dtype=jnp.float32)
    with pytest.raises(TypeError, match="neighbor_distances"):
        calc(**good_inputs)


def test_periodic_shape(calc, good_inputs):
    with pytest.raises(ValueError, match=r"periodic.*\(3,\)"):
        calc(**good_inputs, periodic=jnp.asarray([True, False]))


def test_pair_mask_shape(calc, good_inputs):
    with pytest.raises(ValueError, match="pair_mask"):
        calc(**good_inputs, pair_mask=jnp.ones(5, dtype=bool))


def test_pair_mask_dtype(calc, good_inputs):
    with pytest.raises(TypeError, match="pair_mask"):
        calc(**good_inputs, pair_mask=jnp.ones(1))


def test_node_mask_shape(calc, good_inputs):
    with pytest.raises(ValueError, match="node_mask"):
        calc(**good_inputs, node_mask=jnp.ones(5, dtype=bool))


def test_node_mask_dtype(calc, good_inputs):
    with pytest.raises(TypeError, match="node_mask"):
        calc(**good_inputs, node_mask=jnp.ones(2))


def test_kvectors_shape(calc, good_inputs):
    with pytest.raises(ValueError, match=r"kvectors.*\[n_kvecs, 3\]"):
        calc(**good_inputs, kvectors=jnp.ones((4, 2)))


def test_kvectors_dtype(calc, good_inputs):
    with pytest.raises(TypeError, match="kvectors"):
        calc(**good_inputs, kvectors=jnp.ones((4, 3), dtype=jnp.float32))


def test_dense_layout_shape_mismatch(calc, good_inputs):
    good_inputs["neighbor_indices"] = jnp.zeros((2, 4), dtype=jnp.int32)
    good_inputs["neighbor_distances"] = jnp.ones((2, 5))
    with pytest.raises(ValueError, match="dense neighbor layout"):
        calc(**good_inputs)


def test_direct_mode_without_kspace():
    """Base Calculator with smearing set has no k-space implementation."""
    calc = Calculator(CoulombPotential(smearing=1.0))
    with pytest.raises(NotImplementedError, match="_compute_kspace"):
        calc(
            jnp.asarray([[1.0], [-1.0]]),
            jnp.eye(3),
            jnp.asarray([[0.0, 0, 0], [0.5, 0.5, 0.5]]),
            jnp.asarray([[0, 1]]),
            jnp.asarray([0.866]),
        )
