"""Direct-sum calculator vs hand-computable molecular Coulomb potentials
(parity with reference ``tests/calculators/test_values_direct.py``): simple
point-charge "molecules" under charge variants, rotations and scalings."""

import math
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import Calculator, CoulombPotential

sys.path.append(str(Path(__file__).parents[1]))
from helpers import neighbor_list

SQRT2 = math.sqrt(2.0)
SQRT3 = math.sqrt(3.0)

MOLECULES = {
    "dimer": np.array([[0.0, 0, 0], [1.0, 0, 0]]),
    "triangle": np.array([[0.0, 0, 0], [1.0, 0, 0], [0.5, SQRT3 / 2, 0]]),
    "square": 0.5
    * np.array([[1.0, 1, 0], [1, -1, 0], [-1, 1, 0], [-1, -1, 0]]),
    "tetrahedron": np.array(
        [
            [0.0, 0, 0],
            [1.0, 0, 0],
            [0.5, SQRT3 / 2, 0],
            [0.5, SQRT3 / 6, SQRT2 / SQRT3],
        ]
    ),
}


def charge_variants(n):
    alternating = np.array([(-1.0) ** i for i in range(n)])
    return {
        "alternating": alternating,
        "positive": np.ones(n),
        "negative": -np.ones(n),
        "random": np.linspace(-1.3, 0.9, n),
    }


def exact_potentials(positions, charges):
    """Brute-force pairwise 1/r oracle: V_i = Σ_{j≠i} q_j / r_ij."""
    diff = positions[None, :, :] - positions[:, None, :]
    dist = np.linalg.norm(diff, axis=-1)
    np.fill_diagonal(dist, np.inf)
    return (charges[None, :] / dist).sum(axis=1)


def rotation(theta=0.82321, phi=1.23456):
    rot_x = np.array(
        [
            [1, 0, 0],
            [0, math.cos(theta), -math.sin(theta)],
            [0, math.sin(theta), math.cos(theta)],
        ]
    )
    rot_z = np.array(
        [
            [math.cos(phi), -math.sin(phi), 0],
            [math.sin(phi), math.cos(phi), 0],
            [0, 0, 1],
        ]
    )
    return rot_z @ rot_x


@pytest.mark.parametrize("molecule", list(MOLECULES))
@pytest.mark.parametrize("variant", ["alternating", "positive", "negative", "random"])
@pytest.mark.parametrize("scale", [0.5, 1.0, 3.7])
@pytest.mark.parametrize("rotate", [False, True])
@pytest.mark.parametrize("full_neighbor_list", [False, True])
def test_direct_sum_matches_oracle(molecule, variant, scale, rotate, full_neighbor_list):
    positions = MOLECULES[molecule] * scale
    if rotate:
        positions = positions @ rotation().T
    charges = charge_variants(positions.shape[0])[variant]
    # the calculator convention is V_i = ½ Σ_j q_j v(r_ij)
    expected = exact_potentials(positions, charges) / 2

    indices, distances, _ = neighbor_list(
        positions, cell=None, cutoff=100.0, full_list=full_neighbor_list, periodic=False
    )
    calc = Calculator(CoulombPotential(), full_neighbor_list=full_neighbor_list)
    result = calc(
        jnp.asarray(charges.reshape(-1, 1)),
        jnp.eye(3),
        jnp.asarray(positions),
        jnp.asarray(indices),
        jnp.asarray(distances),
    )
    np.testing.assert_allclose(np.asarray(result).ravel(), expected, atol=2e-14)


def test_multi_channel_charges():
    """n_channels > 1 computes several potentials at once (one-hot species)."""
    positions = MOLECULES["square"]
    q = charge_variants(4)["alternating"]
    onehot = np.stack([q * (q > 0), q * (q < 0)], axis=1)  # split by sign
    indices, distances, _ = neighbor_list(
        positions, cell=None, cutoff=10.0, periodic=False
    )
    calc = Calculator(CoulombPotential())
    result = np.asarray(
        calc(
            jnp.asarray(onehot),
            jnp.eye(3),
            jnp.asarray(positions),
            jnp.asarray(indices),
            jnp.asarray(distances),
        )
    )
    # channels sum to the single-channel result
    single = np.asarray(
        calc(
            jnp.asarray(q.reshape(-1, 1)),
            jnp.eye(3),
            jnp.asarray(positions),
            jnp.asarray(indices),
            jnp.asarray(distances),
        )
    )
    np.testing.assert_allclose(result.sum(axis=1), single.ravel(), atol=1e-14)
