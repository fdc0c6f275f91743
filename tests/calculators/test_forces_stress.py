"""Force and stress correctness on random charged boxes.

The reference validates against GROMACS SPME frames
(``tests/calculators/test_values_ewald.py:223-356``); here the oracles are
(a) finite differences and (b) cross-method agreement (a well-converged Ewald
sum is the ground truth PME/P3M must match to ~1e-4), which validates the
same physics without external data files.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import (
    CoulombPotential,
    EwaldCalculator,
    P3MCalculator,
    PMECalculator,
)

sys.path.append(str(Path(__file__).parents[1]))
from helpers import compute_distances, neighbor_list

CUTOFF = 4.0
SMEARING = CUTOFF / 5


@pytest.fixture(scope="module")
def random_nacl_box():
    """8-atom random NaCl-like box (the reference's GROMACS-frame geometry)."""
    rng = np.random.default_rng(1234)
    box = 8.0
    positions = jnp.asarray(rng.uniform(0.5, box - 0.5, (8, 3)))
    charges = jnp.asarray(np.array([1.0, -1, 1, -1, 1, -1, 1, -1]).reshape(-1, 1))
    cell = jnp.eye(3) * box
    idx, dist, shifts = neighbor_list(np.asarray(positions), np.asarray(cell), CUTOFF)
    return positions, charges, cell, jnp.asarray(idx), jnp.asarray(shifts)


def make_energy_fn(calc, idx, shifts, extra):
    def energy(positions, charges, cell):
        dist = compute_distances(positions, idx, cell=cell, neighbor_shifts=shifts)
        pot = calc(charges, cell, positions, idx, dist, **extra)
        return jnp.sum(pot * charges)

    return energy


def build(calc_name, cell):
    if calc_name == "ewald":
        calc = EwaldCalculator(
            CoulombPotential(smearing=SMEARING), lr_wavelength=SMEARING / 2
        )
        # static extents (not precomputed kvectors) so cell gradients are exact
        extra = {"ns_kvectors": calc.get_ns_kvectors(cell)}
    elif calc_name == "pme":
        calc = PMECalculator(
            CoulombPotential(smearing=SMEARING), mesh_spacing=SMEARING / 4
        )
        extra = {"ns_mesh": calc.get_ns_mesh(cell)}
    else:
        calc = P3MCalculator(
            CoulombPotential(smearing=SMEARING), mesh_spacing=SMEARING / 4
        )
        extra = {"ns_mesh": calc.get_ns_mesh(cell)}
    return calc, extra


@pytest.mark.parametrize("calc_name", ["ewald", "pme", "p3m"])
def test_forces_match_finite_differences(calc_name, random_nacl_box):
    positions, charges, cell, idx, shifts = random_nacl_box
    calc, extra = build(calc_name, cell)
    energy = make_energy_fn(calc, idx, shifts, extra)
    grad = jax.grad(energy)(positions, charges, cell)

    eps = 1e-5
    rng = np.random.default_rng(0)
    for atom, axis in zip(rng.integers(0, 8, 4), rng.integers(0, 3, 4)):
        ep = energy(positions.at[atom, axis].add(eps), charges, cell)
        em = energy(positions.at[atom, axis].add(-eps), charges, cell)
        fd = (float(ep) - float(em)) / (2 * eps)
        np.testing.assert_allclose(float(grad[atom, axis]), fd, rtol=5e-5, atol=1e-7)


@pytest.mark.parametrize("calc_name", ["pme", "p3m"])
def test_energy_forces_match_ewald(calc_name, random_nacl_box):
    """Mesh methods must agree with a well-converged Ewald sum (the
    cross-method analog of the reference's GROMACS anchors: energy 1e-4,
    forces 5e-3)."""
    positions, charges, cell, idx, shifts = random_nacl_box
    ewald, extra_e = build("ewald", cell)
    mesh, extra_m = build(calc_name, cell)
    e_ref = make_energy_fn(ewald, idx, shifts, extra_e)
    e_mesh = make_energy_fn(mesh, idx, shifts, extra_m)
    E_ref, F_ref = jax.value_and_grad(e_ref)(positions, charges, cell)
    E, F = jax.value_and_grad(e_mesh)(positions, charges, cell)
    np.testing.assert_allclose(float(E), float(E_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(F), np.asarray(F_ref), rtol=5e-3, atol=5e-4
    )


@pytest.mark.parametrize("calc_name", ["ewald", "pme"])
def test_stress_via_strain_gradient(calc_name, random_nacl_box):
    """Stress from jax.grad through an explicit strain matches finite
    differences (reference computes stress the same way via autograd,
    ``test_values_ewald.py:318-356``)."""
    positions, charges, cell, idx, shifts = random_nacl_box
    calc, extra = build(calc_name, cell)
    energy = make_energy_fn(calc, idx, shifts, extra)

    def strained(eps_symm):
        strain = jnp.eye(3) + 0.5 * (eps_symm + eps_symm.T)
        return energy(positions @ strain.T, charges, cell @ strain.T)

    stress = jax.grad(strained)(jnp.zeros((3, 3)))
    # symmetric by construction; check one diagonal + one off-diagonal entry
    # against finite differences
    eps = 1e-5
    for i, j in [(0, 0), (0, 1)]:
        dp = jnp.zeros((3, 3)).at[i, j].set(eps)
        fd = (float(strained(dp)) - float(strained(-dp))) / (2 * eps)
        np.testing.assert_allclose(float(stress[i, j]), fd, rtol=1e-4, atol=1e-7)
    # virial identity for pure 1/r: trace(stress) = -E
    np.testing.assert_allclose(
        float(jnp.trace(stress)),
        -float(energy(positions, charges, cell)),
        rtol=2e-4,  # exact up to k-space truncation / mesh discretization
    )
