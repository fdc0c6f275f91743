"""Analytic-value tests for the three k-space calculators.

Madelung constants of seven neutral crystals at three scalings (half and full
neighbor lists), plus charged Wigner crystals exercising the neutralizing
background (parity with reference ``tests/calculators/test_values_ewald.py``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import (
    CoulombPotential,
    EwaldCalculator,
    InversePowerLawPotential,
    P3MCalculator,
    PMECalculator,
)

import sys
from pathlib import Path

sys.path.append(str(Path(__file__).parents[1]))
from helpers import crystal_neighbor_list, define_crystal

NEUTRAL_CRYSTALS = [
    "CsCl",
    "NaCl_primitive",
    "NaCl_cubic",
    "zincblende",
    "wurtzite",
    "cu2o",
    "fluorite",
]


def make_calculator(calc_name, scaling_factor):
    if calc_name == "ewald":
        sr_cutoff = scaling_factor
        smearing = sr_cutoff / 5.0
        calc = lambda full: EwaldCalculator(  # noqa: E731
            InversePowerLawPotential(exponent=1, smearing=smearing),
            lr_wavelength=0.5 * smearing,
            full_neighbor_list=full,
        )
        rtol = 4e-6
    elif calc_name == "pme":
        sr_cutoff = 2 * scaling_factor
        smearing = sr_cutoff / 5.0
        calc = lambda full: PMECalculator(  # noqa: E731
            InversePowerLawPotential(exponent=1, smearing=smearing),
            mesh_spacing=smearing / 8,
            full_neighbor_list=full,
        )
        rtol = 9e-4
    else:
        sr_cutoff = 2 * scaling_factor
        smearing = sr_cutoff / 5.0
        calc = lambda full: P3MCalculator(  # noqa: E731
            CoulombPotential(smearing=smearing),
            mesh_spacing=smearing / 8,
            full_neighbor_list=full,
        )
        rtol = 9e-4
    return calc, sr_cutoff, rtol


@pytest.mark.parametrize("calc_name", ["ewald", "pme", "p3m"])
@pytest.mark.parametrize("crystal_name", NEUTRAL_CRYSTALS)
@pytest.mark.parametrize("scaling_factor", [1 / 2.0353610, 1.0, 3.4951291])
@pytest.mark.parametrize("full_neighbor_list", [True, False])
def test_madelung(calc_name, crystal_name, scaling_factor, full_neighbor_list):
    pos, charges, cell, madelung_ref, num_units = define_crystal(crystal_name)
    pos = pos * scaling_factor
    cell = cell * scaling_factor
    madelung_ref = madelung_ref / scaling_factor

    make, sr_cutoff, rtol = make_calculator(calc_name, scaling_factor)
    calc = make(full_neighbor_list)
    indices, distances, _ = crystal_neighbor_list(
        pos, cell, cutoff=sr_cutoff, full_neighbor_list=full_neighbor_list
    )
    potentials = calc(charges, cell, pos, indices, distances)
    madelung = -jnp.sum(potentials * charges) / num_units
    np.testing.assert_allclose(float(madelung), madelung_ref, atol=0.0, rtol=rtol)


@pytest.mark.parametrize("calc_name", ["ewald", "pme", "p3m"])
@pytest.mark.parametrize("crystal_name", NEUTRAL_CRYSTALS)
def test_madelung_float32(calc_name, crystal_name):
    """The f32 production path must hit the Madelung oracle at relaxed rtol
    (the reference runs its whole value matrix in both dtypes,
    ``tests/helpers.py:15-16``)."""
    pos, charges, cell, madelung_ref, num_units = define_crystal(
        crystal_name, dtype=jnp.float32
    )
    make, sr_cutoff, rtol = make_calculator(calc_name, 1.0)
    calc = make(False)
    indices, distances, _ = crystal_neighbor_list(
        pos, cell, cutoff=sr_cutoff, dtype=jnp.float32
    )
    potentials = calc(charges, cell, pos, indices, distances)
    assert potentials.dtype == jnp.float32
    madelung = -jnp.sum(potentials * charges) / num_units
    np.testing.assert_allclose(
        float(madelung), madelung_ref, atol=0.0, rtol=max(rtol, 2e-4)
    )


@pytest.mark.parametrize(
    "crystal_name",
    ["wigner_sc", "wigner_fcc", "wigner_fcc_cubiccell", "wigner_bcc", "wigner_bcc_cubiccell"],
)
@pytest.mark.parametrize("scaling_factor", [0.4325, 1.0, 2.0353610])
def test_wigner(crystal_name, scaling_factor):
    """Charged cells: every atom's energy equals -madelung/2 only once the
    neutralizing-background correction is applied — three smearings verify
    smearing independence."""
    positions, charges, cell, madelung_ref, _ = define_crystal(crystal_name)
    positions = positions * scaling_factor
    cell = cell * scaling_factor
    madelung_ref = madelung_ref / scaling_factor

    indices, distances, _ = crystal_neighbor_list(positions, cell)

    for smearing in [0.1, 0.06, 0.019]:
        if crystal_name in ["wigner_fcc", "wigner_fcc_cubiccell"]:
            smeareff = smearing / np.sqrt(2)
        elif crystal_name in ["wigner_bcc", "wigner_bcc_cubiccell"]:
            smeareff = smearing * np.sqrt(3) / 2
        else:
            smeareff = smearing
        smeareff *= scaling_factor

        calc = EwaldCalculator(
            InversePowerLawPotential(exponent=1, smearing=smeareff),
            lr_wavelength=smeareff / 2,
        )
        potentials = calc(charges, cell, positions, indices, distances)
        energies = potentials * charges
        expected = -np.ones_like(energies) * madelung_ref / 2
        np.testing.assert_allclose(energies, expected, atol=0.0, rtol=4.2e-6)
