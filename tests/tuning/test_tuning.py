"""Tuning end-to-end: tuned parameters must achieve the requested accuracy on
the Madelung oracle (parity with reference ``tests/tuning/test_tuning.py``)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import (
    CoulombPotential,
    EwaldCalculator,
    P3MCalculator,
    PMECalculator,
)
from torchpme_tpu.tuning import tune_ewald, tune_p3m, tune_pme

sys.path.append(str(Path(__file__).parents[1]))
from helpers import crystal_neighbor_list, define_crystal

CUTOFF = 4.4


@pytest.fixture(scope="module")
def cscl_supercell():
    """4x4x4 CsCl supercell (128 atoms) — large enough that tuning is
    meaningful, small enough to stay fast."""
    pos1, charges1, cell1, madelung_ref, nfu = define_crystal("CsCl")
    reps = 4
    shifts = jnp.stack(
        jnp.meshgrid(*([jnp.arange(reps)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    positions = (pos1[None, :, :] + (shifts.astype(pos1.dtype) @ cell1)[:, None, :]).reshape(-1, 3)
    charges = jnp.tile(charges1, (reps**3, 1))
    cell = cell1 * reps
    indices, distances, _ = crystal_neighbor_list(positions, cell, cutoff=CUTOFF)
    return positions, charges, cell, indices, distances, madelung_ref, nfu * reps**3


@pytest.mark.parametrize("accuracy", [1e-1, 1e-5])
@pytest.mark.parametrize("tune_name", ["ewald", "pme", "p3m"])
def test_tuned_parameters_achieve_accuracy_madelung(tune_name, accuracy):
    """Tuned parameters must reach the *requested* accuracy on the Madelung
    oracle at 1e-1 and 1e-5 (with 1e-3 covered on the supercell below) —
    parity with reference ``tests/tuning/test_tuning.py:62-112``, which
    asserts ``rtol=accuracy`` directly.  The 1e-5 point is the one that
    stresses the error bounds."""
    positions, charges, cell, madelung_ref, n_units = define_crystal("CsCl")
    indices, distances, _ = crystal_neighbor_list(positions, cell, cutoff=CUTOFF)

    tune_fn = {"ewald": tune_ewald, "pme": tune_pme, "p3m": tune_p3m}[tune_name]
    calc_cls = {
        "ewald": EwaldCalculator,
        "pme": PMECalculator,
        "p3m": P3MCalculator,
    }[tune_name]
    # grids sized per accuracy so the timed-candidate compile count stays small
    if tune_name == "ewald":
        grid_kwargs = dict(ns_lo=1, ns_hi=4) if accuracy > 1e-4 else dict(
            ns_lo=6, ns_hi=10
        )
    else:
        grid_kwargs = (
            dict(nodes_lo=3, nodes_hi=4, mesh_lo=2, mesh_hi=4)
            if accuracy > 1e-4
            else dict(nodes_lo=4, nodes_hi=5, mesh_lo=4, mesh_hi=7)
        )

    smearing, kspace_params, _ = tune_fn(
        charges,
        cell,
        positions,
        cutoff=CUTOFF,
        neighbor_indices=indices,
        neighbor_distances=distances,
        accuracy=accuracy,
        **grid_kwargs,
    )
    calc = calc_cls(CoulombPotential(smearing=smearing), **kspace_params)
    potentials = calc(charges, cell, positions, indices, distances)
    madelung = -jnp.sum(potentials * charges) / n_units
    np.testing.assert_allclose(
        float(madelung), madelung_ref, atol=0.0, rtol=accuracy
    )


@pytest.mark.parametrize("accuracy", [1e-3])
@pytest.mark.parametrize("tune_name", ["ewald", "pme", "p3m"])
def test_tuned_parameters_achieve_accuracy(tune_name, accuracy, cscl_supercell):
    positions, charges, cell, indices, distances, madelung_ref, n_units = cscl_supercell

    tune_fn = {"ewald": tune_ewald, "pme": tune_pme, "p3m": tune_p3m}[tune_name]
    calc_cls = {
        "ewald": EwaldCalculator,
        "pme": PMECalculator,
        "p3m": P3MCalculator,
    }[tune_name]

    # restricted candidate grids: every timed candidate costs a jit compile
    grid_kwargs = (
        dict(ns_lo=4, ns_hi=8)
        if tune_name == "ewald"
        else dict(nodes_lo=3, nodes_hi=4, mesh_lo=3, mesh_hi=5)
    )
    smearing, kspace_params, timing = tune_fn(
        charges,
        cell,
        positions,
        cutoff=CUTOFF,
        neighbor_indices=indices,
        neighbor_distances=distances,
        accuracy=accuracy,
        **grid_kwargs,
    )
    assert smearing > 0
    assert np.isfinite(timing) and timing > 0

    calc = calc_cls(CoulombPotential(smearing=smearing), **kspace_params)
    potentials = calc(charges, cell, positions, indices, distances)
    madelung = -jnp.sum(potentials * charges) / n_units
    energy_err = abs(float(madelung) - madelung_ref) * n_units
    # the error bound is for the total energy; require it is met
    assert energy_err < accuracy * 10  # bound is approximate, allow slack


def test_tuner_warns_when_accuracy_unreachable(cscl_supercell):
    positions, charges, cell, indices, distances, *_ = cscl_supercell
    with pytest.warns(UserWarning, match="No parameter meets the accuracy"):
        tune_ewald(
            charges,
            cell,
            positions,
            cutoff=CUTOFF,
            neighbor_indices=indices,
            neighbor_distances=distances,
            ns_lo=1,
            ns_hi=1,
            accuracy=1e-10,
        )


def test_accuracy_must_be_float(cscl_supercell):
    positions, charges, cell, indices, distances, *_ = cscl_supercell
    with pytest.raises(ValueError, match="is not a float"):
        tune_ewald(
            charges,
            cell,
            positions,
            cutoff=CUTOFF,
            neighbor_indices=indices,
            neighbor_distances=distances,
            accuracy="1e-3",
        )
