"""Dipolar tuners (measured-error screen, no reference counterpart): the
returned parameters must actually meet the accuracy against an
independently converged dipolar Ewald, for both the Ewald and PME dipolar
calculators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchpme_tpu as tpme
from torchpme_tpu.tuning import tune_ewald_dipole, tune_pme_dipole
from torchpme_tpu.utils.neighbors import neighbor_list

CUTOFF = 3.0


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(3)
    n, box = 40, 7.0
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
    dipoles = jnp.asarray(rng.normal(size=(n, 3)))
    cell = jnp.eye(3) * box
    idx, _, shifts = map(
        jnp.asarray, neighbor_list(positions, cell=cell, cutoff=CUTOFF)
    )
    vec = (
        positions[idx[:, 1]]
        - positions[idx[:, 0]]
        + shifts.astype(positions.dtype) @ cell
    )
    return dipoles, cell, positions, idx, vec, shifts


def _measured_error(calc, system):
    """Absolute RMS force error vs an independently converged Ewald."""
    dipoles, cell, positions, idx, vec, shifts = system
    ref = tpme.CalculatorDipole(
        tpme.PotentialDipole(smearing=0.5), lr_wavelength=0.18
    )

    def forces(c):
        def e(p):
            v = p[idx[:, 1]] - p[idx[:, 0]] + shifts.astype(p.dtype) @ cell
            return c.energy(
                dipoles, cell, p, idx, v,
                ns_kvectors=c.get_ns_kvectors(cell),
            )

        return jax.grad(e)(positions)

    d = forces(calc) - forces(ref)
    return float(jnp.sqrt(jnp.mean(jnp.sum(d**2, axis=-1))))


def test_tune_ewald_dipole_meets_accuracy(system):
    dipoles, cell, positions, idx, vec, shifts = system
    smearing, params, timing = tune_ewald_dipole(
        dipoles, cell, positions, CUTOFF, idx, vec, shifts,
        ns_lo=4, ns_hi=16, accuracy=1e-3, smearing_ratios=(4.5, 5.0),
    )
    assert np.isfinite(timing) and timing > 0
    assert set(params) == {"lr_wavelength"}
    calc = tpme.CalculatorDipole(
        tpme.PotentialDipole(smearing=smearing), **params
    )
    assert _measured_error(calc, system) < 1e-3


def test_tune_pme_dipole_meets_accuracy(system):
    dipoles, cell, positions, idx, vec, shifts = system
    smearing, params, timing = tune_pme_dipole(
        dipoles, cell, positions, CUTOFF, idx, vec, shifts,
        nodes_lo=5, nodes_hi=6, mesh_lo=3, mesh_hi=5,
        accuracy=1e-3, smearing_ratios=(4.5, 5.5),
    )
    assert np.isfinite(timing) and timing > 0
    assert set(params) == {"mesh_spacing", "interpolation_nodes"}
    calc = tpme.PMECalculatorDipole(
        tpme.PotentialDipole(smearing=smearing), **params
    )
    assert _measured_error(calc, system) < 1e-3


def test_tune_ewald_dipole_unreachable_accuracy_warns(system):
    """An impossible accuracy target warns and returns the lowest-error
    candidate with infinite timing (mirrors the scalar tuners)."""
    dipoles, cell, positions, idx, vec, shifts = system
    with pytest.warns(UserWarning, match="No parameter combination"):
        smearing, params, timing = tune_ewald_dipole(
            dipoles, cell, positions, CUTOFF, idx, vec, shifts,
            ns_lo=1, ns_hi=2, accuracy=1e-12, smearing_ratios=(3.0,),
        )
    assert timing == float("inf")
    assert smearing == CUTOFF / 3.0
