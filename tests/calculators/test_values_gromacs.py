"""Cross-code anchors vs GROMACS SPME (parity with reference
``tests/calculators/test_values_ewald.py:223-356``).

The reference ships random 8-atom NaCl boxes with GROMACS SPME energies,
forces and stress in the extended-xyz headers
(``examples/coulomb_test_frames.xyz``, computed with ``coulombtype = PME``,
``pme_order = 8``, ``fourierspacing = 0.01 nm``).  The frames are vendored in
``tests/data/`` so these strongest external oracles run without the reference
checkout mounted.
"""

import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchpme_tpu as tpme
from torchpme_tpu.utils.neighbors import compute_distances, neighbor_list

FRAMES_FILE = Path(__file__).parents[1] / "data" / "coulomb_test_frames.xyz"

CUTOFF = 5.54


def read_frames(path):
    """Minimal extended-xyz reader for the GROMACS anchor frames."""
    frames = []
    lines = path.read_text().splitlines()
    i = 0
    while i < len(lines):
        n = int(lines[i])
        header = lines[i + 1]
        lattice = np.fromstring(
            re.search(r'Lattice="([^"]+)"', header).group(1), sep=" "
        ).reshape(3, 3)
        energy = float(re.search(r"energy=(\S+)", header).group(1))
        stress = np.fromstring(
            re.search(r'stress="([^"]+)"', header).group(1), sep=" "
        ).reshape(3, 3)
        rows = [lines[i + 2 + a].split() for a in range(n)]
        positions = np.array([[float(x) for x in r[1:4]] for r in rows])
        charges = np.array([float(r[4]) for r in rows]).reshape(-1, 1)
        forces = np.array([[float(x) for x in r[5:8]] for r in rows])
        frames.append(
            dict(
                cell=lattice,
                positions=positions,
                charges=charges,
                energy=energy,
                forces=forces,
                stress=stress,
            )
        )
        i += 2 + n
    return frames


@pytest.fixture(scope="module")
def frames():
    return read_frames(FRAMES_FILE)


def build_calculator(calc_name, smearing):
    pot = tpme.CoulombPotential(smearing=smearing, prefactor=tpme.prefactors.eV_A)
    if calc_name == "ewald":
        return tpme.EwaldCalculator(pot, lr_wavelength=0.5 * smearing)
    if calc_name == "pme":
        return tpme.PMECalculator(pot, mesh_spacing=smearing / 8.0)
    return tpme.P3MCalculator(pot, mesh_spacing=smearing / 8.0)


@pytest.mark.parametrize("calc_name", ["ewald", "pme", "p3m"])
@pytest.mark.parametrize("frame_index", [0, 1])
def test_energy_forces_stress_vs_gromacs(frames, calc_name, frame_index):
    frame = frames[frame_index]
    positions = jnp.asarray(frame["positions"])
    cell = jnp.asarray(frame["cell"])
    charges = jnp.asarray(frame["charges"])
    smearing = CUTOFF / 6.0

    calc = build_calculator(calc_name, smearing)
    idx_np, _, shifts_np = neighbor_list(
        frame["positions"], frame["cell"], cutoff=CUTOFF
    )
    idx, shifts = jnp.asarray(idx_np), jnp.asarray(shifts_np)
    extra = {}
    if hasattr(calc, "get_ns_mesh"):
        extra["ns_mesh"] = calc.get_ns_mesh(cell)
    else:
        extra["ns_kvectors"] = calc.get_ns_kvectors(cell)

    def total_energy(positions, cell):
        d = compute_distances(positions, idx, cell=cell, neighbor_shifts=shifts)
        return jnp.sum(calc(charges, cell, positions, idx, d, **extra) * charges)

    energy, neg_forces = jax.value_and_grad(total_energy)(positions, cell)
    np.testing.assert_allclose(float(energy), frame["energy"], rtol=1e-4)
    np.testing.assert_allclose(
        -np.asarray(neg_forces), frame["forces"], rtol=5e-3, atol=5e-4
    )

    def energy_wrt_strain(strain):
        strained_pos = positions + positions @ strain.T
        strained_cell = cell + cell @ strain.T
        return total_energy(strained_pos, strained_cell)

    stress = jax.grad(energy_wrt_strain)(jnp.zeros((3, 3)))
    stress_target = frame["stress"] * 2.0  # GROMACS stores the "virial" / 2
    np.testing.assert_allclose(
        np.asarray(stress), stress_target, rtol=5e-3, atol=5e-3
    )
