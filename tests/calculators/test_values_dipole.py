"""Dipolar calculator values (parity with reference
``tests/calculators/test_values_dipole.py``): analytic direct result,
smearing limits, and the espressomd DipolarP3M cross-code anchor."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import CalculatorDipole, PotentialDipole


def parallel_dipoles():
    """Three parallel dipoles along y in a 10 Å cube."""
    positions = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 2.0, 0.0], [0.0, 4.0, 0.0]])
    dipoles = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0], [1.0, 1.0, 0.0]])
    cell = jnp.eye(3) * 10.0
    neighbor_indices = jnp.asarray([[0, 1], [1, 2], [0, 2]])
    neighbor_vectors = jnp.asarray(
        [[0.0, 2.0, 0.0], [0.0, 2.0, 0.0], [0.0, 4.0, 0.0]]
    )
    return dipoles, cell, positions, neighbor_indices, neighbor_vectors


def test_magnetostatics_direct():
    calc = CalculatorDipole(PotentialDipole())
    dipoles, *rest = parallel_dipoles()
    pot = calc(dipoles, *rest)
    result = float(jnp.sum(pot * dipoles))
    assert result == pytest.approx(-0.265625, abs=1e-12)  # analytic


@pytest.mark.parametrize(
    ("smearing", "expected_sr"),
    [
        (1e10, -0.265625),  # smearing → ∞: SR part = full direct result
        (1e-10, 0.0),  # smearing → 0: SR part vanishes
    ],
)
def test_magnetostatics_sr_limits(smearing, expected_sr):
    calc = CalculatorDipole(
        PotentialDipole(smearing=smearing), lr_wavelength=1.0
    )
    dipoles, cell, positions, indices, vectors = parallel_dipoles()
    pot = calc._compute_rspace(dipoles, indices, vectors)
    result = float(jnp.sum(pot * dipoles))
    assert result == pytest.approx(expected_sr, abs=1e-8)


def test_magnetostatic_ewald_espresso_anchor():
    """Cross-code value from espressomd DipolarP3M (mesh 64)."""
    alpha = 1.0
    smearing = (1 / (2 * alpha**2)) ** 0.5
    calc = CalculatorDipole(
        PotentialDipole(smearing=smearing), lr_wavelength=0.1
    )
    dipoles, *rest = parallel_dipoles()
    pot = calc(dipoles, *rest)
    result = float(jnp.sum(pot * dipoles))
    np.testing.assert_allclose(result, -0.30848574939287954, atol=1e-6, rtol=1e-4)


def test_dipole_forces_finite_difference():
    """Forces from jax.grad through neighbor vectors match finite differences."""
    alpha = 0.9
    smearing = (1 / (2 * alpha**2)) ** 0.5
    calc = CalculatorDipole(PotentialDipole(smearing=smearing), lr_wavelength=0.5)
    dipoles, cell, positions, indices, _ = parallel_dipoles()

    def energy(positions):
        vectors = positions[indices[:, 1]] - positions[indices[:, 0]]
        pot = calc(dipoles, cell, positions, indices, vectors)
        return jnp.sum(pot * dipoles)

    grad = jax.grad(energy)(positions)
    eps = 1e-5
    for atom in range(3):
        for axis in range(3):
            dp = positions.at[atom, axis].add(eps)
            dm = positions.at[atom, axis].add(-eps)
            fd = (energy(dp) - energy(dm)) / (2 * eps)
            np.testing.assert_allclose(grad[atom, axis], fd, atol=1e-6)


def test_dipole_gradient_wrt_dipoles():
    calc = CalculatorDipole(PotentialDipole(smearing=0.8), lr_wavelength=0.5)
    dipoles, cell, positions, indices, vectors = parallel_dipoles()

    def energy(d):
        return jnp.sum(calc(d, cell, positions, indices, vectors) * d)

    grad = jax.grad(energy)(dipoles)
    assert np.all(np.isfinite(np.asarray(grad)))
    assert float(jnp.abs(grad).max()) > 0


def test_epsilon_surface_term():
    """ε > 0 adds the 4π/(2ε+1)/V surface term; ε = 0 (tin foil) adds none."""
    dipoles, cell, positions, indices, vectors = parallel_dipoles()
    smearing = 0.7
    pot0 = CalculatorDipole(
        PotentialDipole(smearing=smearing, epsilon=0.0), lr_wavelength=0.5
    )(dipoles, cell, positions, indices, vectors)
    pot1 = CalculatorDipole(
        PotentialDipole(smearing=smearing, epsilon=1.0), lr_wavelength=0.5
    )(dipoles, cell, positions, indices, vectors)
    volume = 1000.0
    expected_shift = 4 * np.pi / 3 / volume * np.asarray(jnp.sum(dipoles, axis=0)) / 2
    np.testing.assert_allclose(
        np.asarray(pot1 - pot0), np.broadcast_to(expected_shift, (3, 3)), rtol=1e-10
    )


def test_dipole_dense_neighbors_match_pairlist():
    """Dense (N, C, 3) vector layout ≡ pair list (TPU-native extension)."""
    import numpy as np

    calc = CalculatorDipole(PotentialDipole(smearing=0.8), lr_wavelength=0.5)
    dipoles, cell, positions, indices, vectors = parallel_dipoles()
    ref = calc(dipoles, cell, positions, indices, vectors)

    # build the dense full layout by mirroring the half list
    n, cap = 3, 4
    nbr = np.zeros((n, cap), np.int32)
    vecs = np.zeros((n, cap, 3))
    mask = np.zeros((n, cap), bool)
    count = np.zeros(n, np.int32)
    for (i, j), v in zip(np.asarray(indices), np.asarray(vectors)):
        for a, b, vv in [(i, j, v), (j, i, -v)]:
            nbr[a, count[a]] = b
            vecs[a, count[a]] = vv
            mask[a, count[a]] = True
            count[a] += 1
    out = calc(
        dipoles,
        cell,
        positions,
        jnp.asarray(nbr),
        jnp.asarray(vecs),
        pair_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


# --- espressomd DipolarP3M frame anchors (reference test data) --------------

import re
from pathlib import Path

# espressomd DipolarP3M golden frames, vendored so the oracle runs without
# the reference checkout mounted
DIPOLE_FRAMES = Path(__file__).parents[1] / "data" / "dipoles_test_frames.xyz"
# per-frame tuning from the reference (cutoffs + espressomd alphas)
FRAME_PARAMS = [
    (3.9986718930, 0.8819831493),
    (4.0000000000, 0.8956299559),
    (4.7363281250, 0.7215211182),
]


def read_dipole_frames(path):
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
        rows = [lines[i + 2 + a].split() for a in range(n)]
        frames.append(
            dict(
                cell=lattice,
                positions=np.array([[float(x) for x in r[1:4]] for r in rows]),
                dipoles=np.array([[float(x) for x in r[4:7]] for r in rows]),
                forces=np.array([[float(x) for x in r[7:10]] for r in rows]),
                energy=energy,
            )
        )
        i += 2 + n
    return frames


@pytest.mark.parametrize("frame_index", [0, 1, 2])
def test_dipolar_ewald_vs_espressomd_frames(frame_index):
    """Energies AND forces vs espressomd DipolarP3M on random dipole boxes
    (parity with reference ``test_values_dipole.py:118-167``)."""
    from torchpme_tpu.prefactors import eV_A
    from torchpme_tpu.utils.neighbors import neighbor_list

    frame = read_dipole_frames(DIPOLE_FRAMES)[frame_index]
    cutoff, alpha = FRAME_PARAMS[frame_index]
    smearing = (1 / (2 * alpha**2)) ** 0.5
    calc = CalculatorDipole(
        PotentialDipole(smearing=smearing, prefactor=eV_A), lr_wavelength=0.1
    )
    positions = jnp.asarray(frame["positions"])
    dipoles = jnp.asarray(frame["dipoles"])
    cell = jnp.asarray(frame["cell"])
    idx_np, _, shifts_np = neighbor_list(frame["positions"], frame["cell"], cutoff)
    idx, shifts = jnp.asarray(idx_np), jnp.asarray(shifts_np)
    ns_k = calc.get_ns_kvectors(cell)

    def energy(positions):
        vectors = (
            positions[idx[:, 1]] - positions[idx[:, 0]]
            + shifts.astype(cell.dtype) @ cell
        )
        pot = calc(dipoles, cell, positions, idx, vectors, ns_kvectors=ns_k)
        return jnp.sum(pot * dipoles)

    e, grad = jax.value_and_grad(energy)(positions)
    np.testing.assert_allclose(float(e), frame["energy"], atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        -np.asarray(grad), frame["forces"], atol=1e-5, rtol=1e-4
    )
