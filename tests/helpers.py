"""Shared fixtures: analytic reference crystals and neighbor-list wrappers.

The crystal definitions and literature Madelung constants follow the
reference test fixtures (``/root/reference/tests/helpers.py:19-237``; original
sources: Ashcroft/Mermin-style tabulations, doi 10.1021/ic2023852, and
Coldwell-Horsfall & Maradudin (1960) eq. (A21) for the Wigner crystals).
"""

import math

import jax.numpy as jnp
import numpy as np

from torchpme_tpu.utils.neighbors import compute_distances, neighbor_list

SQRT3 = math.sqrt(3)

DTYPES = [jnp.float32, jnp.float64]


def define_crystal(crystal_name="CsCl", dtype=jnp.float64):
    """Analytic test crystals with literature Madelung constants.

    Returns ``(positions, charges (N,1), cell, madelung_ref, num_formula_units)``.
    The five Wigner crystals have *non-neutral* cells and exercise the
    neutralizing-background correction.
    """
    if crystal_name == "CsCl":
        positions = [[0, 0, 0], [0.5, 0.5, 0.5]]
        charges = [-1.0, 1.0]
        cell = np.eye(3)
        madelung_ref = 2.0353610945260
        num_formula_units = 1
    elif crystal_name == "NaCl_primitive":
        positions = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
        charges = [1.0, -1.0]
        cell = [[0, 1.0, 1], [1, 0, 1], [1, 1, 0]]  # fcc
        madelung_ref = 1.7475645946
        num_formula_units = 1
    elif crystal_name == "NaCl_cubic":
        positions = [
            [0.0, 0, 0],
            [1, 0, 0],
            [0, 1, 0],
            [0, 0, 1],
            [1, 1, 0],
            [1, 0, 1],
            [0, 1, 1],
            [1, 1, 1],
        ]
        charges = [+1.0, -1, -1, -1, +1, +1, +1, -1]
        cell = 2 * np.eye(3)
        madelung_ref = 1.7475645946
        num_formula_units = 4
    elif crystal_name == "zincblende":
        positions = [[0, 0, 0], [0.5, 0.5, 0.5]]
        charges = [1.0, -1]
        cell = [[0, 1, 1], [1, 0, 1], [1, 1, 0]]
        madelung_ref = 2 * 1.6380550533 / SQRT3
        num_formula_units = 1
    elif crystal_name == "wurtzite":
        u = 3 / 8
        c = math.sqrt(1 / u)
        positions = [
            [0.5, 0.5 / SQRT3, 0.0],
            [0.5, 0.5 / SQRT3, u * c],
            [0.5, -0.5 / SQRT3, 0.5 * c],
            [0.5, -0.5 / SQRT3, (0.5 + u) * c],
        ]
        charges = [1.0, -1, 1, -1]
        cell = [[0.5, -0.5 * SQRT3, 0], [0.5, 0.5 * SQRT3, 0], [0, 0, c]]
        madelung_ref = 1.64132 / (u * c)
        num_formula_units = 2
    elif crystal_name == "fluorite":
        a = 1.0
        positions = np.array(
            [[1 / 4, 1 / 4, 1 / 4], [3 / 4, 3 / 4, 3 / 4], [0, 0, 0]]
        ) * a
        charges = [-1, -1, 2]
        cell = np.array([[a, a, 0], [a, 0, a], [0, a, a]]) / 2.0
        madelung_ref = 11.6365752270768
        num_formula_units = 1
    elif crystal_name == "cu2o":
        positions = [
            [0, 0, 0],
            [1 / 2, 1 / 2, 1 / 2],
            [1 / 4, 1 / 4, 1 / 4],
            [1 / 4, 3 / 4, 3 / 4],
            [3 / 4, 1 / 4, 3 / 4],
            [3 / 4, 3 / 4, 1 / 4],
        ]
        charges = [-2, -2, 1, 1, 1, 1]
        cell = np.eye(3)
        madelung_ref = 10.2594570330750
        num_formula_units = 2
    elif crystal_name == "wigner_sc":
        positions = [[0, 0, 0]]
        charges = [1.0]
        cell = np.eye(3)
        madelung_wigner_seiz = 1.7601188
        wigner_seiz_radius = (3 / (4 * math.pi)) ** (1 / 3)
        madelung_ref = madelung_wigner_seiz / wigner_seiz_radius
        num_formula_units = 1
    elif crystal_name == "wigner_bcc":
        positions = [[0, 0, 0]]
        charges = [1.0]
        cell = [[1.0, 0, 0], [0, 1, 0], [1 / 2, 1 / 2, 1 / 2]]
        madelung_wigner_seiz = 1.791860
        wigner_seiz_radius = (3 / (4 * math.pi * 2)) ** (1 / 3)
        madelung_ref = madelung_wigner_seiz / wigner_seiz_radius
        num_formula_units = 1
    elif crystal_name == "wigner_bcc_cubiccell":
        positions = [[0, 0, 0], [1 / 2, 1 / 2, 1 / 2]]
        charges = [1.0, 1.0]
        cell = np.eye(3)
        madelung_wigner_seiz = 1.791860
        wigner_seiz_radius = (3 / (4 * math.pi * 2)) ** (1 / 3)
        madelung_ref = madelung_wigner_seiz / wigner_seiz_radius
        num_formula_units = 2
    elif crystal_name == "wigner_fcc":
        positions = [[0, 0, 0]]
        charges = [1.0]
        cell = np.array([[1, 0, 1], [0, 1, 1], [1, 1, 0]]) / 2
        madelung_wigner_seiz = 1.791753
        wigner_seiz_radius = (3 / (4 * math.pi * 4)) ** (1 / 3)
        madelung_ref = madelung_wigner_seiz / wigner_seiz_radius
        num_formula_units = 1
    elif crystal_name == "wigner_fcc_cubiccell":
        positions = 0.5 * np.array([[0.0, 0, 0], [1, 0, 1], [1, 1, 0], [0, 1, 1]])
        charges = [1.0, 1, 1, 1]
        cell = np.eye(3)
        madelung_wigner_seiz = 1.791753
        wigner_seiz_radius = (3 / (4 * math.pi * 4)) ** (1 / 3)
        madelung_ref = madelung_wigner_seiz / wigner_seiz_radius
        num_formula_units = 4
    else:
        raise ValueError(f"crystal_name = {crystal_name} is not supported!")

    positions = jnp.asarray(np.asarray(positions, dtype=np.float64), dtype=dtype)
    charges = jnp.asarray(
        np.asarray(charges, dtype=np.float64).reshape(-1, 1), dtype=dtype
    )
    cell = jnp.asarray(np.asarray(cell, dtype=np.float64), dtype=dtype)
    return positions, charges, cell, float(madelung_ref), num_formula_units


def crystal_neighbor_list(
    positions, cell, cutoff=None, full_neighbor_list=False, dtype=jnp.float64
):
    """Neighbor list for a (small) crystal, as JAX arrays of the right dtype."""
    indices, distances, shifts = neighbor_list(
        np.asarray(positions, dtype=np.float64),
        cell=np.asarray(cell, dtype=np.float64),
        cutoff=cutoff,
        full_list=full_neighbor_list,
    )
    return (
        jnp.asarray(indices),
        jnp.asarray(distances, dtype=dtype),
        jnp.asarray(shifts),
    )


__all__ = [
    "DTYPES",
    "compute_distances",
    "crystal_neighbor_list",
    "define_crystal",
    "neighbor_list",
]
