"""Reciprocal-space vector generation for Ewald and mesh calculators.

TPU-native counterpart of ``/root/reference/src/torchpme/lib/kvectors.py``.
XLA requires static shapes under ``jit``, so mesh sizes are plain Python ints
here: :func:`get_ns_mesh` evaluates eagerly on concrete cells and returns a
tuple (the cell *values* only rescale the k-vectors, which stay traced and
differentiable — this is what makes strain/stress gradients work).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .math import inv3
import numpy as np
from jax import Array

__all__ = [
    "get_ns_mesh",
    "get_ns_ewald",
    "generate_kvectors_for_mesh",
    "generate_kvectors_for_ewald",
    "compute_batched_kvectors",
]


def _concrete_cell_norms(cell) -> np.ndarray:
    """Row norms of a *concrete* cell; raises a helpful error on tracers."""
    try:
        cell_np = np.asarray(cell)
    except Exception as err:  # jax.errors.TracerArrayConversionError
        raise ValueError(
            "Mesh sizes must be static under `jit`: the number of mesh points "
            "cannot depend on a traced `cell`. Compute them eagerly outside "
            "the jitted function (e.g. `ns = get_ns_mesh(cell0, spacing)`) and "
            "pass them explicitly via the `ns_mesh=` / `kvectors=` argument."
        ) from err
    return np.linalg.norm(cell_np, axis=1)


def get_ns_mesh(cell, mesh_spacing: float) -> tuple[int, int, int]:
    """Mesh size per axis for a target spacing, rounded up to powers of two.

    Powers of two keep the 3D rFFT on its fast path (parity with reference
    ``lib/kvectors.py:5-21``: ``ns = 2^ceil(log2(2·L/spacing + 1))``).

    :param cell: concrete ``(3, 3)`` cell matrix (rows are basis vectors).
    :param mesh_spacing: target distance between mesh planes.
    :return: static tuple ``(nx, ny, nz)`` of Python ints.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> get_ns_mesh(jnp.eye(3) * 10.0, mesh_spacing=1.0)
    (32, 32, 32)
    """
    basis_norms = _concrete_cell_norms(cell)
    ns_approx = 2 * basis_norms / mesh_spacing + 1
    return tuple(int(2 ** math.ceil(math.log2(n))) for n in ns_approx)


def get_ns_ewald(cell, lr_wavelength: float) -> tuple[int, int, int]:
    """Number of reciprocal basis-vector multiples within the Ewald k-cutoff.

    ``k_cutoff = 2π / lr_wavelength``; each axis keeps
    ``ceil(k_cutoff · |a_i| / 2π)`` harmonics (parity with reference
    ``calculators/ewald.py:86-93``).
    """
    basis_norms = _concrete_cell_norms(cell)
    k_cutoff = 2 * math.pi / lr_wavelength
    return tuple(int(math.ceil(k_cutoff * n / (2 * math.pi))) for n in basis_norms)


def _fft_integer_freqs(n: int, dtype, real: bool) -> Array:
    """Integer FFT frequencies ``[0, 1, ..., -1]`` (or the rFFT half-set)."""
    if real:
        return jnp.fft.rfftfreq(n, dtype=dtype) * n
    return jnp.fft.fftfreq(n, dtype=dtype) * n


def _generate_kvectors(cell: Array, ns: tuple[int, int, int], last_real: bool) -> Array:
    """Broadcast-sum of per-axis integer frequencies times reciprocal vectors."""
    if len(ns) != 3:
        raise ValueError(f"ns of length {len(ns)} should have 3 entries")
    if cell.shape != (3, 3):
        raise ValueError(f"cell of shape {list(cell.shape)} should be of shape (3, 3)")

    reciprocal = 2 * jnp.pi * inv3(cell).T
    kx = _fft_integer_freqs(ns[0], cell.dtype, real=False)[:, None] * reciprocal[0]
    ky = _fft_integer_freqs(ns[1], cell.dtype, real=False)[:, None] * reciprocal[1]
    kz = _fft_integer_freqs(ns[2], cell.dtype, real=last_real)[:, None] * reciprocal[2]
    return kx[:, None, None] + ky[None, :, None] + kz[None, None, :]


def generate_kvectors_for_mesh(cell: Array, ns: tuple[int, int, int]) -> Array:
    """All k-vectors on the half-spectrum rFFT grid of an ``ns`` mesh.

    :param cell: ``(3, 3)`` cell matrix (may be traced — gradients flow).
    :param ns: static ``(nx, ny, nz)``.
    :return: array of shape ``(nx, ny, nz // 2 + 1, 3)``; the ``[0,0,0]``
        entry is always the zero vector.  Parity with reference
        ``lib/kvectors.py:77-102``.
    """
    return _generate_kvectors(cell, tuple(int(n) for n in ns), last_real=True)


def generate_kvectors_for_ewald(cell: Array, ns: tuple[int, int, int]) -> Array:
    """Full (flattened) k-vector set for explicit Ewald sums.

    :return: array of shape ``(nx · ny · nz, 3)``; entry 0 is the zero vector.
        Parity with reference ``lib/kvectors.py:105-136``.
    """
    return _generate_kvectors(cell, tuple(int(n) for n in ns), last_real=False).reshape(
        -1, 3
    )


def compute_batched_kvectors(lr_wavelength: float, cells: Array) -> Array:
    """Zero-padded per-system k-vectors for vmap-batched Ewald.

    For each cell in the batch the full Ewald k-set is generated eagerly and
    the batch is right-padded with zero vectors to a common static length —
    safe because the ``k = 0`` entry is masked out of every kernel anyway
    (parity with reference ``lib/kvectors.py:139-166``).

    :param lr_wavelength: spatial resolution of the reciprocal-space sum.
    :param cells: concrete ``(B, 3, 3)`` batch of cells.
    :return: array of shape ``(B, max_k, 3)``.
    """
    per_system = [
        generate_kvectors_for_ewald(jnp.asarray(cell), get_ns_ewald(cell, lr_wavelength))
        for cell in np.asarray(cells)
    ]
    max_k = max(kv.shape[0] for kv in per_system)
    padded = [
        jnp.pad(kv, ((0, max_k - kv.shape[0]), (0, 0))) for kv in per_system
    ]
    return jnp.stack(padded)
