r"""Parameter tuning for the dipolar calculators (Ewald and PME).

**No reference counterpart** — the reference tunes only the charge
calculators (``/root/reference/src/torchpme/tuning/``); its dipolar
calculator leaves ``smearing``/``lr_wavelength`` to the user.

Unlike the scalar tuners, which screen candidates with closed-form
Kolafa–Perram error bounds, the dipolar tuners **measure** each candidate's
force error directly against a converged dipolar-Ewald reference evaluated
once on the input system (``smearing = cutoff/5.5``,
``lr_wavelength = smearing/2.5`` — both truncations measured at or below
~1e-6 relative on representative systems, i.e. below any practical
accuracy target for the f64 tuner; the dipolar k-sum's (μ·k)² weight makes
it converge slower in ``k_max·σ`` than the Coulomb rule of thumb, hence
the extra 2.5).  Measuring is slower than a bound but exact by construction: the
returned parameters are guaranteed to meet the accuracy on *this* system,
with no bound-tightness caveats.  Candidates meeting the accuracy are then
wall-clock-timed (energy + forces + field + stress backward, jitted,
steady-state) and the fastest wins — the same screen-then-time structure as
:class:`~torchpme_tpu.tuning.tuner.GridSearchTuner`.
"""

from __future__ import annotations

import time
from typing import Any
from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np

from ..calculators import CalculatorDipole, PMECalculatorDipole
from ..potentials import PotentialDipole

__all__ = ["tune_ewald_dipole", "tune_pme_dipole"]

#: reference convergence: smearing = cutoff / _REF_RATIO, lr_wavelength =
#: smearing / _REF_LR_FACTOR.  The dipolar k-sum carries a (μ·k)² weight,
#: so it converges ~√2× slower in k_max·σ than the Coulomb rule of thumb —
#: measured: λ = σ is off by ~1e-1 absolute force RMS on a 50-dipole box,
#: λ = σ/2.5 is converged to ~1e-8
_REF_RATIO = 5.5
_REF_LR_FACTOR = 2.5


def _filter_pairs(cutoff, neighbor_indices, neighbor_vectors):
    """Restrict a (larger-cutoff) vector neighbor list to ``cutoff`` (host)."""
    vec = np.asarray(neighbor_vectors)
    keep = np.linalg.norm(vec, axis=-1) < cutoff
    return (
        jnp.asarray(np.asarray(neighbor_indices)[keep]),
        jnp.asarray(vec[keep]),
    )


def _forces(calc, dipoles, cell, positions, idx, vec, shifts):
    """Minus-gradient forces of the total dipolar energy (eager, f64)."""
    extra = (
        {"ns_kvectors": calc.get_ns_kvectors(cell)}
        if calc.potential.smearing is not None
        else {}
    )

    def energy(p):
        v = p[idx[:, 1]] - p[idx[:, 0]] + shifts.astype(p.dtype) @ cell
        return calc.energy(dipoles, cell, p, idx, v, **extra)

    return jax.grad(energy)(positions)


class _DipoleTimings:
    """Wall-clock of the jitted dipolar energy+gradient step (see
    :class:`~torchpme_tpu.tuning.tuner.TuningTimings` — adapted to the
    vector neighbor list and the (dipoles, cell, positions) gradient)."""

    def __init__(self, dipoles, cell, positions, idx, vec, n_repeat=4, n_warmup=2):
        self.args = (dipoles, cell, positions)
        self.idx = idx
        self.vec = vec
        self.n_repeat = n_repeat
        self.n_warmup = n_warmup

    def __call__(self, calc, **extra) -> float:
        def total_energy(dipoles, cell, positions):
            return calc.energy(
                dipoles, cell, positions, self.idx, self.vec, **extra
            )

        step = jax.jit(jax.value_and_grad(total_energy, argnums=(0, 1, 2)))
        elapsed = 0.0
        for i in range(self.n_warmup + self.n_repeat):
            start = time.monotonic()
            out = step(*self.args)
            # host-transfer sync (async/tunneled dispatch, see TuningTimings)
            _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            if i >= self.n_warmup:
                elapsed += time.monotonic() - start
        return elapsed / self.n_repeat


def _tune_dipole(
    dipoles,
    cell,
    positions,
    cutoff,
    neighbor_indices,
    neighbor_vectors,
    neighbor_shifts,
    candidates,
    make_calc,
    accuracy,
    smearing_ratios,
):
    dipoles = jnp.asarray(dipoles)
    cell = jnp.asarray(cell)
    positions = jnp.asarray(positions)
    idx, vec = _filter_pairs(cutoff, neighbor_indices, neighbor_vectors)
    shifts = jnp.asarray(neighbor_shifts)[
        np.linalg.norm(np.asarray(neighbor_vectors), axis=-1) < cutoff
    ]

    smearing_ref = float(cutoff) / _REF_RATIO
    ref = CalculatorDipole(
        PotentialDipole(smearing=smearing_ref),
        lr_wavelength=smearing_ref / _REF_LR_FACTOR,
    )
    f_ref = _forces(ref, dipoles, cell, positions, idx, vec, shifts)
    rms_scale = 1.0  # absolute RMS force error, like the scalar bounds

    timer = _DipoleTimings(dipoles, cell, positions, idx, vec)
    best = None
    lowest = None  # (err, smearing, param) fallback when nothing qualifies
    for ratio in smearing_ratios:
        smearing = float(cutoff) / ratio
        for param in candidates:
            calc = make_calc(smearing, param)
            f = _forces(calc, dipoles, cell, positions, idx, vec, shifts)
            err = float(
                jnp.sqrt(jnp.mean(jnp.sum((f - f_ref) ** 2, axis=-1)))
            ) / rms_scale
            if lowest is None or err < lowest[0]:
                lowest = (err, smearing, param)
            if err > accuracy:
                continue
            t = timer(calc, **{"ns_kvectors": calc.get_ns_kvectors(cell)})
            if best is None or t < best[2]:
                best = (smearing, param, t)
            # candidates are ordered coarse → fine: the first qualifying
            # one is the cheapest for this smearing, skip the finer rest
            break
    if best is None:
        warn(
            "No parameter combination met the accuracy requirement.\n"
            "Returning the parameter with the smallest measured force "
            f"error, which is {lowest[0]:.3e}.\n",
            stacklevel=2,
        )
        return lowest[1], lowest[2], float("inf")
    return best


def tune_ewald_dipole(
    dipoles,
    cell,
    positions,
    cutoff: float,
    neighbor_indices,
    neighbor_vectors,
    neighbor_shifts,
    ns_lo: int = 2,
    ns_hi: int = 40,
    accuracy: float = 1e-3,
    smearing_ratios=(4.0, 4.5, 5.0, 5.5),
) -> tuple[float, dict[str, Any], float]:
    r"""Find ``(smearing, lr_wavelength)`` for :class:`CalculatorDipole`.

    Screens ``lr_wavelength = min_cell_dim / ns`` for ``ns = ns_lo..ns_hi``
    crossed with ``smearing = cutoff / ratio``, measuring each candidate's
    ABSOLUTE RMS force error against a converged dipolar-Ewald reference.
    Per smearing the scan stops at the first (coarsest = cheapest)
    qualifying wavelength, which is wall-clock-timed; the fastest
    qualifying ``(smearing, lr_wavelength)`` wins.  The default ladder goes
    much deeper than the scalar ``tune_ewald``'s ``ns_hi = 14`` because the
    dipolar k-sum's (μ·k)² weight needs ~2.5× more k-resolution at equal
    accuracy.

    :param neighbor_vectors: ``(P, 3)`` pair displacement vectors (the
        dipolar calculators take vectors, not distances); build at a cutoff
        ≥ ``cutoff`` — the tuner filters down.
    :param neighbor_shifts: ``(P, 3)`` integer cell shifts of each pair
        (needed to rebuild the vectors differentiably for the force error).
    :return: ``(smearing, {"lr_wavelength": ...}, seconds_per_step)``.
    """
    min_dim = float(jnp.min(jnp.linalg.norm(jnp.asarray(cell), axis=1)))
    candidates = [
        {"lr_wavelength": min_dim / ns} for ns in range(ns_lo, ns_hi + 1)
    ]

    def make_calc(smearing, param):
        return CalculatorDipole(PotentialDipole(smearing=smearing), **param)

    return _tune_dipole(
        dipoles, cell, positions, cutoff, neighbor_indices, neighbor_vectors,
        neighbor_shifts, candidates, make_calc, accuracy, smearing_ratios,
    )


def tune_pme_dipole(
    dipoles,
    cell,
    positions,
    cutoff: float,
    neighbor_indices,
    neighbor_vectors,
    neighbor_shifts,
    nodes_lo: int = 4,
    nodes_hi: int = 7,
    mesh_lo: int = 2,
    mesh_hi: int = 7,
    accuracy: float = 1e-3,
    smearing_ratios=(4.0, 4.5, 5.0, 5.5),
) -> tuple[float, dict[str, Any], float]:
    r"""Find ``(smearing, mesh_spacing, interpolation_nodes)`` for
    :class:`PMECalculatorDipole`.

    Same measured-error screen as :func:`tune_ewald_dipole` over
    ``mesh_spacing = smearing / 2^(m/2)`` (m = ``mesh_lo..mesh_hi``, the
    scalar PME tuner's geometric mesh ladder) × Lagrange node counts ×
    smearing ratios; per smearing the scan stops at the first qualifying
    (coarsest-mesh) candidate.

    :return: ``(smearing, {"mesh_spacing": ..., "interpolation_nodes": ...},
        seconds_per_step)``.
    """

    def make_calc(smearing, param):
        return PMECalculatorDipole(
            PotentialDipole(smearing=smearing),
            mesh_spacing=smearing / 2 ** (param["_m"] / 2),
            interpolation_nodes=param["interpolation_nodes"],
        )

    candidates = [
        {"_m": m, "interpolation_nodes": nodes}
        for m in range(mesh_lo, mesh_hi + 1)
        for nodes in range(nodes_lo, nodes_hi + 1)
    ]
    smearing, param, timing = _tune_dipole(
        dipoles, cell, positions, cutoff, neighbor_indices, neighbor_vectors,
        neighbor_shifts, candidates, make_calc, accuracy, smearing_ratios,
    )
    if "_m" in param:
        param = {
            "mesh_spacing": smearing / 2 ** (param.pop("_m") / 2),
            "interpolation_nodes": param["interpolation_nodes"],
        }
    return smearing, param, timing
