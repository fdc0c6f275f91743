"""Parameter-tuning infrastructure: error bounds, grid search, timing.

TPU-native counterpart of ``/root/reference/src/torchpme/tuning/tuner.py``.
Differences from the reference driven by JAX:

* error bounds are **pure jittable functions** of their scalar parameters
  (the reference's module-based bounds take plain floats and cannot be
  autodiffed, ``tuning/ewald.py:28-37`` note); here the same callables accept
  floats or traced arrays, so smearing/mesh selection can itself be optimized
  on device;
* candidate timing jit-compiles an energy+gradient step per parameter set and
  measures steady state after warm-up with ``block_until_ready`` (compile time
  excluded — each candidate changes static shapes and must recompile, see
  SURVEY.md §7 risks).
"""

from __future__ import annotations

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..potentials import InversePowerLawPotential
from ..utils.validation import validate_parameters

__all__ = [
    "TuningErrorBounds",
    "TunerBase",
    "GridSearchTuner",
    "TuningTimings",
    "tune_over_cutoffs",
]


class TuningErrorBounds:
    """Base class for calculator error-bound estimators.

    Subclasses implement :meth:`error` as a pure function of the tuning
    parameters; instances are callable.
    """

    def __init__(self, charges, cell, positions):
        self._charges = jnp.asarray(charges)
        self._cell = jnp.asarray(cell)
        self._positions = jnp.asarray(positions)

    def __call__(self, *args, **kwargs):
        return self.error(*args, **kwargs)

    def error(self, *args, **kwargs):
        raise NotImplementedError

    forward = __call__


class TunerBase:
    """Shared tuning scaffolding: smearing estimation and neighbor filtering.

    The smearing is chosen so that the real-space truncation error equals a
    quarter of the requested accuracy (inverting the Kolafa–Perram real-space
    bound; parity with reference ``tuning/tuner.py:123-147``).

    :param charges: ``(N, 1)`` charges.
    :param cell: ``(3, 3)`` cell.
    :param positions: ``(N, 3)`` coordinates.
    :param cutoff: real-space cutoff (a tuning hyperparameter).
    :param calculator: calculator class to instantiate for timing.
    :param exponent: potential exponent; only ``p = 1`` is supported.
    :param full_neighbor_list: neighbor-list convention for timing runs.
    :param prefactor: unit prefactor forwarded to the timed potential.
    """

    def __init__(
        self,
        charges,
        cell,
        positions,
        cutoff: float,
        calculator,
        exponent: int = 1,
        full_neighbor_list: bool = False,
        prefactor: float = 1.0,
    ):
        if exponent != 1:
            raise NotImplementedError(
                f"Only exponent = 1 is supported but got {exponent}."
            )
        validate_parameters(
            charges=jnp.asarray(charges),
            cell=jnp.asarray(cell),
            positions=jnp.asarray(positions),
            neighbor_indices=jnp.zeros((1, 2), dtype=jnp.int32),
            neighbor_distances=jnp.ones((1,), dtype=jnp.asarray(positions).dtype),
        )
        self.charges = jnp.asarray(charges)
        self.cell = jnp.asarray(cell)
        self.positions = jnp.asarray(positions)
        self.cutoff = cutoff
        self.calculator = calculator
        self.exponent = exponent
        self.full_neighbor_list = full_neighbor_list
        self.prefactor = prefactor

        self._smearing_prefac = (
            2 * float(jnp.sum(self.charges**2)) / math.sqrt(self.positions.shape[0])
        )

    def tune(self, accuracy: float = 1e-3):
        raise NotImplementedError

    def estimate_smearing(self, accuracy: float) -> float:
        """Smearing such that the real-space error bound equals ``accuracy/4``."""
        if not isinstance(accuracy, float):
            raise ValueError(f"'{accuracy}' is not a float.")
        volume = float(jnp.abs(jnp.linalg.det(self.cell)))
        ratio = math.sqrt(
            -2
            * math.log(
                accuracy
                / 2
                / self._smearing_prefac
                * math.sqrt(self.cutoff * volume)
            )
        )
        return float(self.cutoff / ratio)

    @staticmethod
    def filter_neighbors(cutoff: float, neighbor_indices, neighbor_distances):
        """Restrict a (pre-computed, larger-cutoff) neighbor list to ``cutoff``.

        Runs on the host (dynamic output shape); returns jnp arrays.
        """
        d = np.asarray(neighbor_distances)
        keep = d < cutoff
        return (
            jnp.asarray(np.asarray(neighbor_indices)[keep]),
            jnp.asarray(d[keep]),
        )


def tune_over_cutoffs(
    tune_fn,
    charges,
    cell,
    positions,
    cutoffs,
    neighbor_indices,
    neighbor_distances,
    **tune_kwargs,
):
    r"""Jointly tune the real-space ``cutoff`` with the k-space parameters.

    The reference treats the cutoff as a fixed hyperparameter
    (``/root/reference/src/torchpme/tuning/tuner.py:123-147`` inverts the
    error at a given cutoff); this convenience sweep runs a ``tune_*``
    function at each candidate cutoff and returns the wall-clock-fastest
    combination.  The provided neighbor list must be computed at
    ``max(cutoffs)`` — each trial filters it down (like the reference's
    ``filter_neighbors``), so only one neighbor-list build is needed.

    :param tune_fn: one of :func:`~torchpme_tpu.tuning.tune_ewald`,
        :func:`~torchpme_tpu.tuning.tune_pme`,
        :func:`~torchpme_tpu.tuning.tune_p3m`.
    :param cutoffs: iterable of candidate cutoffs, each ≤ the cutoff the
        neighbor list was built with.
    :param tune_kwargs: forwarded to ``tune_fn`` (accuracy, grid bounds, ...).
    :return: ``(cutoff, smearing, kspace_params, seconds_per_step)`` of the
        fastest accurate combination.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> from torchpme_tpu.tuning import tune_ewald, tune_over_cutoffs
    >>> from torchpme_tpu.utils.neighbors import neighbor_list
    >>> positions = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
    >>> charges = jnp.asarray([[1.0], [-1.0]])
    >>> cell = jnp.eye(3)
    >>> idx, dist, _ = neighbor_list(positions, cell, cutoff=0.49)
    >>> cutoff, smearing, params, timing = tune_over_cutoffs(
    ...     tune_ewald, charges, cell, positions, [0.4, 0.49],
    ...     jnp.asarray(idx), jnp.asarray(dist), ns_lo=4, ns_hi=6,
    ... )
    >>> cutoff in (0.4, 0.49) and smearing > 0 and "lr_wavelength" in params
    True
    """
    import warnings

    best = None
    for cutoff in cutoffs:
        with warnings.catch_warnings():
            # an individual cutoff failing its accuracy screen is fine as
            # long as some cutoff passes; the sweep raises when all fail
            warnings.simplefilter("ignore", UserWarning)
            smearing, params, timing = tune_fn(
                charges,
                cell,
                positions,
                cutoff=float(cutoff),
                neighbor_indices=neighbor_indices,
                neighbor_distances=neighbor_distances,
                **tune_kwargs,
            )
        if math.isfinite(timing) and (best is None or timing < best[3]):
            best = (float(cutoff), smearing, params, timing)
    if best is None:
        raise ValueError(
            "No (cutoff, parameters) combination met the accuracy requirement; "
            "widen the candidate grids or relax the accuracy."
        )
    return best


class TuningTimings:
    """Wall-clock timing of a calculator's jitted energy+gradient step.

    The timed quantity is a full forward + backward (gradients w.r.t.
    positions, charges and cell) with ``block_until_ready``, averaged over
    ``n_repeat`` runs after ``n_warmup`` runs (the first of which pays
    compilation).
    """

    def __init__(
        self,
        charges,
        cell,
        positions,
        neighbor_indices,
        neighbor_distances,
        n_repeat: int = 4,
        n_warmup: int = 2,
        run_backward: bool = True,
    ):
        validate_parameters(
            charges=jnp.asarray(charges),
            cell=jnp.asarray(cell),
            positions=jnp.asarray(positions),
            neighbor_indices=jnp.asarray(neighbor_indices),
            neighbor_distances=jnp.asarray(neighbor_distances),
        )
        self.charges = jnp.asarray(charges)
        self.cell = jnp.asarray(cell)
        self.positions = jnp.asarray(positions)
        self.neighbor_indices = jnp.asarray(neighbor_indices)
        self.neighbor_distances = jnp.asarray(neighbor_distances)
        self.n_repeat = n_repeat
        self.n_warmup = n_warmup
        self.run_backward = run_backward

    def __call__(self, calculator, **extra_kwargs) -> float:
        def total_energy(positions, charges, cell):
            potentials = calculator(
                charges,
                cell,
                positions,
                self.neighbor_indices,
                self.neighbor_distances,
                **extra_kwargs,
            )
            return jnp.sum(potentials * charges)

        if self.run_backward:
            step = jax.jit(jax.value_and_grad(total_energy, argnums=(0, 1, 2)))
        else:
            step = jax.jit(total_energy)

        elapsed = 0.0
        for i in range(self.n_warmup + self.n_repeat):
            start = time.monotonic()
            out = step(self.positions, self.charges, self.cell)
            # sync through a host transfer: under async/tunneled dispatch,
            # block_until_ready alone can return before execution finishes
            _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            if i >= self.n_warmup:
                elapsed += time.monotonic() - start
        return elapsed / self.n_repeat

    forward = __call__


class GridSearchTuner(TunerBase):
    """Grid-search tuner: error-bound screening, wall-clock ranking.

    Every candidate parameter set is scored with the analytic error bound;
    only candidates meeting the requested accuracy are actually timed (the
    rest get infinite timing).  Parity with reference
    ``tuning/tuner.py:169-280``.

    :param params: list of k-space parameter dicts to screen (e.g.
        ``{"mesh_spacing": ..., "interpolation_nodes": ...}``).
    :param extra_call_kwargs_fn: optional callable ``params -> dict`` of
        extra per-call kwargs for the timed forward (used by mesh calculators
        to pass their static ``ns_mesh``).
    """

    def __init__(
        self,
        charges,
        cell,
        positions,
        cutoff: float,
        calculator,
        error_bounds: TuningErrorBounds,
        params: list[dict],
        neighbor_indices,
        neighbor_distances,
        full_neighbor_list: bool = False,
        prefactor: float = 1.0,
        exponent: int = 1,
    ):
        super().__init__(
            charges,
            cell,
            positions,
            cutoff,
            calculator,
            exponent=exponent,
            full_neighbor_list=full_neighbor_list,
            prefactor=prefactor,
        )
        self.error_bounds = error_bounds
        self.params = params
        neighbor_indices, neighbor_distances = self.filter_neighbors(
            cutoff, neighbor_indices, neighbor_distances
        )
        self.time_func = TuningTimings(
            charges,
            cell,
            positions,
            neighbor_indices,
            neighbor_distances,
            run_backward=True,
        )

    def tune(self, accuracy: float = 1e-3) -> tuple[list[float], list[float]]:
        """Return (error, timing) per candidate; timing is ∞ above accuracy."""
        if not isinstance(accuracy, float):
            raise ValueError(f"'{accuracy}' is not a float.")
        smearing = self.estimate_smearing(accuracy)
        errors, timings = [], []
        for param in self.params:
            error = float(self.error_bounds(smearing=smearing, cutoff=self.cutoff, **param))
            errors.append(error)
            timings.append(
                self._time_candidate(smearing, param) if error <= accuracy else float("inf")
            )
        return errors, timings

    def _time_candidate(self, smearing: float, k_space_params: dict) -> float:
        calculator = self.calculator(
            InversePowerLawPotential(
                exponent=self.exponent,
                smearing=smearing,
                prefactor=self.prefactor,
            ),
            full_neighbor_list=self.full_neighbor_list,
            **k_space_params,
        )
        # static-shape inputs precomputed eagerly so the timed step can be jitted
        extra = {}
        if hasattr(calculator, "get_ns_mesh"):
            extra["ns_mesh"] = calculator.get_ns_mesh(self.cell)
        elif hasattr(calculator, "get_ns_kvectors"):
            extra["ns_kvectors"] = calculator.get_ns_kvectors(self.cell)
        return self.time_func(calculator, **extra)
