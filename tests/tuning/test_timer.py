"""Timing-harness sanity (parity with reference ``tests/tuning/test_timer.py``)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from torchpme_tpu import CoulombPotential, EwaldCalculator
from torchpme_tpu.tuning import TuningTimings

sys.path.append(str(Path(__file__).parents[1]))
from helpers import crystal_neighbor_list, define_crystal


def test_timer_returns_positive_steady_state():
    positions, charges, cell, *_ = define_crystal("CsCl")
    indices, distances, _ = crystal_neighbor_list(positions, cell, cutoff=0.9)
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    kvectors = calc.compute_kvectors(cell)
    timer = TuningTimings(
        charges, cell, positions, indices, distances, n_repeat=3, n_warmup=1
    )
    seconds = timer(calc, kvectors=kvectors)
    assert np.isfinite(seconds) and seconds > 0
    # steady-state must be far below a (cached) compile: sub-second on CPU
    assert seconds < 1.0


def test_timer_forward_only_cheaper_shape():
    positions, charges, cell, *_ = define_crystal("CsCl")
    indices, distances, _ = crystal_neighbor_list(positions, cell, cutoff=0.9)
    calc = EwaldCalculator(CoulombPotential(smearing=0.2), lr_wavelength=0.1)
    kvectors = calc.compute_kvectors(cell)
    timer = TuningTimings(
        charges,
        cell,
        positions,
        indices,
        distances,
        n_repeat=2,
        n_warmup=1,
        run_backward=False,
    )
    seconds = timer(calc, kvectors=kvectors)
    assert np.isfinite(seconds) and seconds > 0
