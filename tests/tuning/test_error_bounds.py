"""Frozen regression anchors for the three error-bound formulas
(values from BASELINE.md / reference ``tests/tuning/test_error_bounds.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu.tuning import EwaldErrorBounds, P3MErrorBounds, PMEErrorBounds

CHARGES = jnp.asarray([[1.0], [-1.0]])
CELL = jnp.eye(3)
POSITIONS = jnp.asarray([[0.0, 0.0, 0.0], [0.4, 0.4, 0.4]])


def test_ewald_error_bounds_anchor():
    bounds = EwaldErrorBounds(CHARGES, CELL, POSITIONS)
    err = bounds(smearing=1.0, lr_wavelength=0.5, cutoff=4.4)
    np.testing.assert_allclose(float(err), 8.4304e-05, rtol=1e-4)


def test_pme_error_bounds_anchor():
    bounds = PMEErrorBounds(CHARGES, CELL, POSITIONS)
    err = bounds(smearing=1.0, mesh_spacing=0.5, cutoff=4.4, interpolation_nodes=3)
    np.testing.assert_allclose(float(err), 1.1180e-03, rtol=1e-3)


def test_p3m_error_bounds_anchor():
    bounds = P3MErrorBounds(CHARGES, CELL, POSITIONS)
    err = bounds(smearing=1.0, mesh_spacing=0.5, cutoff=4.4, interpolation_nodes=3)
    np.testing.assert_allclose(float(err), 4.5961e-04, rtol=1e-3)


@pytest.mark.parametrize(
    ("bounds_cls", "kwargs"),
    [
        (EwaldErrorBounds, {"lr_wavelength": 0.5}),
        (PMEErrorBounds, {"mesh_spacing": 0.5, "interpolation_nodes": 3}),
        (P3MErrorBounds, {"mesh_spacing": 0.5, "interpolation_nodes": 3}),
    ],
)
def test_error_bounds_jittable_and_differentiable(bounds_cls, kwargs):
    """Unlike the reference (floats only, no autograd — its own docstring
    caveat), these bounds are pure jittable functions: the smearing gradient
    exists and jit agrees with eager."""
    bounds = bounds_cls(CHARGES, CELL, POSITIONS)

    def f(smearing):
        return bounds(smearing=smearing, cutoff=4.4, **kwargs)

    eager = float(f(1.0))
    jitted = float(jax.jit(f)(jnp.asarray(1.0)))
    np.testing.assert_allclose(jitted, eager, rtol=1e-12)
    grad = float(jax.grad(f)(1.0))
    assert np.isfinite(grad)
