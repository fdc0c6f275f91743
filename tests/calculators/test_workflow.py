"""Workflow/deployment tests (parity with reference
``tests/calculators/test_workflow.py``): constructor validation, jit
compatibility (the JAX analog of TorchScript/torch.compile), pytree
serialization round trips, gradient finiteness, dtype propagation, and the
LAMMPS slab-correction anchor."""

import pickle
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchpme_tpu import (
    Calculator,
    CoulombPotential,
    EwaldCalculator,
    P3MCalculator,
    PMECalculator,
)
from torchpme_tpu.prefactors import kcalmol_A

sys.path.append(str(Path(__file__).parents[1]))

SMEARING = 1.0
LR_WAVELENGTH = SMEARING / 4
MESH_SPACING = SMEARING / 4

CALCULATORS = [
    (Calculator, {"potential": CoulombPotential()}),
    (
        EwaldCalculator,
        {
            "potential": CoulombPotential(smearing=SMEARING),
            "lr_wavelength": LR_WAVELENGTH,
        },
    ),
    (
        PMECalculator,
        {
            "potential": CoulombPotential(smearing=SMEARING),
            "mesh_spacing": MESH_SPACING,
        },
    ),
    (
        P3MCalculator,
        {
            "potential": CoulombPotential(smearing=SMEARING),
            "mesh_spacing": MESH_SPACING,
        },
    ),
]


def cscl_system(dtype=jnp.float64):
    positions = jnp.asarray([[0.0, 0, 0], [0.5, 0.5, 0.5]], dtype=dtype)
    charges = jnp.asarray([[1.0], [-1.0]], dtype=dtype)
    cell = jnp.eye(3, dtype=dtype)
    neighbor_indices = jnp.asarray([[0, 1]])
    neighbor_distances = jnp.asarray([0.8660], dtype=dtype)
    return charges, cell, positions, neighbor_indices, neighbor_distances


def static_call_kwargs(calc, cell):
    """Precompute the static-shape inputs each calculator needs under jit."""
    if hasattr(calc, "get_ns_mesh"):
        return {"ns_mesh": calc.get_ns_mesh(cell)}
    if hasattr(calc, "get_ns_kvectors"):
        return {"ns_kvectors": calc.get_ns_kvectors(cell)}
    return {}


@pytest.mark.parametrize(("cls", "params"), CALCULATORS)
class TestWorkflow:
    def test_smearing_non_positive(self, cls, params):
        if cls is Calculator:
            return
        for bad in (0.0, -0.1):
            mod = dict(params, potential=CoulombPotential(smearing=bad))
            with pytest.raises(ValueError, match="must be positive"):
                cls(**mod)

    def test_interpolation_order_error(self, cls, params):
        if cls in (PMECalculator, P3MCalculator):
            with pytest.raises(ValueError, match="`interpolation_nodes` is 10"):
                cls(**params, interpolation_nodes=10)

    def test_lr_wavelength_non_positive(self, cls, params):
        if cls is EwaldCalculator:
            for bad in (0.0, -0.1):
                with pytest.raises(ValueError, match="must be positive"):
                    cls(**dict(params, lr_wavelength=bad))

    def test_potential_type_error(self, cls, params):
        with pytest.raises(TypeError, match="Potential must be an instance"):
            cls(**dict(params, potential="not a potential"))

    def test_missing_smearing_error(self, cls, params):
        if cls is Calculator:
            return
        with pytest.raises(ValueError, match="smearing|range radius"):
            cls(**dict(params, potential=CoulombPotential(smearing=None)))

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
    def test_output_dtype_follows_input(self, cls, params, dtype):
        calc = cls(**params)
        charges, cell, positions, idx, dist = cscl_system(dtype)
        out = calc(charges, cell, positions, idx, dist)
        assert out.dtype == dtype
        assert out.shape == charges.shape

    def test_jit_matches_eager(self, cls, params):
        """JAX analog of the reference's TorchScript/torch.compile matrix."""
        calc = cls(**params)
        charges, cell, positions, idx, dist = cscl_system()
        extra = static_call_kwargs(calc, cell)
        eager = calc(charges, cell, positions, idx, dist, **extra)

        # `ns_mesh` is static and must be closed over, not traced; `kvectors`
        # may be traced — keep it a closure too for simplicity
        @jax.jit
        def jitted(charges, cell, positions, dist):
            return calc(charges, cell, positions, idx, dist, **extra)

        np.testing.assert_allclose(
            jitted(charges, cell, positions, dist), eager, rtol=1e-12
        )

    def test_pytree_serialization_roundtrip(self, cls, params):
        """Pickle round trip of the calculator pytree (JAX analog of the
        reference's TorchScript save/load, ``test_workflow.py:154-162``)."""
        calc = cls(**params)
        charges, cell, positions, idx, dist = cscl_system()
        expected = calc(charges, cell, positions, idx, dist)
        leaves, treedef = jax.tree_util.tree_flatten(calc)
        restored = jax.tree_util.tree_unflatten(
            treedef, [np.asarray(leaf) for leaf in leaves]
        )
        restored2 = pickle.loads(pickle.dumps(calc))
        for candidate in (restored, restored2):
            np.testing.assert_allclose(
                candidate(charges, cell, positions, idx, dist), expected, rtol=1e-12
            )

    def test_gradients_finite(self, cls, params):
        """Gradients w.r.t. charges, positions and cell are finite and nonzero
        (reference ``test_workflow.py:163-192``)."""
        calc = cls(**params)
        charges, cell, positions, idx, dist = cscl_system()
        extra = static_call_kwargs(calc, cell)

        def energy(charges, positions, cell, dist):
            return jnp.sum(
                calc(charges, cell, positions, idx, dist, **extra) * charges
            )

        grads = jax.grad(energy, argnums=(0, 1, 2, 3))(charges, positions, cell, dist)
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(grads[0]).max()) > 0  # charges gradient nonzero
        assert float(jnp.abs(grads[3]).max()) > 0  # distances gradient nonzero


def test_periodicity_true_value():
    """2D-periodic (slab) correction vs a LAMMPS reference value."""
    charges, _, positions, idx, dist = cscl_system()
    cell = jnp.diag(jnp.asarray([10.0, 10.0, 30.0]))
    calc = EwaldCalculator(
        CoulombPotential(smearing=SMEARING), lr_wavelength=LR_WAVELENGTH
    )
    res = calc(
        charges,
        cell,
        positions,
        idx,
        dist,
        periodic=jnp.asarray([True, True, False]),
    )
    energy = float((res.T @ charges).squeeze()) * kcalmol_A
    np.testing.assert_allclose(energy, -383.44635, rtol=1e-3)


def test_periodic_all_true_equals_default():
    charges, cell, positions, idx, dist = cscl_system()
    calc = EwaldCalculator(
        CoulombPotential(smearing=SMEARING), lr_wavelength=LR_WAVELENGTH
    )
    default = calc(charges, cell, positions, idx, dist)
    explicit = calc(
        charges, cell, positions, idx, dist, periodic=jnp.asarray([True] * 3)
    )
    np.testing.assert_allclose(default, explicit, rtol=1e-14)


def test_exclusion_radius_smooth_zeroing():
    """With exclusion_radius set, the total potential inside the local region
    goes to (smoothly) zero: SR = −LR·f_cut cancels the k-space part."""
    charges, cell, positions, idx, dist = cscl_system()
    pot = CoulombPotential(smearing=SMEARING, exclusion_radius=2.0)
    calc = EwaldCalculator(pot, lr_wavelength=LR_WAVELENGTH)
    out = calc(charges, cell, positions, idx, dist)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("calc_kind", ["pme", "p3m"])
def test_quadratic_kspace_energy_matches_potential_path(calc_kind):
    """Calculator.energy's Parseval quadratic k-space fast path must equal
    sum(potentials * q) — values AND gradients — for PME and P3M."""
    import torchpme_tpu as tpme

    rng = np.random.default_rng(21)
    n, box = 40, 7.0
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
    charges = jnp.asarray(rng.normal(size=(n, 1)))
    cell = jnp.eye(3) * box
    from torchpme_tpu.utils.neighbors import compute_distances, neighbor_list

    idx, dist, shifts = map(
        jnp.asarray, neighbor_list(np.asarray(positions), np.asarray(cell), 2.5)
    )
    if calc_kind == "pme":
        calc = tpme.PMECalculator(
            tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.4
        )
    else:
        calc = tpme.P3MCalculator(
            tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.4
        )
    ns = calc.get_ns_mesh(cell)

    def e_fast(p, q, c):
        d = compute_distances(p, idx, cell=c, neighbor_shifts=shifts)
        return calc.energy(q, c, p, idx, d, ns_mesh=ns)

    def e_ref(p, q, c):
        d = compute_distances(p, idx, cell=c, neighbor_shifts=shifts)
        return jnp.sum(calc(q, c, p, idx, d, ns_mesh=ns) * q)

    args = (positions, charges, cell)
    e1, g1 = jax.jit(jax.value_and_grad(e_fast, argnums=(0, 1, 2)))(*args)
    e2, g2 = jax.value_and_grad(e_ref, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-11)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_quadratic_kspace_energy_ewald():
    """EwaldCalculator.energy's structure-factor quadratic fast path must
    equal sum(potentials * q) — values AND gradients."""
    import torchpme_tpu as tpme

    rng = np.random.default_rng(22)
    n, box = 30, 6.0
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
    charges = jnp.asarray(rng.normal(size=(n, 2)))
    cell = jnp.eye(3) * box
    from torchpme_tpu.utils.neighbors import compute_distances, neighbor_list

    idx, dist, shifts = map(
        jnp.asarray, neighbor_list(np.asarray(positions), np.asarray(cell), 2.2)
    )
    calc = tpme.EwaldCalculator(tpme.CoulombPotential(smearing=1.0), lr_wavelength=1.0)
    ns_k = calc.get_ns_kvectors(cell)

    def e_fast(p, q, c):
        d = compute_distances(p, idx, cell=c, neighbor_shifts=shifts)
        return calc.energy(q, c, p, idx, d, ns_kvectors=ns_k)

    def e_ref(p, q, c):
        d = compute_distances(p, idx, cell=c, neighbor_shifts=shifts)
        return jnp.sum(calc(q, c, p, idx, d, ns_kvectors=ns_k) * q)

    args = (positions, charges, cell)
    e1, g1 = jax.jit(jax.value_and_grad(e_fast, argnums=(0, 1, 2)))(*args)
    e2, g2 = jax.value_and_grad(e_ref, argnums=(0, 1, 2))(*args)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-12)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11)
