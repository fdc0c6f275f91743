"""The torch bridge reproduces both this library and the reference.

Covers: value/gradient equality with the JAX calculators (the bridge adds
no math of its own), torch ``gradcheck`` on the autograd splice, chained
backward through torch-side recomputed distances (the reference's force
pattern, ``/root/reference/tests/helpers.py:278-304``), and — when the
reference package imports — direct energy/force parity against
lab-cosmo/torch-pme itself on the same inputs.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import torchpme_tpu as tpme
from torchpme_tpu.interop.torch_bridge import (
    TorchCalculator,
    TorchCalculatorDipole,
    jax2torch,
)
from torchpme_tpu.utils.neighbors import neighbor_list


def _system(n=24, seed=3, box=6.0, cutoff=2.5):
    rng = np.random.default_rng(seed)
    positions = rng.uniform(0, box, (n, 3))
    charges = rng.normal(size=(n, 1))
    charges -= charges.mean()
    cell = np.eye(3) * box
    idx, dist, shifts = neighbor_list(positions, cell, cutoff)
    return positions, charges, cell, idx, dist, shifts


def _calcs():
    pot = tpme.CoulombPotential(smearing=0.9)
    return [
        tpme.Calculator(tpme.CoulombPotential()),
        tpme.EwaldCalculator(pot, lr_wavelength=1.5),
        tpme.PMECalculator(pot, mesh_spacing=0.45),
        tpme.P3MCalculator(pot, mesh_spacing=0.45),
    ]


@pytest.mark.parametrize("calc", _calcs(), ids=lambda c: type(c).__name__)
def test_values_and_gradients_match_jax(calc):
    positions, charges, cell, idx, dist, _ = _system()
    tcalc = TorchCalculator(calc)

    tq = torch.tensor(charges, requires_grad=True)
    tc = torch.tensor(cell, requires_grad=True)
    tp = torch.tensor(positions, requires_grad=True)
    td = torch.tensor(dist, requires_grad=True)
    pot_t = tcalc(tq, tc, tp, torch.as_tensor(idx), td)

    kw = {}
    if hasattr(calc, "get_ns_mesh"):
        kw["ns_mesh"] = calc.get_ns_mesh(cell)
    elif hasattr(calc, "get_ns_kvectors"):
        kw["ns_kvectors"] = calc.get_ns_kvectors(cell)

    def e_jax(q, c, p, d):
        return jnp.sum(calc(q, c, p, jnp.asarray(idx), d, **kw) * q)

    pot_j = calc(
        jnp.asarray(charges), jnp.asarray(cell), jnp.asarray(positions),
        jnp.asarray(idx), jnp.asarray(dist), **kw,
    )
    np.testing.assert_allclose(
        pot_t.detach().numpy(), np.asarray(pot_j), rtol=1e-12, atol=1e-13
    )

    torch.sum(pot_t * tq).backward()
    gj = jax.grad(e_jax, argnums=(0, 1, 2, 3))(
        jnp.asarray(charges), jnp.asarray(cell),
        jnp.asarray(positions), jnp.asarray(dist),
    )
    for got, want in zip((tq.grad, tc.grad, tp.grad, td.grad), gj):
        scale = max(1.0, float(jnp.max(jnp.abs(want))))
        np.testing.assert_allclose(
            got.numpy(), np.asarray(want), atol=1e-12 * scale
        )


def test_gradcheck_pme():
    positions, charges, cell, idx, dist, _ = _system(n=8, box=4.0, cutoff=1.8)
    calc = TorchCalculator(
        tpme.PMECalculator(tpme.CoulombPotential(smearing=0.8), mesh_spacing=0.5)
    )
    idx_t = torch.as_tensor(idx)

    def f(q, c, p, d):
        return torch.sum(calc(q, c, p, idx_t, d) * q)

    assert torch.autograd.gradcheck(
        f,
        (
            torch.tensor(charges, requires_grad=True),
            torch.tensor(cell, requires_grad=True),
            torch.tensor(positions, requires_grad=True),
            torch.tensor(dist, requires_grad=True),
        ),
        eps=1e-6,
        atol=1e-7,
    )


def test_forces_through_torch_distances():
    """Recompute distances torch-side (the reference's force pattern) so the
    chain positions -> distances -> bridge -> energy crosses frameworks."""
    positions, charges, cell, idx, dist, shifts = _system()
    calc_j = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=0.9), mesh_spacing=0.45
    )
    tcalc = TorchCalculator(calc_j)

    tp = torch.tensor(positions, requires_grad=True)
    tc = torch.as_tensor(cell)
    tq = torch.as_tensor(charges)
    idx_t = torch.as_tensor(idx)
    sh = torch.as_tensor(shifts.astype(np.float64))
    vec = tp[idx_t[:, 1]] - tp[idx_t[:, 0]] + sh @ tc
    d = torch.linalg.norm(vec, dim=-1)
    torch.sum(tcalc(tq, tc, tp, idx_t, d) * tq).backward()

    ns = calc_j.get_ns_mesh(cell)

    def e_jax(p):
        v = p[idx[:, 1]] - p[idx[:, 0]] + jnp.asarray(shifts, p.dtype) @ jnp.asarray(cell)
        dd = jnp.linalg.norm(v, axis=-1)
        return jnp.sum(
            calc_j(jnp.asarray(charges), jnp.asarray(cell), p,
                   jnp.asarray(idx), dd, ns_mesh=ns)
            * jnp.asarray(charges)
        )

    g = jax.grad(e_jax)(jnp.asarray(positions))
    np.testing.assert_allclose(
        tp.grad.numpy(), np.asarray(g), atol=1e-12 * float(jnp.max(jnp.abs(g)))
    )


def test_dipole_bridge_matches_jax():
    rng = np.random.default_rng(5)
    n, box, cutoff = 20, 6.0, 2.5
    positions = rng.uniform(0, box, (n, 3))
    dipoles = rng.normal(size=(n, 3))
    cell = np.eye(3) * box
    idx, _d, shifts = neighbor_list(positions, cell, cutoff)
    vec = (
        positions[idx[:, 1]] - positions[idx[:, 0]]
        + shifts.astype(np.float64) @ cell
    )
    calc = tpme.CalculatorDipole(
        tpme.PotentialDipole(smearing=0.9), lr_wavelength=1.5
    )
    tcalc = TorchCalculatorDipole(calc)
    tm = torch.tensor(dipoles, requires_grad=True)
    tv = torch.tensor(vec, requires_grad=True)
    pot_t = tcalc(tm, torch.as_tensor(cell), torch.as_tensor(positions),
                  torch.as_tensor(idx), tv)
    nsk = calc.get_ns_kvectors(cell)
    pot_j = calc(jnp.asarray(dipoles), jnp.asarray(cell),
                 jnp.asarray(positions), jnp.asarray(idx),
                 jnp.asarray(vec), ns_kvectors=nsk)
    np.testing.assert_allclose(
        pot_t.detach().numpy(), np.asarray(pot_j), rtol=1e-12, atol=1e-13
    )
    torch.sum(pot_t * tm).backward()

    def e_jax(m, v):
        return jnp.sum(
            calc(m, jnp.asarray(cell), jnp.asarray(positions),
                 jnp.asarray(idx), v, ns_kvectors=nsk) * m
        )

    gm, gv = jax.grad(e_jax, argnums=(0, 1))(
        jnp.asarray(dipoles), jnp.asarray(vec)
    )
    np.testing.assert_allclose(tm.grad.numpy(), np.asarray(gm), atol=1e-11)
    np.testing.assert_allclose(tv.grad.numpy(), np.asarray(gv), atol=1e-11)


def test_jax2torch_utility():
    g = jax2torch(lambda x, w: jnp.sum(jnp.tanh(x @ w)))
    x = torch.randn(4, 3, dtype=torch.float64, requires_grad=True)
    w = torch.randn(3, 2, dtype=torch.float64, requires_grad=True)
    g(x, w).backward()
    assert torch.autograd.gradcheck(g, (x.detach().requires_grad_(True),
                                        w.detach().requires_grad_(True)))


def test_float64_requires_x64_error():
    calc = TorchCalculator(tpme.Calculator(tpme.CoulombPotential()))
    positions, charges, cell, idx, dist, _ = _system(n=6, box=4.0, cutoff=1.5)
    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(ValueError, match="float64"):
            calc(torch.as_tensor(charges), torch.as_tensor(cell),
                 torch.as_tensor(positions), torch.as_tensor(idx),
                 torch.as_tensor(dist))
    finally:
        jax.config.update("jax_enable_x64", True)


def _import_reference():
    sys.path.insert(0, "/root/reference/src")
    if "torchpme._version" not in sys.modules:
        vmod = types.ModuleType("torchpme._version")
        vmod.__version__ = "0.5.0"
        vmod.__version_tuple__ = (0, 5, 0)
        sys.modules["torchpme._version"] = vmod
    import torchpme

    return torchpme


def test_reference_parity_pme():
    """Same inputs through lab-cosmo/torch-pme and through the bridge:
    energies and forces agree (the drop-in-replacement statement)."""
    torchpme = _import_reference()
    positions, charges, cell, idx, dist, shifts = _system(n=16, seed=11)

    smearing, spacing, nodes = 0.9, 0.45, 4
    ref = torchpme.PMECalculator(
        torchpme.CoulombPotential(smearing=smearing),
        mesh_spacing=spacing,
        interpolation_nodes=nodes,
    ).to(torch.float64)
    ours = TorchCalculator(
        tpme.PMECalculator(
            tpme.CoulombPotential(smearing=smearing),
            mesh_spacing=spacing,
            interpolation_nodes=nodes,
        )
    )

    def energy(module):
        tp = torch.tensor(positions, requires_grad=True)
        tc = torch.as_tensor(cell)
        idx_t = torch.as_tensor(idx)
        vec = tp[idx_t[:, 1]] - tp[idx_t[:, 0]] + torch.as_tensor(
            shifts.astype(np.float64)
        ) @ tc
        d = torch.linalg.norm(vec, dim=-1)
        q = torch.as_tensor(charges)
        e = torch.sum(module(q, tc, tp, idx_t, d) * q)
        e.backward()
        return float(e.detach()), tp.grad.numpy()

    e_ref, f_ref = energy(ref)
    e_ours, f_ours = energy(ours)
    # PME mesh differs (power-of-2 + DFT-by-matmul vs rfftn); both meet the
    # same error bound, so compare at the method's accuracy, not ulps.
    assert abs(e_ours - e_ref) < 5e-3 * max(1.0, abs(e_ref))
    np.testing.assert_allclose(
        f_ours, f_ref, atol=5e-3 * float(np.abs(f_ref).max())
    )


def test_reference_parity_ewald_tight():
    """Ewald has no mesh discretization: parity is near machine-exact."""
    torchpme = _import_reference()
    positions, charges, cell, idx, dist, shifts = _system(n=12, seed=13)
    smearing, lr_wavelength = 1.0, 1.0
    ref = torchpme.EwaldCalculator(
        torchpme.CoulombPotential(smearing=smearing),
        lr_wavelength=lr_wavelength,
    ).to(torch.float64)
    ours = TorchCalculator(
        tpme.EwaldCalculator(
            tpme.CoulombPotential(smearing=smearing),
            lr_wavelength=lr_wavelength,
        )
    )
    q = torch.as_tensor(charges)
    tc = torch.as_tensor(cell)
    tp = torch.as_tensor(positions)
    idx_t = torch.as_tensor(idx)
    d = torch.as_tensor(dist)
    e_ref = float(torch.sum(ref(q, tc, tp, idx_t, d) * q))
    e_ours = float(torch.sum(ours(q, tc, tp, idx_t, d) * q))
    assert abs(e_ours - e_ref) < 1e-9 * max(1.0, abs(e_ref))


@pytest.mark.parametrize(
    "family,nodes",
    [("PME", 4), ("PME", 5), ("P3M", 3), ("P3M", 4)],
)
def test_reference_parity_mesh_same_discretization(family, nodes):
    """Mesh-calculator parity at the reference's EXACT discretization.

    ``test_reference_parity_pme`` compares at method accuracy (5e-3) because
    the default mesh sizings differ (power-of-2 + DFT-by-matmul vs rfftn).
    Here we force OUR calculator onto the reference's own discretization —
    its ``get_ns_mesh`` result, the same Lagrange/P3M node count, the
    ``rfftn`` backend, scatter spreading — in float64, which pins the mesh
    path ours-vs-reference at machine precision (≤1e-12, far inside the
    1e-5 drop-in-replacement target).  Reference:
    ``/root/reference/src/torchpme/calculators/pme.py:88-143``,
    ``calculators/p3m.py``."""
    torchpme = _import_reference()
    from torchpme.lib import get_ns_mesh as ref_get_ns

    positions, charges, cell, idx, dist, shifts = _system(n=16, seed=11)
    smearing, spacing = 0.9, 0.45
    ref_cls = getattr(torchpme, f"{family}Calculator")
    ours_cls = getattr(tpme, f"{family}Calculator")
    ref = ref_cls(
        torchpme.CoulombPotential(smearing=smearing),
        mesh_spacing=spacing,
        interpolation_nodes=nodes,
    ).to(torch.float64)
    ours = ours_cls(
        tpme.CoulombPotential(smearing=smearing),
        mesh_spacing=spacing,
        interpolation_nodes=nodes,
        fft_backend="fft",
        mesh_backend="scatter",
    )
    ns = tuple(int(x) for x in ref_get_ns(torch.as_tensor(cell), spacing))

    tp = torch.tensor(positions, requires_grad=True)
    tc = torch.as_tensor(cell)
    idx_t = torch.as_tensor(idx)
    vec = tp[idx_t[:, 1]] - tp[idx_t[:, 0]] + torch.as_tensor(
        shifts.astype(np.float64)
    ) @ tc
    d = torch.linalg.norm(vec, dim=-1)
    q = torch.as_tensor(charges)
    e_ref_t = torch.sum(ref(q, tc, tp, idx_t, d) * q)
    e_ref_t.backward()
    e_ref, f_ref = float(e_ref_t.detach()), tp.grad.numpy()

    def e_jax(p):
        v = (
            p[idx[:, 1]]
            - p[idx[:, 0]]
            + jnp.asarray(shifts, p.dtype) @ jnp.asarray(cell)
        )
        dd = jnp.linalg.norm(v, axis=-1)
        return jnp.sum(
            ours(jnp.asarray(charges), jnp.asarray(cell), p,
                 jnp.asarray(idx), dd, ns_mesh=ns)
            * jnp.asarray(charges)
        )

    e_ours, f_ours = jax.value_and_grad(e_jax)(jnp.asarray(positions))
    assert abs(float(e_ours) - e_ref) < 1e-12 * max(1.0, abs(e_ref))
    np.testing.assert_allclose(
        np.asarray(f_ours), f_ref, atol=1e-12 * float(np.abs(f_ref).max())
    )
