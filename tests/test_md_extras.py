"""Aligned MD state: spill-extras mesh spread via the extras tile table.

The aligned layout spreads its cell rows as mesh-tile slots; spill extras
are not tile slots.  ``extras_impl="tiled"`` replaces their generic
per-step scatter spread with an extras-only ``TiledInterpolation``
(refresh + tile GEMM) — measured 2.1 ms/step cheaper at 932 extras on a
v5e (131k-atom box), gated behind ``extras_impl="auto"``'s ~512-extras
crossover.  These tests pin the contract: exact agreement with the
cell-list reference path (energy, forces, cell gradient), identical values
between the scatter and tiled extras backends, and NaN-poisoning when an
extra drifts out of its tile's stencil window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchpme_tpu as tpme
from torchpme_tpu.ops.rspace_cells import compute_cell_list


@pytest.fixture()
def spilled_system():
    """A clustered f32 box that forces spill extras at capacity 8."""
    rng = np.random.default_rng(3)
    n, box = 48, 4.0
    pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
    pos[:14] = rng.uniform(0.1, 0.9, (14, 3)).astype(np.float32)
    q = rng.normal(size=(n, 1)).astype(np.float32)
    q -= q.mean()
    return jnp.asarray(pos), jnp.asarray(q), jnp.eye(3, dtype=jnp.float32) * box


@pytest.mark.parametrize("extras_impl", ["scatter", "tiled"])
def test_aligned_extras_matches_reference(spilled_system, extras_impl):
    pos, q, cell = spilled_system
    cutoff, ns = 0.9, (16, 16, 16)
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=0.35), interpolation_nodes=4
    )
    fp = tpme.MDFastPath.create(
        calc, pos, cell, cutoff, ns, mesh_impl="aligned",
        cell_capacity=8, extras_impl=extras_impl, balance=False,
        _spill=True,
    )
    assert int(np.asarray(fp.clist.extra_mask).sum()) > 0
    assert (fp.extras_tiled is not None) == (extras_impl == "tiled")
    rows = fp.bucket(pos)
    e, g_rows = jax.value_and_grad(fp.energy, argnums=2)(q, cell, rows)
    g_cell = jax.grad(fp.energy, argnums=1)(q, cell, rows)

    clist = compute_cell_list(
        pos, cell, cutoff, capacity=8, spill=True, xy_cells=(2, 2)
    )

    def e_ref_fn(q, c, p):
        return calc.energy(q, c, p, cell_list=clist, ns_mesh=ns)

    e_ref, g_ref = jax.value_and_grad(e_ref_fn, argnums=2)(q, cell, pos)
    gc_ref = jax.grad(e_ref_fn, argnums=1)(q, cell, pos)
    assert abs(float(e) - float(e_ref)) < 1e-4 * abs(float(e_ref))
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(
        np.asarray(g_rows[fp.row_of_atom]), np.asarray(g_ref), atol=2e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(g_cell), np.asarray(gc_ref),
        atol=2e-4 * max(1.0, float(jnp.max(jnp.abs(gc_ref)))),
    )


def test_aligned_extras_backends_agree(spilled_system):
    """scatter and tiled extras spreads are the same math (same stencils,
    different summation order): energies agree to f32 roundoff."""
    pos, q, cell = spilled_system
    cutoff, ns = 0.9, (16, 16, 16)
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=0.35), interpolation_nodes=4
    )
    energies = {}
    for impl in ("scatter", "tiled"):
        fp = tpme.MDFastPath.create(
            calc, pos, cell, cutoff, ns, mesh_impl="aligned",
            cell_capacity=8, extras_impl=impl, balance=False,
            _spill=True,
        )
        energies[impl] = float(fp.energy(q, cell, fp.bucket(pos)))
    np.testing.assert_allclose(
        energies["tiled"], energies["scatter"], rtol=1e-6
    )


def test_aligned_extras_stale_poisons(spilled_system):
    pos, q, cell = spilled_system
    cutoff, ns = 0.9, (16, 16, 16)
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=0.35), interpolation_nodes=4
    )
    fp = tpme.MDFastPath.create(
        calc, pos, cell, cutoff, ns, mesh_impl="aligned",
        cell_capacity=8, extras_impl="tiled", balance=False,
        _spill=True,
    )
    rows = fp.bucket(pos)
    e_pad = np.asarray(fp.clist.extra_mask).shape[0]
    erow = fp.n_rows - e_pad + int(np.argmax(np.asarray(fp.clist.extra_mask)))
    rows_bad = rows.at[erow].add(jnp.asarray([2.5, 2.5, 0.0], rows.dtype))
    assert not np.isfinite(float(fp.energy(q, cell, rows_bad)))


def test_extras_impl_validation(spilled_system):
    pos, q, cell = spilled_system
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=0.35), interpolation_nodes=4
    )
    with pytest.raises(ValueError, match="extras_impl"):
        tpme.MDFastPath.create(
            calc, pos, cell, 0.9, (16, 16, 16), mesh_impl="aligned",
            cell_capacity=8, extras_impl="bogus", _spill=True,
        )
