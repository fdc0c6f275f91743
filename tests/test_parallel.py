"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

The TPU analog of distributed tests: sharded execution must be numerically
identical to single-device execution (SURVEY.md §4 note on multi-node
testing), and gradients must flow through the collectives.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import torchpme_tpu as tpme
from torchpme_tpu.parallel import (
    compute_slab_bucketing,
    pad_to_multiple,
    sharded_ewald_potentials,
    sharded_mesh_potentials,
)

sys.path.append(str(Path(__file__).parents[0]))
from helpers import neighbor_list


@pytest.fixture(scope="module")
def device_mesh():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest should provide 8 virtual CPU devices"
    return Mesh(np.array(devices[:8]), ("atoms",))


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(3)
    n, box = 24, 6.0
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
    charges = jnp.asarray(rng.normal(size=(n, 1)))
    charges = charges - charges.mean()
    cell = jnp.eye(3) * box
    idx, dist, _ = neighbor_list(np.asarray(positions), np.asarray(cell), 2.0)
    return charges, cell, positions, jnp.asarray(idx), jnp.asarray(dist)


def test_pad_to_multiple():
    x = jnp.ones((5, 2))
    padded = pad_to_multiple(x, 4)
    assert padded.shape == (8, 2)
    np.testing.assert_allclose(padded[5:], 0.0)
    assert pad_to_multiple(x, 5).shape == (5, 2)  # already a multiple


def test_sharded_ewald_bitwise_matches_single_device(device_mesh, system):
    charges, cell, positions, idx, dist = system
    calc = tpme.EwaldCalculator(tpme.CoulombPotential(smearing=1.0), lr_wavelength=0.5)
    ref = calc(charges, cell, positions, idx, dist)
    out = sharded_ewald_potentials(
        calc, device_mesh, charges, cell, positions, idx, dist,
        calc.get_ns_kvectors(cell),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


@pytest.mark.parametrize("calc_kind", ["pme", "p3m"])
def test_sharded_mesh_matches_single_device(device_mesh, system, calc_kind):
    charges, cell, positions, idx, dist = system
    pot = tpme.CoulombPotential(smearing=1.0)
    cls = tpme.PMECalculator if calc_kind == "pme" else tpme.P3MCalculator
    calc = cls(pot, mesh_spacing=0.25)
    ns = calc.get_ns_mesh(cell)
    ref = calc(charges, cell, positions, idx, dist, ns_mesh=ns)
    out = sharded_mesh_potentials(
        calc, device_mesh, charges, cell, positions, idx, dist, ns
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_sharded_gradients_flow(device_mesh, system):
    charges, cell, positions, idx, dist = system
    calc = tpme.PMECalculator(tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.25)
    ns = calc.get_ns_mesh(cell)
    bucket = compute_slab_bucketing(
        positions, cell, ns, 8, calc.interpolation_nodes
    )

    def sharded_energy(q, pos):
        return jnp.sum(
            sharded_mesh_potentials(
                calc, device_mesh, q, cell, pos, idx, dist, ns,
                slab_bucketing=bucket,
            )
            * q
        )

    def single_energy(q, pos):
        return jnp.sum(calc(q, cell, pos, idx, dist, ns_mesh=ns) * q)

    g_sharded = jax.jit(jax.grad(sharded_energy, argnums=(0, 1)))(charges, positions)
    g_single = jax.grad(single_energy, argnums=(0, 1))(charges, positions)
    for gs, g1 in zip(g_sharded, g_single):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(g1), atol=1e-12)


def test_sharded_mesh_collective_volume(device_mesh, system):
    """No collective may carry the full mesh: the density all-reduce of the
    naive design is replaced by O(halo) ppermutes and O(mesh/D) all_to_alls
    (the per-atom (N, C) psum is the only all-reduce of mesh-derived data)."""
    charges, cell, positions, idx, dist = system
    calc = tpme.PMECalculator(tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.25)
    ns = calc.get_ns_mesh(cell)
    bucket = compute_slab_bucketing(positions, cell, ns, 8, calc.interpolation_nodes)

    fn = jax.jit(
        lambda q, pos: sharded_mesh_potentials(
            calc, device_mesh, q, cell, pos, idx, dist, ns, slab_bucketing=bucket
        )
    )
    hlo = fn.lower(charges, positions).compile().as_text()

    import re

    mesh_elems = ns[0] * ns[1] * ns[2]
    assert "all-to-all" in hlo, "distributed DFT transpose missing"
    assert "collective-permute" in hlo, "halo ring exchange missing"
    # every all-reduce operand must be far below the full mesh size
    for shape in re.findall(r"all-reduce(?:-start)?\(?\)? ?= ?\(?([^)\n]*)", hlo):
        for dims in re.findall(r"\w+\[([\d,]+)\]", shape):
            elems = int(np.prod([int(d) for d in dims.split(",")]))
            assert elems < mesh_elems // 8, (
                f"all-reduce of {elems} elements rivals the {mesh_elems}-point "
                "mesh — the full-mesh reduction is back"
            )


def test_sharded_mesh_stale_bucketing_poisons(device_mesh, system):
    """Atoms drifting out of their slab's halo window must yield NaN (an
    observable failure), never silently wrong values."""
    charges, cell, positions, idx, dist = system
    calc = tpme.PMECalculator(tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.25)
    ns = calc.get_ns_mesh(cell)
    bucket = compute_slab_bucketing(positions, cell, ns, 8, calc.interpolation_nodes)

    # drift one atom half a box along x: its stencil escapes the halo window
    drifted = positions.at[0, 0].add(float(cell[0, 0]) / 2)
    out = jax.jit(
        lambda pos: sharded_mesh_potentials(
            calc, device_mesh, charges, cell, pos, idx, dist, ns,
            slab_bucketing=bucket,
        )
    )(drifted)
    assert bool(jnp.all(jnp.isnan(out))), "stale slab bucketing not detected"


def test_sharded_mesh_requires_bucketing_under_jit(device_mesh, system):
    charges, cell, positions, idx, dist = system
    calc = tpme.PMECalculator(tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.25)
    ns = calc.get_ns_mesh(cell)
    with pytest.raises(ValueError, match="slab_bucketing"):
        jax.jit(
            lambda pos: sharded_mesh_potentials(
                calc, device_mesh, charges, cell, pos, idx, dist, ns
            )
        )(positions)


def test_slab_bucketing_validation(system):
    charges, cell, positions, idx, dist = system
    with pytest.raises(ValueError, match="divisible"):
        compute_slab_bucketing(positions, cell, (30, 32, 32), 8, 4)
    with pytest.raises(ValueError, match="halo"):
        compute_slab_bucketing(positions, cell, (16, 16, 16), 8, 7)
    with pytest.raises(ValueError, match="capacity"):
        compute_slab_bucketing(positions, cell, (32, 32, 32), 8, 4, capacity=1)
    b = compute_slab_bucketing(positions, cell, (32, 32, 32), 8, 4)
    # every atom appears exactly once
    counts = np.bincount(
        np.asarray(b.atom_index)[np.asarray(b.slot_mask)], minlength=len(positions)
    )
    np.testing.assert_array_equal(counts, 1)


# ---------------------------------------------------------------------------
# slab-sharded MD fast path (cell-list window + tiled mesh + Parseval DFT)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def md_system():
    """Box large enough for 8 cell planes along x at the test cutoff."""
    rng = np.random.default_rng(11)
    n, box = 220, 10.0
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
    charges = jnp.asarray(rng.normal(size=(n, 1)))
    charges = charges - charges.mean()
    cell = jnp.eye(3) * box
    return charges, cell, positions


MD_NS = (128, 16, 16)  # nx/8 = 16 planes per slab, tile-aligned
MD_CUTOFF = 1.0


def _md_calc(kind):
    pot = tpme.CoulombPotential(smearing=0.5)
    if kind == "p3m":
        return tpme.P3MCalculator(pot, interpolation_nodes=3)
    return tpme.PMECalculator(pot, interpolation_nodes=4)


@pytest.mark.parametrize("calc_kind", ["pme", "p3m"])
@pytest.mark.parametrize("triclinic", [False, True])
def test_sharded_md_energy_matches_fast_path(
    device_mesh, md_system, calc_kind, triclinic
):
    """The slab-sharded MD step must equal the single-chip cell-list fast
    path — energy AND gradients (forces, stress seed, charge derivatives)."""
    from torchpme_tpu.ops.rspace_cells import compute_cell_list
    from torchpme_tpu.parallel import (
        compute_sharded_md_state,
        sharded_md_energy,
    )

    charges, cell, positions = md_system
    if triclinic:
        cell = cell.at[1, 0].add(0.8).at[2, 1].add(-0.5)
    calc = _md_calc(calc_kind)
    clist = compute_cell_list(positions, cell, MD_CUTOFF)
    state = compute_sharded_md_state(
        calc, positions, cell, MD_CUTOFF, MD_NS, 8
    )

    def f_ref(q, c, p):
        return calc.energy(q, c, p, cell_list=clist, ns_mesh=MD_NS)

    def f_sh(q, c, p):
        return sharded_md_energy(calc, device_mesh, q, c, p, state)

    e_ref = f_ref(charges, cell, positions)
    e_sh = jax.jit(f_sh)(charges, cell, positions)
    np.testing.assert_allclose(float(e_sh), float(e_ref), rtol=1e-12)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(charges, cell, positions)
    g_sh = jax.jit(jax.grad(f_sh, argnums=(0, 1, 2)))(charges, cell, positions)
    for name, a, b in zip(("charges", "cell", "positions"), g_ref, g_sh):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-12 * scale,
            err_msg=f"gradient w.r.t. {name} diverged",
        )


def test_sharded_md_collective_volume(device_mesh, md_system):
    """The fast-path collectives stay sub-mesh: scalar psums, O(slab-surface)
    ppermutes, O(mesh/D) all_to_alls — never a full-mesh reduction, and no
    pair-list or element scatter anywhere on the sharded path."""
    from torchpme_tpu.parallel import (
        compute_sharded_md_state,
        sharded_md_energy,
    )

    charges, cell, positions = md_system
    calc = _md_calc("pme")
    state = compute_sharded_md_state(
        calc, positions, cell, MD_CUTOFF, MD_NS, 8
    )
    fn = jax.jit(
        lambda q, p: sharded_md_energy(calc, device_mesh, q, cell, p, state)
    )
    hlo = fn.lower(charges, positions).compile().as_text()

    import re

    mesh_elems = int(np.prod(MD_NS))
    assert "all-to-all" in hlo, "distributed DFT transpose missing"
    assert "collective-permute" in hlo, "halo ring exchange missing"
    for shape in re.findall(r"all-reduce(?:-start)?\(?\)? ?= ?\(?([^)\n]*)", hlo):
        for dims in re.findall(r"\w+\[([\d,]+)\]", shape):
            elems = int(np.prod([int(d) for d in dims.split(",")]))
            assert elems < mesh_elems // 8, (
                f"all-reduce of {elems} elements rivals the {mesh_elems}-point "
                "mesh — a full-mesh reduction crept into the fast path"
            )


def test_sharded_md_stale_state_poisons(device_mesh, md_system):
    """Atoms drifting out of their cell (or mesh tile) must yield NaN energy
    AND NaN forces — observable failure, never silently wrong values."""
    from torchpme_tpu.parallel import (
        compute_sharded_md_state,
        sharded_md_energy,
    )

    charges, cell, positions = md_system
    calc = _md_calc("pme")
    state = compute_sharded_md_state(
        calc, positions, cell, MD_CUTOFF, MD_NS, 8
    )
    drifted = positions.at[0, 0].add(float(cell[0, 0]) / 2)
    fn = jax.jit(
        lambda p: sharded_md_energy(calc, device_mesh, charges, cell, p, state)
    )
    assert bool(jnp.isnan(fn(drifted))), "stale sharded state not detected"
    forces = jax.jit(jax.grad(fn))(drifted)
    assert bool(jnp.all(jnp.isnan(forces))), "stale-state forces not poisoned"


def test_sharded_md_state_validation(md_system):
    from torchpme_tpu.parallel import compute_sharded_md_state

    charges, cell, positions = md_system
    calc = _md_calc("pme")
    with pytest.raises(ValueError, match="divisible"):
        compute_sharded_md_state(calc, positions, cell, MD_CUTOFF, (100, 16, 16), 8)
    with pytest.raises(ValueError, match="multiple of 16"):
        compute_sharded_md_state(calc, positions, cell, MD_CUTOFF, (64, 16, 16), 8)
    with pytest.raises(ValueError, match="cell planes"):
        # cutoff too large for 8 x-slabs of cells
        compute_sharded_md_state(calc, positions, cell, 2.5, MD_NS, 8)
    state = compute_sharded_md_state(calc, positions, cell, MD_CUTOFF, MD_NS, 8)
    # every atom appears exactly once in the cell slabs and once in the tiles
    idx = np.asarray(state.cl_atom_index)[np.asarray(state.cl_slot_mask)]
    np.testing.assert_array_equal(
        np.bincount(idx, minlength=len(positions)), 1
    )
    slots = np.asarray(state.tm_atom_of_slot).ravel()
    np.testing.assert_array_equal(
        np.bincount(slots[slots < len(positions)], minlength=len(positions)), 1
    )


@pytest.mark.parametrize("triclinic", [False, True])
def test_sharded_md_rows_matches_fast_path(device_mesh, md_system, triclinic):
    """The rows entry (device-sharded bucket-row positions) must equal both
    the atom-order sharded step and the single-chip cell-list fast path —
    energy AND gradients, with forces returned in the sharded row layout."""
    from torchpme_tpu.ops.rspace_cells import compute_cell_list
    from torchpme_tpu.parallel import (
        compute_sharded_md_state,
        sharded_md_energy,
        sharded_md_energy_rows,
    )

    charges, cell, positions = md_system
    if triclinic:
        cell = cell.at[1, 0].add(0.8).at[2, 1].add(-0.5)
    calc = _md_calc("pme")
    clist = compute_cell_list(positions, cell, MD_CUTOFF)
    state = compute_sharded_md_state(
        calc, positions, cell, MD_CUTOFF, MD_NS, 8, rows=True
    )
    rows = state.bucket(positions)
    np.testing.assert_allclose(
        np.asarray(state.unbucket(rows)), np.asarray(positions)
    )

    def f_ref(q, c, p):
        return calc.energy(q, c, p, cell_list=clist, ns_mesh=MD_NS)

    def f_rows(q, c, r):
        return sharded_md_energy_rows(calc, device_mesh, q, c, r, state)

    e_ref = f_ref(charges, cell, positions)
    e_sh = jax.jit(
        lambda q, c, p: sharded_md_energy(calc, device_mesh, q, c, p, state)
    )(charges, cell, positions)
    e_rows = jax.jit(f_rows)(charges, cell, rows)
    np.testing.assert_allclose(float(e_rows), float(e_ref), rtol=1e-11)
    np.testing.assert_allclose(float(e_rows), float(e_sh), rtol=1e-12)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(charges, cell, positions)
    g_rows = jax.jit(jax.grad(f_rows, argnums=(0, 1, 2)))(charges, cell, rows)
    for name, a, b in zip(
        ("charges", "cell"), g_ref[:2], g_rows[:2]
    ):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-11 * scale,
            err_msg=f"gradient w.r.t. {name} diverged",
        )
    # forces arrive in row layout; unbucket to compare, padded rows silent
    f_atom = state.unbucket(g_rows[2])
    scale = float(jnp.max(jnp.abs(g_ref[2])))
    np.testing.assert_allclose(
        np.asarray(f_atom), np.asarray(g_ref[2]), atol=5e-11 * scale
    )
    occupied = jnp.zeros(state.n_rows, bool).at[state.row_of_atom].set(True)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(g_rows[2], axis=-1)[~occupied]), 0.0
    )


def test_sharded_md_rows_no_global_force_reduction(device_mesh, md_system):
    """The rows force pass must not all-reduce anything of O(n_rows): the
    force cotangent stays sharded (that is the point of the rows layout)."""
    from torchpme_tpu.parallel import (
        compute_sharded_md_state,
        sharded_md_energy_rows,
    )

    charges, cell, positions = md_system
    calc = _md_calc("pme")
    state = compute_sharded_md_state(
        calc, positions, cell, MD_CUTOFF, MD_NS, 8, rows=True
    )
    rows = state.bucket(positions)
    fn = jax.jit(
        jax.grad(
            lambda r: sharded_md_energy_rows(
                calc, device_mesh, charges, cell, r, state
            )
        )
    )
    hlo = fn.lower(rows).compile().as_text()

    import re

    for shape in re.findall(r"all-reduce(?:-start)?\(?\)? ?= ?\(?([^)\n]*)", hlo):
        for dims in re.findall(r"\w+\[([\d,]+)\]", shape):
            elems = int(np.prod([int(d) for d in dims.split(",")]))
            assert elems < state.n_rows, (
                f"all-reduce of {elems} elements rivals the {state.n_rows}-row "
                "layout — a global force reduction crept into the rows path"
            )


def test_sharded_md_rows_stale_poison_and_validation(device_mesh, md_system):
    from torchpme_tpu.parallel import (
        compute_sharded_md_state,
        sharded_md_energy_rows,
    )

    charges, cell, positions = md_system
    calc = _md_calc("pme")
    state = compute_sharded_md_state(
        calc, positions, cell, MD_CUTOFF, MD_NS, 8, rows=True
    )
    rows = state.bucket(positions)
    fn = jax.jit(
        lambda r: sharded_md_energy_rows(
            calc, device_mesh, charges, cell, r, state
        )
    )
    drifted = rows.at[int(state.row_of_atom[0]), 0].add(float(cell[0, 0]) / 2)
    assert bool(jnp.isnan(fn(drifted)))
    assert bool(jnp.all(jnp.isnan(jax.jit(jax.grad(fn))(drifted))))

    plain = compute_sharded_md_state(
        calc, positions, cell, MD_CUTOFF, MD_NS, 8
    )
    with pytest.raises(ValueError, match="rows=True"):
        sharded_md_energy_rows(calc, device_mesh, charges, cell, rows, plain)
    with pytest.raises(ValueError, match="rows=True"):
        plain.bucket(positions)
    with pytest.raises(ValueError, match="slab rows"):
        sharded_md_energy_rows(
            calc, device_mesh, charges, cell, rows[:-8], state
        )


@pytest.fixture(scope="module")
def md_system_aligned():
    """f32 system whose box admits the tile-aligned (16, 2) x/y cell grid at
    the test cutoff (tile edge = 16/16 = 1.0 = cutoff)."""
    rng = np.random.default_rng(7)
    n, box = 500, 16.0
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    charges = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    charges = charges - charges.mean()
    cell = jnp.eye(3, dtype=jnp.float32) * box
    return charges, cell, positions


def test_sharded_md_rows_aligned_matches_fast_path(
    device_mesh, md_system_aligned
):
    """The tile-ALIGNED rows step (bucket rows double as mesh-tile slots, no
    mesh-side gather) must match the single-chip aligned fast path and the
    f64 reference — energy and forces, forces in the sharded row layout."""
    from torchpme_tpu.md import MDFastPath
    from torchpme_tpu.ops.rspace_cells import compute_cell_list
    from torchpme_tpu.parallel import (
        compute_sharded_md_state,
        sharded_md_energy_rows,
    )

    charges, cell, positions = md_system_aligned
    calc = _md_calc("pme")
    state = compute_sharded_md_state(
        calc, positions, cell, MD_CUTOFF, (128, 16, 16), 8, aligned=True
    )
    assert state.aligned and state.tm_slot_rows is None
    rows = state.bucket(positions)

    def f_sh(q, c, r):
        return sharded_md_energy_rows(calc, device_mesh, q, c, r, state)

    e_sh = jax.jit(f_sh)(charges, cell, rows)

    # single-chip aligned fast path (same f32 kernels, single fold)
    fp = MDFastPath.create(
        calc, positions, cell, MD_CUTOFF, ns_mesh=(128, 16, 16),
        mesh_impl="aligned",
    )
    e_one = jax.jit(fp.energy)(charges, cell, fp.bucket(positions))
    np.testing.assert_allclose(float(e_sh), float(e_one), rtol=2e-5)

    # f64 ground truth
    pos64 = positions.astype(jnp.float64)
    cell64 = cell.astype(jnp.float64)
    q64 = charges.astype(jnp.float64)
    clist = compute_cell_list(pos64, cell64, MD_CUTOFF)
    e_ref = calc.energy(q64, cell64, pos64, cell_list=clist, ns_mesh=(128, 16, 16))
    np.testing.assert_allclose(float(e_sh), float(e_ref), rtol=2e-5)

    g_rows = jax.jit(jax.grad(f_sh, argnums=2))(charges, cell, rows)
    g_ref = jax.grad(
        lambda p: calc.energy(q64, cell64, p, cell_list=clist, ns_mesh=(128, 16, 16))
    )(pos64)
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(
        np.asarray(state.unbucket(g_rows), np.float64),
        np.asarray(g_ref),
        atol=1e-5 * scale,
    )
    occupied = jnp.zeros(state.n_rows, bool).at[state.row_of_atom].set(True)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(g_rows, axis=-1)[~occupied]), 0.0
    )


def test_sharded_md_rows_aligned_collectives_and_no_mesh_gather(
    device_mesh, md_system_aligned
):
    """Aligned rows step: sub-mesh collectives only, and the force pass must
    contain no O(n_rows) all-reduce (forces stay sharded) and no mesh-slot
    gather at all (rows ARE the tile slots)."""
    from torchpme_tpu.parallel import (
        compute_sharded_md_state,
        sharded_md_energy_rows,
    )

    charges, cell, positions = md_system_aligned
    calc = _md_calc("pme")
    state = compute_sharded_md_state(
        calc, positions, cell, MD_CUTOFF, (128, 16, 16), 8, aligned=True
    )
    rows = state.bucket(positions)
    fn = jax.jit(
        jax.grad(
            lambda r: sharded_md_energy_rows(
                calc, device_mesh, charges, cell, r, state
            )
        )
    )
    hlo = fn.lower(rows).compile().as_text()
    assert "all-to-all" in hlo, "distributed DFT transpose missing"
    assert "collective-permute" in hlo, "halo/skirt ring exchange missing"

    import re

    for shape in re.findall(r"all-reduce(?:-start)?\(?\)? ?= ?\(?([^)\n]*)", hlo):
        for dims in re.findall(r"\w+\[([\d,]+)\]", shape):
            elems = int(np.prod([int(d) for d in dims.split(",")]))
            assert elems < state.n_rows, (
                f"all-reduce of {elems} elements rivals the {state.n_rows}-row "
                "layout — a global force reduction crept into the aligned path"
            )


def test_sharded_md_rows_aligned_stale_and_validation(
    device_mesh, md_system_aligned
):
    from torchpme_tpu.parallel import (
        compute_sharded_md_state,
        sharded_md_energy_rows,
    )

    charges, cell, positions = md_system_aligned
    calc = _md_calc("pme")
    state = compute_sharded_md_state(
        calc, positions, cell, MD_CUTOFF, (128, 16, 16), 8, aligned=True
    )
    rows = state.bucket(positions)
    fn = jax.jit(
        lambda r: sharded_md_energy_rows(
            calc, device_mesh, charges, cell, r, state
        )
    )
    drifted = rows.at[int(state.row_of_atom[0]), 0].add(float(cell[0, 0]) / 2)
    assert bool(jnp.isnan(fn(drifted)))
    assert bool(jnp.all(jnp.isnan(jax.jit(jax.grad(fn))(drifted))))

    # geometry that cannot align: tile edge below the cutoff
    with pytest.raises(ValueError, match="tile"):
        compute_sharded_md_state(
            calc, positions, cell, 2.0, (256, 16, 16), 8, aligned=True
        )
    # f64 rows must be rejected (the fused kernels are f32-only)
    with pytest.raises(ValueError, match="float32"):
        sharded_md_energy_rows(
            calc, device_mesh, charges.astype(jnp.float64),
            cell.astype(jnp.float64), rows.astype(jnp.float64), state,
        )


# ---------------------------------------------------------------------------
# slab-sharded dipolar MD fast path (dipolar window + Ewald quadratic form)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def md_system_dipole():
    rng = np.random.default_rng(5)
    n, box = 220, 10.0
    positions = jnp.asarray(rng.uniform(0, box, (n, 3)))
    dipoles = jnp.asarray(rng.normal(size=(n, 3)))
    cell = jnp.eye(3) * box
    return dipoles, cell, positions


@pytest.mark.parametrize("mode", ["ewald", "direct"])
@pytest.mark.parametrize("triclinic", [False, True])
def test_sharded_md_dipole_rows_matches_fast_path(
    device_mesh, md_system_dipole, mode, triclinic
):
    """The sharded dipolar rows step must equal the single-chip dipolar
    cell-list fast path — energy AND gradients (fields, forces in the
    sharded row layout, stress seed) — to machine precision."""
    from torchpme_tpu.ops.rspace_cells import compute_cell_list
    from torchpme_tpu.parallel import (
        compute_sharded_md_dipole_state,
        sharded_md_dipole_energy_rows,
    )

    dipoles, cell, positions = md_system_dipole
    if triclinic:
        cell = cell.at[1, 0].add(0.8).at[2, 1].add(-0.5)
    if mode == "ewald":
        calc = tpme.CalculatorDipole(
            tpme.PotentialDipole(smearing=0.45), lr_wavelength=1.2
        )
    else:
        calc = tpme.CalculatorDipole(tpme.PotentialDipole())
    state = compute_sharded_md_dipole_state(
        calc, positions, cell, MD_CUTOFF, 8
    )
    rows = state.bucket(positions)
    np.testing.assert_allclose(
        np.asarray(state.unbucket(rows)), np.asarray(positions)
    )

    def f_sh(mu, c, r):
        return sharded_md_dipole_energy_rows(calc, device_mesh, mu, c, r, state)

    clist = compute_cell_list(
        positions, cell, MD_CUTOFF,
        capacity=state.cl_slot_mask.shape[-1], spill=False,
    )

    def f_ref(mu, c, p):
        return calc.energy(
            mu, c, p, cell_list=clist, ns_kvectors=state.ns_kvectors
        )

    e_sh = jax.jit(f_sh)(dipoles, cell, rows)
    e_ref = f_ref(dipoles, cell, positions)
    np.testing.assert_allclose(float(e_sh), float(e_ref), rtol=1e-12)

    g_sh = jax.jit(jax.grad(f_sh, argnums=(0, 1, 2)))(dipoles, cell, rows)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(dipoles, cell, positions)
    for name, a, b in zip(("dipoles", "cell"), g_ref[:2], g_sh[:2]):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-12 * scale,
            err_msg=f"gradient w.r.t. {name} diverged",
        )
    f_atom = state.unbucket(g_sh[2])
    scale = float(jnp.max(jnp.abs(g_ref[2])))
    np.testing.assert_allclose(
        np.asarray(f_atom), np.asarray(g_ref[2]), atol=5e-12 * scale
    )
    occupied = jnp.zeros(state.n_rows, bool).at[state.row_of_atom].set(True)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(g_sh[2], axis=-1)[~occupied]), 0.0
    )


def test_sharded_md_dipole_collectives_and_stale(device_mesh, md_system_dipole):
    """Dipolar rows step: the k-space collective carries O(n_k), never
    O(atoms) or O(rows); stale bucketings NaN-poison energy and forces."""
    from torchpme_tpu.parallel import (
        compute_sharded_md_dipole_state,
        sharded_md_dipole_energy_rows,
    )

    dipoles, cell, positions = md_system_dipole
    calc = tpme.CalculatorDipole(
        tpme.PotentialDipole(smearing=0.45), lr_wavelength=1.2
    )
    state = compute_sharded_md_dipole_state(
        calc, positions, cell, MD_CUTOFF, 8
    )
    rows = state.bucket(positions)
    fn = jax.jit(
        jax.grad(
            lambda r: sharded_md_dipole_energy_rows(
                calc, device_mesh, dipoles, cell, r, state
            )
        )
    )
    hlo = fn.lower(rows).compile().as_text()
    n_k = int(np.prod(state.ns_kvectors))

    import re

    for shape in re.findall(r"all-reduce(?:-start)?\(?\)? ?= ?\(?([^)\n]*)", hlo):
        for dims in re.findall(r"\w+\[([\d,]+)\]", shape):
            elems = int(np.prod([int(d) for d in dims.split(",")]))
            assert elems <= 4 * n_k, (
                f"all-reduce of {elems} elements exceeds the O(n_k={n_k}) "
                "spectrum psum — an O(atoms) reduction crept in"
            )

    e_fn = jax.jit(
        lambda r: sharded_md_dipole_energy_rows(
            calc, device_mesh, dipoles, cell, r, state
        )
    )
    drifted = rows.at[int(state.row_of_atom[0]), 0].add(float(cell[0, 0]) / 2)
    assert bool(jnp.isnan(e_fn(drifted)))
    assert bool(jnp.all(jnp.isnan(fn(drifted))))

    with pytest.raises(ValueError, match="slab rows"):
        sharded_md_dipole_energy_rows(
            calc, device_mesh, dipoles, cell, rows[:-8], state
        )
    with pytest.raises(ValueError, match="atoms"):
        sharded_md_dipole_energy_rows(
            calc, device_mesh, dipoles[:-1], cell, rows, state
        )


def test_sharded_md_dipole_trainable_potential(device_mesh, md_system_dipole):
    """A traced (trainable) dipolar potential must take the plain-autodiff
    split path and produce correct smearing gradients through the halo."""
    from torchpme_tpu.ops.rspace_cells import compute_cell_list
    from torchpme_tpu.parallel import (
        compute_sharded_md_dipole_state,
        sharded_md_dipole_energy_rows,
    )
    from dataclasses import replace

    dipoles, cell, positions = md_system_dipole
    calc = tpme.CalculatorDipole(
        tpme.PotentialDipole(smearing=0.45), lr_wavelength=1.2
    )
    state = compute_sharded_md_dipole_state(
        calc, positions, cell, MD_CUTOFF, 8
    )
    rows = state.bucket(positions)
    clist = compute_cell_list(
        positions, cell, MD_CUTOFF,
        capacity=state.cl_slot_mask.shape[-1], spill=False,
    )

    def f_sh(s):
        c = replace(calc, potential=replace(calc.potential, smearing=s))
        return sharded_md_dipole_energy_rows(
            c, device_mesh, dipoles, cell, rows, state
        )

    def f_ref(s):
        c = replace(calc, potential=replace(calc.potential, smearing=s))
        return c.energy(
            dipoles, cell, positions, cell_list=clist,
            ns_kvectors=state.ns_kvectors,
        )

    s0 = jnp.asarray(0.45)
    g_sh = jax.jit(jax.grad(f_sh))(s0)
    g_ref = jax.grad(f_ref)(s0)
    np.testing.assert_allclose(float(g_sh), float(g_ref), rtol=1e-10)


@pytest.mark.parametrize("triclinic", [False, True])
def test_sharded_md_dipole_pme_matches_fast_path(
    device_mesh, md_system_dipole, triclinic
):
    """PME-mode sharded dipolar rows step (slab gradient spread +
    distributed-DFT quadratic form) equals the single-chip dipolar PME
    cell-list path — energy AND gradients (fields, row forces, stress
    seed)."""
    from torchpme_tpu.ops.rspace_cells import compute_cell_list
    from torchpme_tpu.parallel import (
        compute_sharded_md_dipole_state,
        sharded_md_dipole_energy_rows,
    )

    dipoles, cell, positions = md_system_dipole
    if triclinic:
        cell = cell.at[1, 0].add(0.8).at[2, 1].add(-0.5)
    calc = tpme.PMECalculatorDipole(
        tpme.PotentialDipole(smearing=0.5), interpolation_nodes=5
    )
    state = compute_sharded_md_dipole_state(
        calc, positions, cell, MD_CUTOFF, 8, ns_mesh=MD_NS
    )
    assert state.tm_slot_rows is not None
    assert state.ns_kvectors == MD_NS
    rows = state.bucket(positions)

    def f_sh(mu, c, r):
        return sharded_md_dipole_energy_rows(calc, device_mesh, mu, c, r, state)

    clist = compute_cell_list(
        positions, cell, MD_CUTOFF,
        capacity=state.cl_slot_mask.shape[-1], spill=False,
    )

    def f_ref(mu, c, p):
        return calc.energy(
            mu, c, p, cell_list=clist, ns_kvectors=state.ns_kvectors
        )

    e_sh = jax.jit(f_sh)(dipoles, cell, rows)
    e_ref = f_ref(dipoles, cell, positions)
    np.testing.assert_allclose(float(e_sh), float(e_ref), rtol=1e-10)

    g_sh = jax.jit(jax.grad(f_sh, argnums=(0, 1, 2)))(dipoles, cell, rows)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(dipoles, cell, positions)
    for name, a, b in zip(("dipoles", "cell"), g_ref[:2], g_sh[:2]):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-9 * scale,
            err_msg=f"gradient w.r.t. {name} diverged",
        )
    f_atom = state.unbucket(g_sh[2])
    scale = float(jnp.max(jnp.abs(g_ref[2])))
    np.testing.assert_allclose(
        np.asarray(f_atom), np.asarray(g_ref[2]), atol=1e-9 * scale
    )

    # staleness NaN-poisons through the mesh branch too
    drifted = rows.at[int(state.row_of_atom[0]), 0].add(float(cell[0, 0]) / 2)
    assert bool(jnp.isnan(jax.jit(f_sh)(dipoles, cell, drifted)))


def test_sharded_md_dipole_pme_mesh_validation(md_system_dipole):
    """Mesh divisibility rules mirror the scalar sharded state."""
    from torchpme_tpu.parallel import compute_sharded_md_dipole_state

    dipoles, cell, positions = md_system_dipole
    calc = tpme.PMECalculatorDipole(tpme.PotentialDipole(smearing=0.5))
    with pytest.raises(ValueError, match="divisible"):
        compute_sharded_md_dipole_state(
            calc, positions, cell, MD_CUTOFF, 8, ns_mesh=(124, 16, 16)
        )
    with pytest.raises(ValueError, match="multiple of 16"):
        compute_sharded_md_dipole_state(
            calc, positions, cell, MD_CUTOFF, 8, ns_mesh=(64, 16, 16)
        )
    with pytest.raises(ValueError, match="ny"):
        compute_sharded_md_dipole_state(
            calc, positions, cell, MD_CUTOFF, 8, ns_mesh=(128, 8, 16)
        )


def test_dryrun_multichip_entrypoint():
    """The driver contract: one sharded training step on 8 devices."""
    sys.path.insert(0, str(Path(__file__).parents[1]))
    try:
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
    finally:
        sys.path.remove(str(Path(__file__).parents[1]))
