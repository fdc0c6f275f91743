"""AOT export/deserialize round-trips (`torchpme_tpu.deploy`).

Deployment-parity for the reference's TorchScript save/load matrix
(`/root/reference/tests/calculators/test_workflow.py:154-162`): a calculator
step is exported to serialized StableHLO, deserialized (as a production
process that never imports torchpme_tpu would), and must reproduce values
and gradients exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torchpme_tpu as tpme
from torchpme_tpu.deploy import export_step, load_step
from torchpme_tpu.ops.rspace_cells import compute_cell_list
from torchpme_tpu.utils.neighbors import neighbor_list


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(7)
    n = 40
    positions = jnp.asarray(rng.uniform(0, 9.0, (n, 3)))
    charges = jnp.asarray(np.tile([1.0, -1.0], n // 2).reshape(-1, 1))
    cell = jnp.eye(3) * 9.0
    idx, dist, _ = neighbor_list(np.asarray(positions), np.asarray(cell), 3.0)
    return positions, charges, cell, jnp.asarray(idx), jnp.asarray(dist)


def test_export_potentials_roundtrip(system):
    positions, charges, cell, idx, dist = system
    calc = tpme.EwaldCalculator(
        tpme.CoulombPotential(smearing=1.0), lr_wavelength=2.0
    )
    ns_k = calc.get_ns_kvectors(cell)

    def potentials(q, c, p, d):
        return calc(q, c, p, idx, d, ns_kvectors=ns_k)

    blob = export_step(potentials, charges, cell, positions, dist)
    assert isinstance(blob, bytes) and len(blob) > 0
    restored = load_step(blob)
    np.testing.assert_allclose(
        np.asarray(restored(charges, cell, positions, dist)),
        np.asarray(potentials(charges, cell, positions, dist)),
        atol=1e-14,
    )


def test_export_energy_with_grad(system):
    """The deployed MD artifact: energy + forces from the cell-list path."""
    positions, charges, cell, _, _ = system
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.45
    )
    ns = calc.get_ns_mesh(cell)
    clist = compute_cell_list(positions, cell, 3.0)

    def energy(q, c, p):
        return calc.energy(q, c, p, cell_list=clist, ns_mesh=ns)

    blob = export_step(energy, charges, cell, positions, with_grad=2)
    restored = load_step(blob)
    e, g = restored(charges, cell, positions)
    e_ref, g_ref = jax.value_and_grad(energy, argnums=2)(
        charges, cell, positions
    )
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-12)


def test_export_shape_mismatch_raises(system):
    positions, charges, cell, idx, dist = system
    calc = tpme.EwaldCalculator(
        tpme.CoulombPotential(smearing=1.0), lr_wavelength=2.0
    )
    ns_k = calc.get_ns_kvectors(cell)

    def potentials(q, c, p, d):
        return calc(q, c, p, idx, d, ns_kvectors=ns_k)

    restored = load_step(export_step(potentials, charges, cell, positions, dist))
    with pytest.raises(Exception, match="[Ss]hape|rank|mismatch"):
        restored(charges[:-2], cell, positions[:-2], dist)


def test_export_cross_process(system, tmp_path):
    """The artifact must run in a process that CANNOT import torchpme_tpu.

    In-process round-trips share the exporting process's registered custom
    calls, which once masked a real deployment crash: ``jnp.linalg.inv``'s
    LU custom call segfaulted on deserialize in a fresh interpreter (hence
    :func:`torchpme_tpu.ops.math.inv3` everywhere in the compute path).
    """
    import subprocess
    import sys

    positions, charges, cell, _, _ = system
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.45
    )
    ns = calc.get_ns_mesh(cell)
    fp = tpme.MDFastPath.create(calc, positions, cell, 3.0, ns)
    rows = fp.bucket(positions)

    def energy(r):
        return fp.energy(charges, cell, r)

    blob = export_step(energy, rows, with_grad=0)
    (tmp_path / "step.bin").write_bytes(blob)
    np.save(tmp_path / "rows.npy", np.asarray(rows))
    e_ref, g_ref = jax.value_and_grad(energy)(rows)
    engine = (
        "import sys, importlib.abc\n"
        "class Ban(importlib.abc.MetaPathFinder):\n"
        "    def find_spec(self, fullname, path=None, target=None):\n"
        "        if fullname.split('.')[0] == 'torchpme_tpu':\n"
        "            raise ImportError('banned at deployment')\n"
        "        return None\n"
        "sys.meta_path.insert(0, Ban())\n"
        "import jax, numpy as np\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "step = jax.jit(jax.export.deserialize("
        "open(sys.argv[1] + '/step.bin', 'rb').read()).call)\n"
        "e, g = step(np.load(sys.argv[1] + '/rows.npy'))\n"
        "print(repr(float(e)))\n"
        "np.save(sys.argv[1] + '/g.npy', np.asarray(g))\n"
    )
    result = subprocess.run(
        [sys.executable, "-c", engine, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert float(result.stdout.strip()) == pytest.approx(float(e_ref), rel=1e-13)
    np.testing.assert_allclose(
        np.load(tmp_path / "g.npy"), np.asarray(g_ref), atol=1e-12
    )


def test_export_multi_platform(system):
    """Cross-platform lowering: a CPU host can build a cpu+tpu artifact."""
    positions, charges, cell, idx, dist = system
    calc = tpme.EwaldCalculator(
        tpme.CoulombPotential(smearing=1.0), lr_wavelength=2.0
    )
    ns_k = calc.get_ns_kvectors(cell)

    def potentials(q, c, p, d):
        return calc(q, c, p, idx, d, ns_kvectors=ns_k)

    blob = export_step(
        potentials, charges, cell, positions, dist, platforms=("cpu", "tpu")
    )
    out = load_step(blob)(charges, cell, positions, dist)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(potentials(charges, cell, positions, dist)),
        atol=1e-14,
    )
