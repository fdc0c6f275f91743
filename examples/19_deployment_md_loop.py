"""Ship a calculator to an MD engine: export once, run anywhere.

The reference's example 09 exports a metatomic model that an MD engine loads
without the training stack (``/root/reference/examples/09-atomistic-model.py``);
its workflow test round-trips a TorchScript calculator through
``torch.jit.save``/``load``.  The TPU-native analog is :mod:`torchpme_tpu.deploy`:
the PME energy+force step is lowered to StableHLO bytes which a **fresh
process that never imports torchpme_tpu** (here: a subprocess with the
library blocked from ``sys.modules`` via a meta-path hook) deserializes with
plain ``jax`` and drives an MD loop.

Run:  python examples/19_deployment_md_loop.py
"""

import subprocess
import sys
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import torchpme_tpu as tpme
from torchpme_tpu.deploy import export_step

jax.config.update("jax_enable_x64", True)

# -- build + export the MD step (the "training side" of the hand-off) -------
rng = np.random.default_rng(0)
n_atoms = 64
box = 8.7  # ~0.1 atoms/A^3
positions = jnp.asarray(rng.uniform(0, box, (n_atoms, 3)))
charges = jnp.asarray(np.tile([1.0, -1.0], n_atoms // 2).reshape(-1, 1))
cell = jnp.eye(3) * box
cutoff = 4.0

calc = tpme.PMECalculator(tpme.CoulombPotential(smearing=1.0), mesh_spacing=0.9)
ns = calc.get_ns_mesh(cell)
fp = tpme.MDFastPath.create(calc, positions, cell, cutoff, ns)
rows = fp.bucket(positions)


def energy(rows):
    return fp.energy(charges, cell, rows)


# energy AND its gradient (the forces are -grad) in one artifact
blob = export_step(energy, rows, with_grad=0)
workdir = Path(tempfile.mkdtemp())
(workdir / "pme_step.bin").write_bytes(blob)
np.save(workdir / "rows0.npy", np.asarray(rows))
print(f"exported PME energy+force step: {len(blob) / 1e6:.2f} MB of StableHLO")

# -- the "MD engine side": a fresh interpreter, torchpme_tpu banned ---------
engine = r"""
import sys, importlib.abc

class _Ban(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] == "torchpme_tpu":
            raise ImportError("torchpme_tpu must not be needed at deployment")
        return None

sys.meta_path.insert(0, _Ban())

import jax, numpy as np
from pathlib import Path

jax.config.update("jax_enable_x64", True)
workdir = Path(sys.argv[1])
# the exported computation must run under jit (torchpme_tpu.deploy.load_step
# does the same wrap; unjitted .call is an eager trace per step)
step = jax.jit(jax.export.deserialize((workdir / "pme_step.bin").read_bytes()).call)
rows = np.load(workdir / "rows0.npy")

dt = 1e-3
velocity = np.zeros_like(rows)
for i in range(100):
    e, g = step(rows)
    velocity -= dt * np.asarray(g)
    rows = rows + dt * velocity
print(f"engine: 100 MD steps done, E_0->E_100 drift {float(e):+.6f}")
np.save(workdir / "rows_final.npy", np.asarray(rows))
"""
result = subprocess.run(
    [sys.executable, "-c", engine, str(workdir)],
    capture_output=True,
    text=True,
    check=True,
)
print(result.stdout.strip())

# -- cross-check: the engine's trajectory matches the library's -------------
rows_lib = rows
velocity = jnp.zeros_like(rows_lib)
vg = jax.jit(jax.value_and_grad(energy))
for i in range(100):
    e, g = vg(rows_lib)
    velocity -= 1e-3 * g
    rows_lib = rows_lib + 1e-3 * velocity
rows_engine = np.load(workdir / "rows_final.npy")
err = float(np.max(np.abs(rows_engine - np.asarray(rows_lib))))
print(f"engine vs library trajectory after 100 steps: max |dx| = {err:.2e}")
assert err < 1e-10, err
