"""1-device `shard_map` smoke of the sharded MD fast path ON REAL TPU.

Off-TPU, `shard_map`-traced fused-spread calls route to a pure-jnp twin
(the Pallas HLO interpreter can't run kernel jaxprs under the vma type
system), so CPU tests never execute the Mosaic lowering with vma-declared
outputs.  Multi-chip hardware doesn't exist in this environment; a
`Mesh([tpu_device], ('atoms',))` run is the maximum hardware validation
available — it exercises the REAL kernel lowering inside shard_map, the
halo ppermute (self-edges), and the distributed-DFT layout, and diffs
energy+forces against the unsharded `MDFastPath` step.

    python tools/smoke_sharded_tpu.py             # default env (TPU)
    BENCH_N=33000 python tools/smoke_sharded_tpu.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

N_ATOMS = int(os.environ.get("BENCH_N", 102_000))
CUTOFF = 5.0


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import torchpme_tpu as tpme
    from bench import build_system, choose_parameters
    from torchpme_tpu.parallel.sharded_md import (
        compute_sharded_md_state,
        sharded_md_energy_rows,
    )

    dev = jax.devices()[0]
    print(f"device={dev} N={N_ATOMS}", flush=True)
    positions, charges, cell, *_, box = build_system(N_ATOMS, neighbors=False)
    smearing, nodes, spacing, err = choose_parameters(charges, cell, positions)

    dtype = jnp.float32
    q = jnp.asarray(charges, dtype)
    cell_j = jnp.asarray(cell, dtype)
    pos = jnp.asarray(positions, dtype)
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=smearing),
        mesh_spacing=spacing,
        interpolation_nodes=nodes,
    )
    ns = calc.get_ns_mesh(cell_j)

    mesh = Mesh(np.asarray([dev]), ("atoms",))
    # only the ALIGNED branch runs Pallas kernels inside shard_map (the
    # tile-table rows branch is pure XLA — no lowering gap to close); the
    # bench geometry also violates the non-aligned rows-mode stencil
    # confinement at 1 device, so the smoke is aligned-only.
    for aligned in (True,):
        state = compute_sharded_md_state(
            calc, pos, cell_j, CUTOFF, ns, n_devices=1,
            rows=True, aligned=aligned,
        )
        rows = state.bucket(pos)
        rows = jax.device_put(rows, NamedSharding(mesh, P("atoms")))

        def energy(r, state=state):
            return sharded_md_energy_rows(calc, mesh, q, cell_j, r, state)

        t0 = time.monotonic()
        e, g = jax.jit(jax.value_and_grad(energy))(rows)
        e = float(e)
        g = np.asarray(jax.block_until_ready(g))
        print(
            f"aligned={aligned}: sharded step ran on hardware in "
            f"{time.monotonic() - t0:.1f}s (compile incl.), E={e:.4f}",
            flush=True,
        )

        # reference: the unsharded fast path on the same bucketing params
        fp = tpme.MDFastPath.create(
            calc, pos, cell_j, CUTOFF, ns,
            mesh_impl="aligned" if aligned else "tiled",
        )
        rows_fp = fp.bucket(pos)
        e_ref, g_ref = jax.jit(jax.value_and_grad(lambda r: fp.energy(q, cell_j, r)))(
            rows_fp
        )
        e_ref = float(e_ref)
        # row layouts differ (slab rows vs cell rows): compare per-atom forces
        f_sharded = np.asarray(state.unbucket(g))
        f_ref = np.asarray(fp.unbucket(np.asarray(g_ref)))
        de = abs(e - e_ref) / abs(e_ref)
        scale = np.abs(f_ref).max()
        df = np.abs(f_sharded - f_ref).max() / scale
        print(
            f"aligned={aligned}: vs unsharded  dE_rel={de:.2e}  "
            f"dF_rel_max={df:.2e}",
            flush=True,
        )
        assert de < 5e-6, de
        assert df < 5e-5, df
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
