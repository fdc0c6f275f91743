"""Cross-precision validation: f32 TPU fast path vs f64 ground truth.

Stage 1 (CPU, float64): well-converged Ewald energies/forces for a
water-density box → saves ground_truth.npz.
Stage 2 (TPU, float32): PME with bench parameters (dense neighbors + tiled
mesh backend) → compares energy and forces against stage 1.

Run: python tools/validate_accuracy.py stage1   (with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu)
     python tools/validate_accuracy.py stage2   (default TPU env)
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

N = 1536
CUTOFF = 5.0
SMEARING = 1.2836
NODES = 5
OUT = Path(__file__).parent / "ground_truth.npz"


def build():
    from torchpme_tpu.utils.neighbors import neighbor_list

    rng = np.random.default_rng(0)
    box = float((N / 0.1) ** (1 / 3))
    positions = rng.uniform(0.0, box, (N, 3))
    base = np.tile([-0.84, 0.42, 0.42], N // 3 + 1)[:N]
    base -= base.mean()
    charges = base.reshape(-1, 1)
    cell = np.eye(3) * box
    idx, dist, shifts = neighbor_list(positions, cell, cutoff=CUTOFF)
    return positions, charges, cell, idx, dist, shifts, box


def stage1():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import torchpme_tpu as tpme
    from torchpme_tpu.utils.neighbors import compute_distances

    positions, charges, cell, idx, dist, shifts, box = build()
    pos = jnp.asarray(positions)
    q = jnp.asarray(charges)
    c = jnp.asarray(cell)
    idxj, shiftsj = jnp.asarray(idx), jnp.asarray(shifts)

    calc = tpme.EwaldCalculator(
        tpme.CoulombPotential(smearing=SMEARING), lr_wavelength=SMEARING / 2
    )
    ns_k = calc.get_ns_kvectors(c)

    def energy(pos):
        d = compute_distances(pos, idxj, cell=c, neighbor_shifts=shiftsj)
        return jnp.sum(calc(q, c, pos, idxj, d, ns_kvectors=ns_k) * q)

    e, grad = jax.value_and_grad(energy)(pos)
    np.savez(
        OUT, energy=np.asarray(e), forces=-np.asarray(grad),
    )
    print(f"stage1 (f64 Ewald, ns_k={ns_k}): E = {float(e):.10f} -> {OUT}")


def stage2():
    import jax
    import jax.numpy as jnp

    import torchpme_tpu as tpme
    from torchpme_tpu.ops.rspace_cells import compute_cell_list

    gt = np.load(OUT)
    positions, charges, cell, idx, dist, shifts, box = build()

    pos = jnp.asarray(positions, jnp.float32)
    q = jnp.asarray(charges, jnp.float32)
    c = jnp.asarray(cell, jnp.float32)
    clist = compute_cell_list(positions, cell, CUTOFF)

    # the bench fast path: cell-list real space + tiled mesh backend
    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=jnp.float32(SMEARING)),
        mesh_spacing=1.2,
        interpolation_nodes=NODES,
        mesh_backend="tiled",
    )
    ns = calc.get_ns_mesh(c)

    def energy(pos):
        pot = calc(q, c, pos, cell_list=clist, ns_mesh=ns)
        return jnp.sum(pot * q)

    e, grad = jax.jit(jax.value_and_grad(energy))(pos)
    forces = -np.asarray(grad, dtype=np.float64)
    e = float(e)

    e_ref = float(gt["energy"])
    f_ref = gt["forces"]
    rms_f = float(np.sqrt(np.mean(f_ref**2)))
    err = forces - f_ref
    rel_energy = abs(e - e_ref) / abs(e_ref)
    rel_force_rms = float(np.sqrt(np.mean(err**2))) / rms_f
    rel_force_max = float(np.abs(err).max()) / rms_f
    print(f"stage2 (f32 TPU PME tiled, ns={ns}):")
    print(f"  energy: {e:.6f} vs {e_ref:.6f}  rel err {rel_energy:.3e}")
    print(f"  forces: rel RMS err {rel_force_rms:.3e}  rel max err {rel_force_max:.3e}")
    status = "PASS" if rel_force_rms < 1e-4 and rel_energy < 1e-4 else "FAIL"
    print(f"  1e-4 target: {status}")

    # the SHIPPING path: MDFastPath with the fused Pallas spread and the
    # analytic-VJP window.  The aligned variant does not fit this small
    # box's tile geometry; its equivalence to these (same kernels, zero-
    # gather layout) is covered by tests/test_md.py::
    # test_md_fastpath_aligned_matches_tiled and the 102k-atom hardware
    # smoke (tools/smoke_sharded_tpu.py: 1.4e-7 vs unsharded aligned).
    for mesh_impl in ("tiled", "fused"):
        fp = tpme.MDFastPath.create(calc, pos, c, CUTOFF, ns, mesh_impl=mesh_impl)
        rows = fp.bucket(pos)
        e_fp, g_rows = jax.jit(
            jax.value_and_grad(lambda r: fp.energy(q, c, r))
        )(rows)
        f_fp = -np.asarray(fp.unbucket(g_rows), dtype=np.float64)
        err = f_fp - f_ref
        rel_e = abs(float(e_fp) - e_ref) / abs(e_ref)
        rel_rms = float(np.sqrt(np.mean(err**2))) / rms_f
        status = "PASS" if rel_rms < 1e-4 and rel_e < 1e-4 else "FAIL"
        print(
            f"stage2 fast path (mesh_impl={mesh_impl}, window={fp.window_impl}): "
            f"energy rel {rel_e:.3e}, force rel RMS {rel_rms:.3e} -> {status}"
        )


if __name__ == "__main__":
    {"stage1": stage1, "stage2": stage2}[sys.argv[1]]()
