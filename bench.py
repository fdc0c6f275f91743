"""Headline benchmark: PME energy+force ms/step on a ~100k-atom water box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- value: median ms per jitted energy+force step on the current default JAX
  device (the TPU chip under axon), at parameters meeting 1e-4 accuracy per
  the PME error bound (cutoff 5 Å, water number density).
- vs_baseline: speedup over the reference lab-cosmo/torch-pme running the
  identical system on local CPU (measured once, cached in
  BASELINE_local.json) — the reference publishes no numbers (BASELINE.md),
  so the locally measured reference is the baseline.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent
BASELINE_CACHE = REPO / "BASELINE_local.json"


def _enable_compile_cache():
    """Persist compiled executables across processes: the remote TPU
    compiler on this runtime intermittently wedges (>10 min) on large
    programs; a primed cache makes reruns immune."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax: flag names differ; cache is an optimization only


_enable_compile_cache()

N_ATOMS = int(os.environ.get("BENCH_N", 102_000))
CUTOFF = 5.0
ACCURACY = 1e-4
N_WARMUP = 2
N_REPEAT = 10


def build_system(n_atoms: int, seed: int = 0, neighbors: bool = True):
    """Random water-density box.  The O(N) neighbor list build costs minutes
    of host time at 100k+ atoms and is only needed by the torch-pme CPU
    baseline (our fast path builds its own cell list) — pass
    ``neighbors=False`` to skip it (``idx``/``dist``/``shifts`` come back
    ``None``)."""
    rng = np.random.default_rng(seed)
    box = float((n_atoms / 0.1) ** (1 / 3))  # water number density
    positions = rng.uniform(0.0, box, (n_atoms, 3))
    base = np.tile([-0.84, 0.42, 0.42], n_atoms // 3 + 1)[:n_atoms]
    base -= base.mean()
    charges = base.reshape(-1, 1)
    cell = np.eye(3) * box
    idx = dist = shifts = None
    if neighbors:
        from torchpme_tpu.utils.neighbors import neighbor_list

        idx, dist, shifts = neighbor_list(positions, cell, cutoff=CUTOFF)
    return positions, charges, cell, idx, dist, shifts, box


def choose_parameters(charges, cell, positions):
    """Smearing from the real-space bound at accuracy/4; coarsest mesh meeting
    the total bound (pure error-bound screen, no timing).

    The cutoff itself (5 Å) was selected with the library's
    ``tuning.tune_over_cutoffs`` sweep logic, run once on the TPU: at water
    density, 4 Å forces a 256³ mesh (38 ms/step at 102k atoms) and 5.5 Å
    overloads the real-space sum — 5 Å / 128³ is the optimum of the
    rspace↔kspace balance on this hardware."""
    import jax.numpy as jnp

    from torchpme_tpu.tuning import PMEErrorBounds

    n = positions.shape[0]
    volume = float(abs(np.linalg.det(cell)))
    prefac = 2 * float((charges**2).sum()) / math.sqrt(n)
    ratio = math.sqrt(
        -2 * math.log(ACCURACY / 2 / prefac * math.sqrt(CUTOFF * volume))
    )
    smearing = CUTOFF / ratio

    bounds = PMEErrorBounds(
        jnp.asarray(charges), jnp.asarray(cell), jnp.asarray(positions)
    )
    best = None
    min_dim = float(np.min(np.linalg.norm(cell, axis=1)))
    for nodes in (4, 5):
        for ns in range(3, 9):
            spacing = 2 * min_dim / (2**ns - 1)
            err = float(
                bounds(
                    smearing=smearing,
                    mesh_spacing=spacing,
                    cutoff=CUTOFF,
                    interpolation_nodes=nodes,
                )
            )
            if err <= ACCURACY:
                if best is None or spacing > best[2] or (
                    spacing == best[2] and nodes < best[1]
                ):
                    best = (err, nodes, spacing)
                break  # coarsest passing mesh for this node count
    if best is None:
        raise RuntimeError("no PME parameters meet the accuracy bound")
    return smearing, best[1], best[2], best[0]


def bench_ours(positions, charges, cell, idx, dist, shifts, smearing, nodes, spacing):
    """Jitted PME energy+force step on the TPU-native fast path:
    cell-list real space (gather-free 27-cell windows) + tile-GEMM mesh
    backend.

    The timed step is an honest MD step: pair distances are recomputed
    *differentiably* from the positions inside the step (reference pattern
    ``/root/reference/tests/helpers.py:278-304``), so the forces include the
    full real-space chain through positions, not just the k-space part."""
    import jax
    import jax.numpy as jnp

    import torchpme_tpu as tpme

    # device-alive heartbeat for the orchestrator's wedge watchdog: a wedged
    # tunnel hangs even this op, so absence of the file means "kill early"
    jnp.zeros(8).sum().block_until_ready()
    hb = os.environ.get("BENCH_HEARTBEAT")
    if hb:
        Path(hb).touch()

    dtype = jnp.float32
    charges_j = jnp.asarray(charges, dtype=dtype)
    cell_j = jnp.asarray(cell, dtype=dtype)
    positions_j = jnp.asarray(positions, dtype=dtype)

    calc = tpme.PMECalculator(
        tpme.CoulombPotential(smearing=smearing),
        mesh_spacing=spacing,
        interpolation_nodes=nodes,
    )
    ns_mesh = calc.get_ns_mesh(cell_j)

    # bucket-order MD state (GROMACS-style): positions live in cell-bucket
    # rows across steps, so the step pays no bucket gather and the force
    # comes back with no scatter; rebucket on drift like a neighbor list
    fp = tpme.MDFastPath.create(calc, positions_j, cell_j, CUTOFF, ns_mesh)
    rows0 = fp.bucket(positions_j)

    def energy(pos_rows):
        return fp.energy(charges_j, cell_j, pos_rows)

    # full forces w.r.t. positions: the real-space chain (gather + norm +
    # scatter of the dr̂ terms) AND the k-space chain, one MD force evaluation
    grad_step = jax.value_and_grad(energy)

    # Time CHAINED steps, the way an MD loop actually runs: each step feeds a
    # tiny force perturbation into the next step's inputs, all on device, and
    # the host syncs once at the end.  Per-call timing would mostly measure
    # host/tunnel round-trip latency (~25 ms on this runtime), not compute.
    # CHAIN=20 amortizes the per-sync tunnel round trip to <0.1 ms/step
    # (production MD runs thousands of steps between host syncs; the
    # remaining value is honest device time — the null-chain floor measured
    # by tools/profile_aligned.py confirms it).  Longer chains change the
    # number by <0.05 ms but the remote compile server rejects the
    # CHAIN=50 program ("response body closed"), so 20 is the reliable
    # setting on this runtime.
    CHAIN = int(os.environ.get("BENCH_CHAIN", 20))

    @jax.jit
    def chained(positions):
        def body(_, carry):
            p, acc = carry
            e, gp = grad_step(p)
            return (p - 1e-7 * gp, acc + e)

        return jax.lax.fori_loop(0, CHAIN, body, (positions, jnp.float32(0)))

    out = chained(rows0)
    _ = float(out[1])  # compile + sync
    times = []
    for _i in range(max(1, N_REPEAT // 3)):
        start = time.monotonic()
        out = chained(rows0)
        _ = float(out[1])  # host sync once per chain
        times.append((time.monotonic() - start) / CHAIN)
    e_single = float(energy(rows0))
    return float(np.median(times) * 1e3), ns_mesh, e_single


def bench_reference_cpu(
    positions, charges, cell, idx, dist, shifts, smearing, nodes, spacing
):
    """Measure lab-cosmo/torch-pme (pure-python torch) on local CPU, cached.

    Same honest MD step as ``bench_ours``: distances are recomputed
    differentiably from positions + cell shifts inside the timed loop
    (the reference's own force-correctness pattern,
    ``/root/reference/tests/helpers.py:278-304``)."""
    key = f"torchpme_cpu_pme_mdstep_n{N_ATOMS}"
    if BASELINE_CACHE.exists():
        cache = json.loads(BASELINE_CACHE.read_text())
        if key in cache:
            return cache[key]
    else:
        cache = {}

    sys.path.insert(0, "/root/reference/src")
    try:
        import types

        import torch

        # the reference imports a build-generated version module; shim it
        if "torchpme._version" not in sys.modules:
            vmod = types.ModuleType("torchpme._version")
            vmod.__version__ = "0.5.0"
            vmod.__version_tuple__ = (0, 5, 0)
            sys.modules["torchpme._version"] = vmod
        import torchpme

        torch.set_num_threads(os.cpu_count() or 8)
        dd = dict(dtype=torch.float32)
        charges_t = torch.tensor(charges, **dd)
        cell_t = torch.tensor(cell, **dd)
        positions_t = torch.tensor(positions, **dd, requires_grad=True)
        idx_t = torch.tensor(idx, dtype=torch.long)
        shifts_t = torch.tensor(shifts, **dd)
        calc = torchpme.PMECalculator(
            torchpme.CoulombPotential(smearing=smearing),
            mesh_spacing=spacing,
            interpolation_nodes=nodes,
        )
        calc.to(dtype=torch.float32)
        times = []
        for i in range(1 + 2):
            start = time.monotonic()
            vec = (
                positions_t[idx_t[:, 1]]
                - positions_t[idx_t[:, 0]]
                + shifts_t @ cell_t
            )
            dist_t = torch.linalg.norm(vec, dim=-1)
            pot = calc.forward(
                charges=charges_t,
                cell=cell_t,
                positions=positions_t,
                neighbor_indices=idx_t,
                neighbor_distances=dist_t,
            )
            energy = (pot * charges_t).sum()
            energy.backward()
            positions_t.grad = None
            if i >= 1:
                times.append(time.monotonic() - start)
        ms = float(np.median(times) * 1e3)
    except Exception as err:  # reference unavailable: no baseline
        print(f"# baseline measurement failed: {err!r}", file=sys.stderr)
        return None
    finally:
        sys.path.remove("/root/reference/src")

    cache[key] = ms
    BASELINE_CACHE.write_text(json.dumps(cache, indent=1))
    return ms


def main():
    # the neighbor list is only consumed by the torch-pme CPU baseline;
    # skip the minutes-long host build when the baseline is cached/skipped
    # (it also kept the device-alive heartbeat from appearing within the
    # watchdog's probe window, burning a whole bench attempt per run)
    need_nl = os.environ.get("BENCH_SKIP_BASELINE") != "1"
    if need_nl and BASELINE_CACHE.exists():
        cached = json.loads(BASELINE_CACHE.read_text())
        need_nl = f"torchpme_cpu_pme_mdstep_n{N_ATOMS}" not in cached
    positions, charges, cell, idx, dist, shifts, box = build_system(
        N_ATOMS, neighbors=need_nl
    )
    smearing, nodes, spacing, err = choose_parameters(charges, cell, positions)
    pairs = "cached-baseline" if idx is None else idx.shape[0]
    print(
        f"# N={N_ATOMS} box={box:.1f}A pairs={pairs} smearing={smearing:.3f} "
        f"nodes={nodes} spacing={spacing:.3f} err_bound={err:.2e}",
        file=sys.stderr,
    )
    ms, ns_mesh, energy = bench_ours(
        positions, charges, cell, idx, dist, shifts, smearing, nodes, spacing
    )
    print(f"# mesh={ns_mesh} energy={energy:.4f} ours={ms:.2f} ms", file=sys.stderr)

    baseline_ms = None
    if os.environ.get("BENCH_SKIP_BASELINE") != "1":
        baseline_ms = bench_reference_cpu(
            positions, charges, cell, idx, dist, shifts, smearing, nodes, spacing
        )
        print(f"# torch-pme CPU baseline: {baseline_ms} ms", file=sys.stderr)

    vs_baseline = (baseline_ms / ms) if baseline_ms else 0.0
    print(
        json.dumps(
            {
                "metric": (
                    f"pme_energy_force_ms_per_step_{N_ATOMS}atoms_water_1e-4"
                    + os.environ.get("BENCH_METRIC_SUFFIX", "")
                ),
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


def orchestrate():
    """Run the measurement in a watchdogged subprocess.

    The tunneled TPU runtime on this machine intermittently wedges at the
    tunnel level (even trivial ops hang, sometimes for HOURS, and wedges
    clear on their own after minutes — two back-to-back long attempts is
    the worst retry shape).  Strategy, under one total time budget:

    1. HEALTH PROBE first: a 90 s subprocess running one tiny jitted op.
       A wedged tunnel fails this in 90 s instead of burning a full
       attempt; on failure we SLEEP (spaced retries — wedges clear over
       minutes) and re-probe.
    2. Only a passing probe spends a full attempt (itself watchdogged by
       the in-child heartbeat: absence of device liveness kills early).
    3. When the budget for TPU attempts is exhausted, the same measurement
       runs on local CPU with the metric renamed, so the benchmark always
       emits its one JSON line instead of hanging the driver.

    A successful TPU run also leaves the persistent compilation cache
    (.jax_cache) primed with the exact bench program, making the next
    driver run immune to remote-compile wedges."""
    import subprocess

    deadline = float(os.environ.get("BENCH_DEADLINE", 1200))
    # total wall budget for ALL TPU probing+attempts; reserve the tail for
    # the CPU fallback (~20 min at 102k) so the driver always gets a line
    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET", 3600))
    probe_budget = float(os.environ.get("BENCH_HEALTH_PROBE_TIMEOUT", 90))
    retry_sleep = float(os.environ.get("BENCH_RETRY_SLEEP", 180))
    env = dict(os.environ, BENCH_CHILD="1")
    t0 = time.monotonic()

    def left():
        return total_budget - (time.monotonic() - t0)

    def tpu_healthy():
        """One tiny jitted TPU op in a throwaway subprocess, hard-killed on
        timeout (a wedged tunnel hangs even this)."""
        code = (
            "import jax, jax.numpy as jnp;"
            "x = jnp.ones((128, 128));"
            "(x @ x).block_until_ready();"
            "print('TPU_OK')"
        )
        probe_env = dict(os.environ)
        probe_env.pop("BENCH_CHILD", None)
        proc = subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            start_new_session=True,
            text=True,
        )
        try:
            out, _ = proc.communicate(timeout=probe_budget)
            return "TPU_OK" in (out or "")
        except subprocess.TimeoutExpired:
            import signal

            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            return False

    def run(extra_env, timeout, probe_timeout=None):
        hb = REPO / ".bench_heartbeat"
        hb.unlink(missing_ok=True)
        proc = subprocess.Popen(
            [sys.executable, __file__],
            stdout=subprocess.PIPE,
            env=dict(env, **extra_env, BENCH_HEARTBEAT=str(hb)),
            start_new_session=True,
            text=True,
        )
        start = time.monotonic()
        while True:
            try:
                out, _ = proc.communicate(timeout=5)
                return out if proc.returncode == 0 else None
            except subprocess.TimeoutExpired:
                elapsed = time.monotonic() - start
                wedged = (
                    probe_timeout
                    and elapsed > probe_timeout
                    and not hb.exists()
                )
                if elapsed > timeout or wedged:
                    import signal

                    try:
                        os.killpg(proc.pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                    proc.wait()
                    return None

    attempt = 0
    while left() > deadline:
        if not tpu_healthy():
            print(
                f"# TPU health probe failed ({probe_budget:.0f}s); "
                f"sleeping {retry_sleep:.0f}s (budget left {left():.0f}s)",
                file=sys.stderr,
            )
            time.sleep(min(retry_sleep, max(0.0, left() - deadline)))
            continue
        attempt += 1
        print(f"# TPU healthy; bench attempt {attempt}", file=sys.stderr)
        out = run(
            {},
            min(deadline, left()),
            probe_timeout=float(os.environ.get("BENCH_PROBE_TIMEOUT", 300)),
        )
        if out:
            sys.stdout.write(out)
            return
        print(
            f"# bench attempt {attempt} failed/wedged; "
            f"sleeping {retry_sleep:.0f}s before re-probing",
            file=sys.stderr,
        )
        time.sleep(min(retry_sleep, max(0.0, left() - deadline)))

    print("# falling back to CPU measurement (TPU tunnel wedged)", file=sys.stderr)
    out = run(
        {
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "BENCH_METRIC_SUFFIX": "_cpufallback",
        },
        deadline * 2,
    )
    if out:
        sys.stdout.write(out)
    else:
        sys.exit("bench: TPU wedged and CPU fallback failed")


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1":
        main()
    else:
        orchestrate()
