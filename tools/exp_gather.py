"""Feasibility probes for a compacted (Verlet) pair list on TPU.

The window pass is VPU-bound on ~84M candidate slots of which ~6% are real
pairs.  A rebuild-amortized per-atom neighbor compaction would cut the
per-step slots ~5x, IF fetching j-atom data through an index layer is fast:

  E1  Pallas VMEM per-lane gather: does Mosaic lower jnp.take_along_axis
      inside a kernel, and at what speed?
  E2  XLA batched take_along_axis at the real scale (per-cell local gather
      from the 27-cell window arrays).
  E3  one-hot matmul gather on the MXU (always lowers; baseline fallback).

    python tools/exp_gather.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

CHAIN = 20
REPS = 3

N_CELLS = 5120
CAP = 32
W = 864  # 27 * cap window slots per cell
K = 96  # compacted neighbors per atom (full window)


def timed(name, fn, *args):
    import jax

    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as exc:  # noqa: BLE001
        msg = str(exc).splitlines()[0][:120]
        print(f"{name:<44s} FAILED: {msg}", flush=True)
        return None
    times = []
    for _ in range(REPS):
        t0 = time.monotonic()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.monotonic() - t0) / CHAIN)
    ms = float(np.median(times) * 1e3)
    print(f"{name:<44s} {ms:8.3f} ms", flush=True)
    return ms


def chain_run(body):
    import jax

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

    return run


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device={jax.devices()[0]} cells={N_CELLS} W={W} K={K}", flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(N_CELLS, 4, W)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, size=(N_CELLS, CAP * K)), jnp.int32)

    run = chain_run(lambda c: c * 0.9999999 + 1e-30)
    timed("NULL chain floor", run, tab)

    # --- E2: XLA batched take_along_axis (per-cell local gather) ---------
    def xla_gather(t):
        g = jnp.take_along_axis(t, idx[:, None, :], axis=-1)  # (cells,4,capK)
        return t + 1e-30 * jnp.sum(g, axis=-1, keepdims=True)

    run = chain_run(xla_gather)
    timed("E2 XLA take_along_axis (cells,4,W->capK)", run, tab)

    # --- E3: one-hot matmul gather on the MXU ----------------------------
    def onehot_gather(t):
        oh = (idx[:, :, None] == jnp.arange(W)[None, None, :]).astype(jnp.float32)
        g = jnp.einsum("bkw,bcw->bck", oh, t, precision="highest")
        return t + 1e-30 * jnp.sum(g, axis=-1, keepdims=True)

    run = chain_run(onehot_gather)
    timed("E3 one-hot MXU gather", run, tab)

    # --- E1: Pallas VMEM per-lane gather ----------------------------------
    B = 64  # cell block

    def kernel(t_ref, i_ref, o_ref):
        t = t_ref[...]  # (B, 4, W)
        ii = i_ref[...]  # (B, CAP*K)
        g = jnp.take_along_axis(t, ii[:, None, :], axis=-1)
        o_ref[...] = g

    def pallas_gather(t):
        g = pl.pallas_call(
            kernel,
            grid=(N_CELLS // B,),
            in_specs=[
                pl.BlockSpec((B, 4, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, CAP * K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, 4, CAP * K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N_CELLS, 4, CAP * K), jnp.float32),
        )(t, idx)
        return t + 1e-30 * jnp.sum(g, axis=-1, keepdims=True)

    run = chain_run(pallas_gather)
    timed("E1 Pallas VMEM take_along_axis", run, tab)

    # --- E1b: Pallas gather, one channel at a time (2D layout) -----------
    def kernel2(t_ref, i_ref, o_ref):
        ii = i_ref[...]
        for c in range(4):
            o_ref[:, c, :] = jnp.take_along_axis(t_ref[:, c, :], ii, axis=-1)

    def pallas_gather2(t):
        g = pl.pallas_call(
            kernel2,
            grid=(N_CELLS // B,),
            in_specs=[
                pl.BlockSpec((B, 4, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, CAP * K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, 4, CAP * K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N_CELLS, 4, CAP * K), jnp.float32),
        )(t, idx)
        return t + 1e-30 * jnp.sum(g, axis=-1, keepdims=True)

    run = chain_run(pallas_gather2)
    timed("E1b Pallas VMEM 2D take_along_axis", run, tab)


if __name__ == "__main__":
    main()
