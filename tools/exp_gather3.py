"""E1d: chained 128-lane `tpu.dynamic_gather` throughput.

Mosaic's lane gather handles a single source vreg (gather dim ≤ 128 lanes).
A W-wide table is covered by `ceil(W/128)` gathers + selects per output:

    out = Σ_g  (idx >> 7 == g) ? gather128(tab[:, g*128:(g+1)*128], idx & 127)

This measures that chain at the compacted-pair-list scale: per cell-block,
a (B, W=896) 4-channel table gathered into (B, capK=3072) outputs.

    python tools/exp_gather3.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

CHAIN = 20
REPS = 3

N_CELLS = 5120
CAP = 32
W = 896  # 7 * 128
K = 96
CAPK = CAP * K  # 3072


def timed(name, fn, *args):
    import jax

    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as exc:  # noqa: BLE001
        lines = str(exc).splitlines() or ["?"]
        print(f"{name:<44s} FAILED: {lines[0][:150]}", flush=True)
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


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device={jax.devices()[0]} cells={N_CELLS} W={W} capK={CAPK}", flush=True)
    rng = np.random.default_rng(0)
    tab_np = rng.normal(size=(N_CELLS, 4, W)).astype(np.float32)
    idx_np = rng.integers(0, W, size=(N_CELLS, CAPK)).astype(np.int32)
    tab = jnp.asarray(tab_np)
    idx = jnp.asarray(idx_np)
    n_sub = W // 128

    def chain_run(body):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run

    def gather_chain(t2d, ii):
        """(B, W) table, (B, CAPK) idx -> (B, CAPK): Mosaic's lane gather
        takes one source vreg (128 lanes), so gather per 128-lane output
        chunk from each 128-lane table slab and select by the high bits."""
        lo = ii & 127
        hi = ii >> 7
        outs = []
        for k in range(CAPK // 128):
            lo_k = lo[:, k * 128 : (k + 1) * 128]
            hi_k = hi[:, k * 128 : (k + 1) * 128]
            acc = jnp.zeros(lo_k.shape, t2d.dtype)
            for g in range(n_sub):
                got = jnp.take_along_axis(
                    t2d[:, g * 128 : (g + 1) * 128], lo_k, axis=-1
                )
                acc = jnp.where(hi_k == g, got, acc)
            outs.append(acc)
        return jnp.concatenate(outs, axis=-1)

    B = 64

    def kernel(t_ref, i_ref, o_ref):
        ii = i_ref[...]
        for c in range(4):
            o_ref[:, c, :] = gather_chain(t_ref[:, c, :], ii)

    def pallas_gather(t):
        g = pl.pallas_call(
            kernel,
            grid=(N_CELLS // B,),
            in_specs=[
                pl.BlockSpec((B, 4, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, CAPK), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, 4, CAPK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N_CELLS, 4, CAPK), jnp.float32),
        )(t, idx)
        return t + 1e-30 * g[:, :, :W]

    # correctness on a small slice first (interpret off-TPU not needed here)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, 4, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, CAPK), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, 4, CAPK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 4, CAPK), jnp.float32),
    )(tab[:B], idx[:B])
    ref = np.stack(
        [np.take_along_axis(tab_np[:B, c], idx_np[:B], axis=-1) for c in range(4)],
        axis=1,
    )
    print("correctness:", np.allclose(np.asarray(out), ref), flush=True)

    run = chain_run(pallas_gather)
    timed(f"E1d chain gather 4ch ({n_sub} vregs)", run, tab)


if __name__ == "__main__":
    main()
