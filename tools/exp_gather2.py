"""E1c: Mosaic `tpu.dynamic_gather` probe (matched-shape 2D lane gather).

Mosaic lowers `jnp.take_along_axis(x, idx, axis=-1)` (both (B, n), output
(B, n)) to `tpu.dynamic_gather`.  A compacted pair list needs (B, W=864)
tables gathered into (B, capK=3072) outputs — realized by padding the table
to the output width.  This measures whether that gather runs at vector speed.

    python tools/exp_gather2.py
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
W = 864
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
    tab = jnp.asarray(rng.normal(size=(N_CELLS, 4, CAPK)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, size=(N_CELLS, CAPK)), jnp.int32)

    def chain_run(body):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, CHAIN, lambda _, c: body(c), x)

        return run

    # correctness probe, small
    def ker_small(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=-1)

    ts = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    isx = jnp.asarray(rng.integers(0, 256, size=(8, 256)), jnp.int32)
    out = pl.pallas_call(
        ker_small,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
    )(ts, isx)
    ref = np.take_along_axis(np.asarray(ts), np.asarray(isx), axis=-1)
    print("correctness:", np.allclose(np.asarray(out), ref), flush=True)

    B = 64

    def kernel(t_ref, i_ref, o_ref):
        ii = i_ref[...]  # (B, CAPK)
        for c in range(4):
            o_ref[:, c, :] = jnp.take_along_axis(t_ref[:, c, :], ii, axis=-1)

    def pallas_gather(t):
        g = pl.pallas_call(
            kernel,
            grid=(N_CELLS // B,),
            in_specs=[
                pl.BlockSpec(
                    (B, 4, CAPK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((B, CAPK), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (B, 4, CAPK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N_CELLS, 4, CAPK), jnp.float32),
        )(t, idx)
        return t + 1e-30 * g

    run = chain_run(pallas_gather)
    timed("E1c Pallas dynamic_gather 4ch (B,3072)", run, tab)

    # same, B=8 (one sublane tile) and B=128
    for Bv in (8, 128, 256):

        def kernel_b(t_ref, i_ref, o_ref):
            ii = i_ref[...]
            for c in range(4):
                o_ref[:, c, :] = jnp.take_along_axis(t_ref[:, c, :], ii, axis=-1)

        def pallas_gather_b(t, Bv=Bv, kernel_b=kernel_b):
            g = pl.pallas_call(
                kernel_b,
                grid=(N_CELLS // Bv,),
                in_specs=[
                    pl.BlockSpec(
                        (Bv, 4, CAPK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                    ),
                    pl.BlockSpec(
                        (Bv, CAPK), lambda i: (i, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (Bv, 4, CAPK), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((N_CELLS, 4, CAPK), jnp.float32),
            )(t, idx)
            return t + 1e-30 * g

        run = chain_run(pallas_gather_b)
        timed(f"E1c Pallas dynamic_gather 4ch B={Bv}", run, tab)


if __name__ == "__main__":
    main()
