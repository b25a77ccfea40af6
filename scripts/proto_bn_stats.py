#!/usr/bin/env python3
"""Prototype: lane-packed Pallas per-channel sum/sumsq vs XLA reduce.

Motivation (docs/RESULTS.md profile): BN-statistics reductions over
full-resolution C=64 activations are ~25% of device time and run far below
HBM bandwidth, partly because (8,128)-tiled layouts leave half the lanes
empty at C=64. Trick: view the (M, 64) activation as (M/2, 128) so each lane
row carries two pixels' channels, reduce over rows at full lane width, then
fold lanes [64:128) onto [0:64).

This prototype decides whether a custom BatchNorm (Pallas stats + custom VJP)
is worth building: run on the TPU and compare.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64
TILE_M = 1024  # (1024, 128) bf16 tile = 256 KiB


def _stats_kernel(x_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:].astype(jnp.float32)          # (TILE_M, 128): two pixels per row
    s = jnp.sum(x, axis=0, keepdims=True)     # (1, 128)
    sq = jnp.sum(x * x, axis=0, keepdims=True)
    out_ref[0:1, :] = out_ref[0:1, :] + s
    out_ref[1:2, :] = out_ref[1:2, :] + sq


@jax.jit
def pallas_bn_stats(x):
    """bf16 (N, H, W, 64) -> (sum f32[64], sumsq f32[64])."""
    flat = x.reshape(-1, 128)  # two pixels' channels per row
    m = flat.shape[0]
    grid = m // TILE_M
    out = pl.pallas_call(
        _stats_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE_M, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
    )(flat)
    total = out[:, :C] + out[:, C:]           # fold pixel-1 lanes onto pixel-0
    return total[0], total[1]


@jax.jit
def xla_bn_stats(x):
    flat = x.astype(jnp.float32).reshape(-1, C)
    return jnp.sum(flat, axis=0), jnp.sum(flat * flat, axis=0)


def timeit(f, x, n=30):
    out = f(x)
    float(jnp.sum(out[0]) * 0)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(x)
    float(jnp.sum(out[0]) * 0)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((128, 256, 256, C)).astype(np.float32).astype(jnp.bfloat16)
    )
    nbytes = x.size * 2

    s_p, sq_p = pallas_bn_stats(x)
    s_x, sq_x = xla_bn_stats(x)
    print("max |sum diff|:", float(jnp.max(jnp.abs(s_p - s_x))),
          " rel:", float(jnp.max(jnp.abs(s_p - s_x) / (jnp.abs(s_x) + 1))))
    print("max |sumsq rel diff|:", float(jnp.max(jnp.abs(sq_p - sq_x) / (jnp.abs(sq_x) + 1))))

    t_x = timeit(xla_bn_stats, x)
    t_p = timeit(pallas_bn_stats, x)
    print(f"XLA reduce:    {t_x*1e3:6.2f} ms  ({nbytes/t_x/1e9:.0f} GB/s)")
    print(f"Pallas packed: {t_p*1e3:6.2f} ms  ({nbytes/t_p/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
