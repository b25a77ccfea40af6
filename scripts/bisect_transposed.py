"""Bisect the Mosaic SIGABRT in the transposed CBR kernel: which feature
crashes the TPU compiler? Each variant is minimal and runs on a small shape."""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128
H, W, C = 16, 32, 64  # tiny
X = (W + 2) * N


def run(name, fn):
    try:
        out = fn()
        leaf = jax.tree_util.tree_leaves(out)[0]
        s = float(jnp.sum(leaf.astype(jnp.float32)))
        print(f"{name}: OK ({s:.3e})")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}")


# V1: Element partial block on flattened (W*N) lane dim, copy body
def v1():
    x = jnp.ones((H + 2, C, X), jnp.bfloat16)
    w_blk = 8

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[1:2, :, N:(w_blk + 1) * N]

    return pl.pallas_call(
        k,
        grid=(H, W // w_blk),
        in_specs=[pl.BlockSpec((pl.Element(3), pl.Element(C),
                                pl.Element((w_blk + 2) * N)),
                               lambda i, j: (i, 0, j * w_blk * N),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, w_blk * N), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, C, W * N), jnp.bfloat16),
    )(x)


# V2: same Element blocks but full lane dim (block over rows only)
def v2():
    x = jnp.ones((H + 2, C, X), jnp.bfloat16)

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[1:2, :, N:(W + 1) * N]

    return pl.pallas_call(
        k,
        grid=(H,),
        in_specs=[pl.BlockSpec((pl.Element(3), pl.Element(C), pl.Element(X)),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, W * N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, C, W * N), jnp.bfloat16),
    )(x)


# V3: rows-slice + merge reshape (3, C, X) -> (3C, X), dot, on full-lane blocks
def v3():
    x = jnp.ones((H + 2, C, X), jnp.bfloat16)
    w = jnp.ones((C, 3 * C), jnp.bfloat16)

    def k(x_ref, w_ref, o_ref):
        xr = x_ref[0:3].reshape(3 * C, X)
        o_ref[:] = jnp.dot(w_ref[:], xr,
                           preferred_element_type=jnp.float32
                           )[None, :, N:(W + 1) * N].astype(jnp.bfloat16)

    return pl.pallas_call(
        k,
        grid=(H,),
        in_specs=[
            pl.BlockSpec((pl.Element(3), pl.Element(C), pl.Element(X)),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, W * N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, C, W * N), jnp.bfloat16),
    )(x, w)


# V4: value reshape (C, X) -> (C, W+2, N), sublane-shifted slices, sum
def v4():
    x = jnp.ones((H + 2, C, X), jnp.bfloat16)

    def k(x_ref, o_ref):
        t = x_ref[1].reshape(C, W + 2, N)
        acc = jnp.zeros((C, W, N), jnp.float32)
        for dx in range(3):
            acc = acc + t[:, dx:dx + W, :].astype(jnp.float32)
        o_ref[:] = acc.reshape(1, C, W * N).astype(jnp.bfloat16)

    return pl.pallas_call(
        k,
        grid=(H,),
        in_specs=[pl.BlockSpec((pl.Element(3), pl.Element(C), pl.Element(X)),
                               lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, W * N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, C, W * N), jnp.bfloat16),
    )(x)


# V5: 4D layout, Element blocks sublane-aligned (block width div 8, offsets div 8)
def v5():
    w_blk = 8
    xw = 16  # block width (div 8), stride w_blk=8
    x = jnp.ones((H + 2, C, W + 8, N), jnp.bfloat16)

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[1:2, :, 1:w_blk + 1, :]

    return pl.pallas_call(
        k,
        grid=(H, W // w_blk),
        in_specs=[pl.BlockSpec((pl.Element(3), pl.Element(C), pl.Element(xw),
                                pl.Element(N)),
                               lambda i, j: (i, 0, j * w_blk, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, w_blk, N), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, C, W, N), jnp.bfloat16),
    )(x)


if __name__ == "__main__":
    which = sys.argv[1:] or ["v1", "v2", "v3", "v4", "v5"]
    for name in which:
        run(name, globals()[name])
