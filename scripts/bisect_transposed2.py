"""Bisect v3: which part of rows-slice + merge-reshape + dot fails?"""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128
H, W, C = 16, 32, 64
X = (W + 2) * N


def make(body):
    x = jnp.ones((H + 2, C, X), jnp.bfloat16)
    w = jnp.ones((C, 3 * C), jnp.bfloat16)

    def k(x_ref, w_ref, o_ref):
        body(x_ref, w_ref, o_ref)

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


def run(name, body):
    try:
        out = make(body)
        print(f"{name}: OK ({float(jnp.sum(out.astype(jnp.float32))):.3e})")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")


def a(x_ref, w_ref, o_ref):  # read 3-row slice, sum rows, write
    v = x_ref[0:3]  # (3, C, X)
    o_ref[:] = jnp.sum(v.astype(jnp.float32), axis=0,
                       keepdims=True)[:, :, N:(W + 1) * N].astype(jnp.bfloat16)


def b(x_ref, w_ref, o_ref):  # + merge reshape
    v = x_ref[0:3].reshape(3 * C, X)
    o_ref[:] = (v[0:C] + v[C:2 * C] + v[2 * C:3 * C]).astype(jnp.float32)[
        None, :, N:(W + 1) * N].astype(jnp.bfloat16)


def c(x_ref, w_ref, o_ref):  # + dot
    v = x_ref[0:3].reshape(3 * C, X)
    t = jnp.dot(w_ref[:], v, preferred_element_type=jnp.float32)
    o_ref[:] = t[None, :, N:(W + 1) * N].astype(jnp.bfloat16)


def d(x_ref, w_ref, o_ref):  # dot without the rows merge (single row)
    v = x_ref[1]  # (C, X)
    t = jnp.dot(w_ref[:, 0:C], v, preferred_element_type=jnp.float32)
    o_ref[:] = t[None, :, N:(W + 1) * N].astype(jnp.bfloat16)


def e(x_ref, w_ref, o_ref):  # explicit concat of 3 rows instead of reshape
    v = jnp.concatenate([x_ref[0], x_ref[1], x_ref[2]], axis=0)  # (3C, X)
    t = jnp.dot(w_ref[:], v, preferred_element_type=jnp.float32)
    o_ref[:] = t[None, :, N:(W + 1) * N].astype(jnp.bfloat16)


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["a", "b", "c", "d", "e"]):
        run(name, globals()[name])
