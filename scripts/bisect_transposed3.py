"""Feature-flag bisection of the transposed CBR kernel Mosaic SIGABRT."""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128
H, W, C = 16, 32, 64
ROWS, WBLK = 4, 16
X = (WBLK + 2) * N


def _kernel(x_ref, w_ref, y_ref, stats_ref, xn_ref, *,
            prologue, zero_ring, merge_dot, shift, stats, scratch):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    if stats:
        @pl.when(step == 0)
        def _():
            stats_ref[:] = jnp.zeros_like(stats_ref)

    src = xn_ref if scratch else x_ref
    if scratch:
        if prologue:
            xn_ref[:] = jnp.maximum(x_ref[:].astype(jnp.float32) * 1.1 + 0.1,
                                    0.0).astype(x_ref.dtype)
        else:
            xn_ref[:] = x_ref[:]
        if zero_ring:
            zrow = jnp.zeros((1, C, X), x_ref.dtype)
            zcol = jnp.zeros((ROWS + 2, C, N), x_ref.dtype)

            @pl.when(pl.program_id(0) == 0)
            def _():
                xn_ref[0:1] = zrow

            @pl.when(pl.program_id(1) == 0)
            def _():
                xn_ref[:, :, 0:N] = zcol

    s0 = jnp.zeros((C,), jnp.float32)
    for r in range(ROWS):
        if merge_dot:
            xr = src[r:r + 3].reshape(3 * C, X)
            lhs = w_ref[0]
        else:
            xr = src[r + 1]
            lhs = w_ref[0, :, 0:C]
        acc = jnp.zeros((C, WBLK, N), jnp.float32)
        if shift:
            t = jnp.dot(lhs, xr, preferred_element_type=jnp.float32)
            t = t.reshape(C, WBLK + 2, N)
            for dx in range(3):
                acc = acc + t[:, dx:dx + WBLK, :]
        else:
            t = jnp.dot(lhs, xr[:, 0:WBLK * N],
                        preferred_element_type=jnp.float32)
            acc = acc + t.reshape(C, WBLK, N)
        yc = acc.astype(y_ref.dtype)
        y_ref[r] = yc.reshape(C, WBLK * N)
        if stats:
            if stats == "2d":
                s0 = s0 + jnp.sum(yc.astype(jnp.float32), axis=2).sum(
                    axis=1).reshape(1, C)
            else:
                s0 = s0 + jnp.sum(yc.astype(jnp.float32), axis=(1, 2))
    if stats:
        if stats == "2d":
            stats_ref[0:1, :] += s0
        elif stats == "pad":
            stats_ref[0:1, 0:C] += jnp.sum(s0.reshape(1, C), axis=0,
                                           keepdims=True)
        else:
            stats_ref[0, :] += s0


def build(**flags):
    x = jnp.ones((H + 2, C, (W + 2) * N), jnp.bfloat16)
    w = jnp.ones((3, C, 3 * C), jnp.bfloat16)
    kernel = functools.partial(_kernel, **flags)
    scratch = [pltpu.VMEM((ROWS + 2, C, X), jnp.bfloat16)]
    y, stats = pl.pallas_call(
        kernel,
        grid=(H // ROWS, W // WBLK),
        in_specs=[
            pl.BlockSpec((pl.Element(ROWS + 2), pl.Element(C), pl.Element(X)),
                         lambda i, j: (i * ROWS, 0, j * WBLK * N),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, 3 * C), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, C, WBLK * N), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128) if flags["stats"] == "pad" else (2, C),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, C, W * N), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, 128) if flags["stats"] == "pad" else (2, C), jnp.float32),
        ],
        scratch_shapes=scratch,
    )(x, w)
    return y, stats


CASES = {
    # everything off: plain dot, no scratch
    "base":      dict(prologue=False, zero_ring=False, merge_dot=False,
                      shift=False, stats=False, scratch=False),
    "scratch":   dict(prologue=False, zero_ring=False, merge_dot=False,
                      shift=False, stats=False, scratch=True),
    "merge":     dict(prologue=False, zero_ring=False, merge_dot=True,
                      shift=False, stats=False, scratch=True),
    "shift":     dict(prologue=False, zero_ring=False, merge_dot=False,
                      shift=True, stats=False, scratch=True),
    "shift_merge": dict(prologue=False, zero_ring=False, merge_dot=True,
                      shift=True, stats=False, scratch=True),
    "stats":     dict(prologue=False, zero_ring=False, merge_dot=False,
                      shift=False, stats=True, scratch=True),
    "stats_merge": dict(prologue=False, zero_ring=False, merge_dot=True,
                      shift=False, stats=True, scratch=True),
    "prologue":  dict(prologue=True, zero_ring=False, merge_dot=False,
                      shift=False, stats=False, scratch=True),
    "zero_ring": dict(prologue=True, zero_ring=True, merge_dot=False,
                      shift=False, stats=False, scratch=True),
    "stats2d":   dict(prologue=False, zero_ring=False, merge_dot=False,
                      shift=False, stats="2d", scratch=True),
    "statspad":  dict(prologue=False, zero_ring=False, merge_dot=False,
                      shift=False, stats="pad", scratch=True),
    "all_nostats": dict(prologue=True, zero_ring=True, merge_dot=True,
                      shift=True, stats=False, scratch=True),
    "all2d":     dict(prologue=True, zero_ring=True, merge_dot=True,
                      shift=True, stats="2d", scratch=True),
    "all":       dict(prologue=True, zero_ring=True, merge_dot=True,
                      shift=True, stats=True, scratch=True),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    for name in names:
        try:
            out = build(**CASES[name])
            s = float(jnp.sum(out[0].astype(jnp.float32)))
            print(f"{name}: OK ({s:.3e})")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:100]}")
