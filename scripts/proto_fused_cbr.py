"""Prototype: fused CBR Pallas kernel (docs/ROADMAP.md #1, VERDICT round-2 #2).

The train-step profile shows each CBR block making ~4 HBM passes over its
activation (conv write -> BN-stats read -> normalize+relu read+write -> next
conv read) because XLA cannot fuse elementwise/reduction work into TPU conv
ops. This kernel computes

    y = conv3x3(relu(x * a + b), w) + bias        (prologue = prev BN affine)
    stats = (sum_c(y), sum_c(y^2))                (epilogue = this BN's stats)

in ONE pass: x is read once, y is written once, stats ride along in VMEM.

Formulation: 9-tap shifted matmuls on the MXU. Grid over (batch, row-blocks);
each step loads an input block with a 1-row halo, applies the affine+relu
prologue, and accumulates 9 (rows*W, Cin) @ (Cin, Cout) dots in f32.

Measured candidates (bottleneck shape first: full 128 lanes, smallest
spatial extent):
  A. XLA conv alone            (lower bound for the conv itself)
  B. XLA conv + train-mode BN stats + normalize + relu (what the net does)
  C. Pallas fused              (this kernel)

Success = C beats B while matching it numerically; C ~ A means the extra
passes were removed for free.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# fused kernel
# ---------------------------------------------------------------------------

def _fused_cbr_kernel(x_ref, a_ref, b_ref, w_ref, bias_ref,
                      y_ref, stats_ref, xn_ref, *, rows: int, W: int,
                      Cin: int, Cout: int, apply_prologue: bool):
    """One (image, row-block) step.

    x_ref:    (1, rows+2, W+2, Cin) input block incl. halo (pre-padded array)
    a/b_ref:  (1, Cin) prologue affine (BN fold of the PREVIOUS layer)
    w_ref:    (9, Cin, Cout) conv taps, tap-major
    bias_ref: (1, Cout)
    y_ref:    (1, rows, W, Cout) raw conv output
    stats_ref:(2, Cout) f32 accumulated sum / sumsq over the whole batch
    xn_ref:   (rows+2, W+2, Cin) VMEM scratch for the normalized input
    """
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    Wp = W + 2
    x = x_ref[0]
    if apply_prologue:
        a = a_ref[0].astype(jnp.float32)
        b = b_ref[0].astype(jnp.float32)
        xn = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0)
        # SAME-conv zero padding applies to the NORMALIZED input: the raw
        # array was padded with zeros BEFORE the affine, which would leak
        # relu(b) into the halo — zero the pad ring explicitly.
        rid = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, Wp), 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, Wp), 1)
        first = pl.program_id(1) == 0
        last = pl.program_id(1) == pl.num_programs(1) - 1
        keep = ((cid != 0) & (cid != Wp - 1)
                & ((rid != 0) | jnp.logical_not(first))
                & ((rid != rows + 1) | jnp.logical_not(last)))
        # float mask (1-bit vectors can't gain a minor dim in Mosaic)
        xn = (xn * keep.astype(jnp.float32)[..., None]).astype(x.dtype)
    else:
        xn = x
    xn_ref[:] = xn

    # middle-dim shifted windows: dy slices the major dim (tile-aligned),
    # dx slices W one sublane over — Mosaic handles the realignment well.
    # NEGATIVE RESULT (measured): a "flat-window" variant that makes every
    # tap a CONTIGUOUS slice of the width-padded flat view (start dy*Wp+dx)
    # is far slower — the sublane-UNALIGNED starts force a relayout per tap
    # (level1 21 -> 11 TF/s, level2 91 -> 51 TF/s, level3 whole-image OOMs
    # on the rows*(W+2) accumulator). Do not re-attempt.
    acc = jnp.zeros((rows * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = xn_ref[dy:dy + rows, dx:dx + W, :].reshape(rows * W, Cin)
            acc = acc + jnp.dot(win, w_ref[dy * 3 + dx],
                                preferred_element_type=jnp.float32)

    y = acc + bias_ref[0].astype(jnp.float32)
    yc = y.astype(y_ref.dtype)
    y_ref[0] = yc.reshape(rows, W, Cout)

    yf = yc.astype(jnp.float32)
    stats_ref[0, :] += jnp.sum(yf, axis=0)
    stats_ref[1, :] += jnp.sum(yf * yf, axis=0)


@functools.partial(jax.jit, static_argnames=("rows", "apply_prologue", "interpret"))
def fused_cbr(x, a, b, w, bias, rows=8, apply_prologue=True, interpret=False):
    """x (N,H,W,Cin) RAW previous-conv output -> (y (N,H,W,Cout), stats (2,Cout)).

    y = conv3x3_same(relu(x*a+b), w) + bias;  stats = [sum(y), sum(y^2)].
    """
    N, H, W, Cin = x.shape
    Cout = w.shape[-1]
    assert H % rows == 0
    # halo: pad H and W by 1 on both sides once in XLA (cheap, fuses with the
    # producer); row-block r then reads padded rows [r*rows, r*rows + rows+2)
    # — overlapping reads via pl.Element (element-start indexing).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.reshape(9, Cin, Cout)

    grid = (N, H // rows)
    kernel = functools.partial(
        _fused_cbr_kernel, rows=rows, W=W, Cin=Cin, Cout=Cout,
        apply_prologue=apply_prologue,
    )
    if H == rows:
        # whole image per step: no overlap needed -> plain Blocked indexing
        # (Element mode measurably disables pipelining optimizations)
        x_spec = pl.BlockSpec((1, rows + 2, W + 2, Cin),
                              lambda n, r: (n, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((pl.Element(1), pl.Element(rows + 2),
                               pl.Element(W + 2), pl.Element(Cin)),
                              lambda n, r: (n, r * rows, 0, 0),
                              memory_space=pltpu.VMEM)
    y, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((1, Cin), lambda n, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cin), lambda n, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cin, Cout), lambda n, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda n, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, W, Cout), lambda n, r: (n, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Cout), lambda n, r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, Cout), x.dtype),
            jax.ShapeDtypeStruct((2, Cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows + 2, W + 2, Cin), x.dtype)],
        interpret=interpret,
    )(xp, a[None], b[None], w9, bias[None])
    return y, stats


# ---------------------------------------------------------------------------
# XLA reference chain
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("apply_prologue",))
def xla_chain(x, a, b, w, bias, apply_prologue=True):
    """What the unfused net does: prologue affine+relu, conv, stats."""
    if apply_prologue:
        xn = (jnp.maximum(x.astype(jnp.float32) * a + b, 0.0)).astype(x.dtype)
    else:
        xn = x
    y = jax.lax.conv_general_dilated(
        xn, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias
    y = y.astype(x.dtype)
    yf = y.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))])
    return y, stats


@jax.jit
def xla_conv_only(xn, w, bias):
    y = jax.lax.conv_general_dilated(
        xn, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias
    return y.astype(xn.dtype)


# ---------------------------------------------------------------------------
# measurement
# ---------------------------------------------------------------------------

def timeit(fn, *args, iters=20):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))  # tunnel-safe sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    return (time.perf_counter() - t0) / iters


def bench_shape(name, N, H, W, Cin, Cout, rows):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal(Cin), jnp.float32) * 0.1 + 1.0
    b = jnp.asarray(rng.standard_normal(Cin), jnp.float32) * 0.1
    wgt = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.02, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)

    y_ref, s_ref = xla_chain(x, a, b, wgt, bias)
    y_f, s_f = fused_cbr(x, a, b, wgt, bias, rows=rows)
    err = float(jnp.max(jnp.abs(y_f.astype(jnp.float32) - y_ref.astype(jnp.float32))))
    serr = float(jnp.max(jnp.abs(s_f - s_ref)) / jnp.maximum(jnp.max(jnp.abs(s_ref)), 1))

    flops = 2 * 9 * Cin * Cout * H * W * N
    t_conv = timeit(xla_conv_only, x, wgt, bias)
    t_chain = timeit(xla_chain, x, a, b, wgt, bias)
    t_fused = timeit(functools.partial(fused_cbr, rows=rows), x, a, b, wgt, bias)
    print(f"[{name}] N{N} {H}x{W} {Cin}->{Cout} rows={rows}  "
          f"err={err:.4f} stats_rel={serr:.1e}")
    print(f"  A. XLA conv only: {t_conv*1e3:8.3f} ms ({flops/t_conv/1e12:6.1f} TF/s)")
    print(f"  B. XLA chain:     {t_chain*1e3:8.3f} ms ({flops/t_chain/1e12:6.1f} TF/s)")
    print(f"  C. Pallas fused:  {t_fused*1e3:8.3f} ms ({flops/t_fused/1e12:6.1f} TF/s)"
          f"   C vs B: {t_chain/t_fused:.2f}x  C vs A: {t_conv/t_fused:.2f}x",
          flush=True)


def main():
    N = 128
    shapes = {
        "bottleneck": (N, 32, 32, 512, 512, 32),      # dec4_1
        "dec4_2": (N, 32, 32, 256, 512, 32),
        "level3": (N, 64, 64, 256, 256, 64),           # enc3_2 / dec3_1
        "level3b": (N, 64, 64, 256, 256, 16),
        "enc3_1": (N, 64, 64, 128, 256, 64),
        "dec3_2": (N, 64, 64, 512, 256, 32),           # concat input
        "level2": (N, 128, 128, 128, 128, 16),         # enc2_2 / dec2_1
        "enc2_1": (N, 128, 128, 64, 128, 16),
        "dec2_2": (N, 128, 128, 256, 128, 16),         # concat input
        "level1": (N, 256, 256, 64, 64, 16),           # enc1_2 / dec1_1
        "level1b": (N, 256, 256, 64, 64, 32),
        "dec1_2": (N, 256, 256, 128, 64, 16),          # concat input
    }
    which = sys.argv[1:] or list(shapes)
    for name in which:
        bench_shape(name, *shapes[name])


if __name__ == "__main__":
    main()
