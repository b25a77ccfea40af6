"""Fused CBR Pallas kernel: conv3x3 with BN-affine+ReLU prologue and
BN-statistics epilogue (docs/ROADMAP.md #1).

The reference's universal building block is CBR = Conv3x3 -> BatchNorm ->
ReLU (reference model.py:9-15). Unfused, each block makes ~4 HBM passes over
its activation per training step: conv write -> BN-stats read ->
normalize+relu read+write -> next conv read, because XLA cannot fuse
elementwise or reduction work into TPU convolution ops (24.5% of device time
sat in convert+reduce fusions in the round-1 profile, docs/RESULTS.md).

``fused_conv_stats`` computes, in ONE pass over the input:

    y     = conv3x3_same(relu(x * a + b), w) + bias     # prologue fused
    stats = [sum(y), sum(y^2)]  over N, H, W            # epilogue fused

where (a, b) is the PREVIOUS layer's BatchNorm affine folded with its batch
(or running) statistics, and ``stats`` are exactly the sums this layer's
BatchNorm needs (flax computes var = E[x^2] - E[x]^2, the use_fast_variance
path). x is read once; y is written once.

Formulation: 9-tap shifted matmuls on the MXU, grid over (image, row-block),
halo rows read via overlapping ``pl.Element`` blocks (whole-image blocks use
plain Blocked indexing, which pipelines better). Measured on v5e at batch
128 vs the unfused XLA chain IN ISOLATION: bottleneck 1.08x, level-3 1.13x,
level-2 1.18x, dec4_2 1.29x, enc3_1 1.26x, within 2-4% of the bare XLA conv
(scripts/proto_fused_cbr.py). C=64 level-1 shapes LOSE (K=64 contractions
are MXU-latency-bound; 3 formulations measured 21 / 19 / 11 TF/s vs XLA's
50) — ``eligible()`` gates them back to the classic path.

END-TO-END NEGATIVE RESULT (round 2, measured): the fused trunk regresses
the full train step 473 -> 394 patches/s and the forward 71 -> 95 ms.
Root cause (xplane profile): in-net XLA assigns BATCH-MINOR layouts to conv
activations ({3,0,2,1}; at C=64 it packs N with C to fill the 128 lanes),
which (a) makes the in-net XLA convs faster than the default-layout isolated
baselines the kernel beat, and (b) inserts large transpose copies at every
pallas/XLA-conv boundary, since pallas_call forces default layouts. The
trunk therefore ships behind ``--fused_cbr on`` as an experimental path; a
winning version must cover the whole trunk in XLA-layout-compatible kernels
(incl. a level-1 kernel that beats 50 TF/s at K=64) or none of it.

The backward is the standard XLA VJP (jax.vjp of the conv for dx/dw +
elementwise/reduction math for the prologue affine), so gradients are
numerically equivalent to the unfused graph.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conservative VMEM budget for one grid step's resident buffers (of 16 MB/core;
# leaves room for double-buffered pipelining of the x/y blocks)
_VMEM_BUDGET = 11 * 1024 * 1024


def _vmem_estimate(rows: int, W: int, Cin: int, Cout: int, esize: int) -> int:
    x_block = (rows + 2) * (W + 2) * Cin * esize * 2   # double-buffered
    scratch = (rows + 2) * (W + 2) * Cin * esize
    acc = rows * W * Cout * 4
    y_block = rows * W * Cout * esize * 2
    w_buf = 9 * Cin * Cout * esize
    return x_block + scratch + acc + y_block + w_buf


def choose_rows(H: int, W: int, Cin: int, Cout: int, esize: int) -> Optional[int]:
    """Largest row-block (whole image preferred: Blocked indexing pipelines
    better than Element) that fits the VMEM budget; None if even 8 rows
    don't fit."""
    for rows in (H, 32, 16, 8):
        if rows <= H and H % rows == 0 and \
                _vmem_estimate(rows, W, Cin, Cout, esize) <= _VMEM_BUDGET:
            return rows
    return None


def eligible(H: int, W: int, Cin: int, Cout: int, dtype) -> bool:
    """Shapes where the kernel measured >= parity with the XLA chain.

    K = Cin is the MXU contraction dim: Cin < 128 leaves the systolic array
    half-fed and measured 0.5x (level-1); Cout < 128 halves output lanes.
    """
    if Cin < 128 or Cout < 128:
        return False
    esize = jnp.dtype(dtype).itemsize
    return choose_rows(H, W, Cin, Cout, esize) is not None


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, y_ref, stats_ref, xn_ref,
                *, rows: int, W: int, Cin: int, Cout: int,
                apply_prologue: bool):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    x = x_ref[0]
    if apply_prologue:
        a = a_ref[0].astype(jnp.float32)
        b = b_ref[0].astype(jnp.float32)
        xn = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0)
        xn_ref[:] = xn.astype(x.dtype)
        # SAME-conv zero padding applies to the NORMALIZED input; the raw
        # array was zero-padded BEFORE the affine, which would leak relu(b)
        # into the halo — zero the pad ring explicitly.
        zrow = jnp.zeros((1, W + 2, Cin), x.dtype)
        zcol = jnp.zeros((rows + 2, 1, Cin), x.dtype)

        @pl.when(pl.program_id(1) == 0)
        def _():
            xn_ref[0:1, :, :] = zrow

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            xn_ref[rows + 1:rows + 2, :, :] = zrow

        xn_ref[:, 0:1, :] = zcol
        xn_ref[:, W + 1:W + 2, :] = zcol
    else:
        xn_ref[:] = x

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


@functools.partial(jax.jit, static_argnames=("apply_prologue", "interpret"))
def _pallas_fwd(x, a, b, w, bias, apply_prologue: bool, interpret: bool):
    N, H, W, Cin = x.shape
    Cout = w.shape[-1]
    esize = jnp.dtype(x.dtype).itemsize
    rows = choose_rows(H, W, Cin, Cout, esize)
    assert rows is not None, "caller must gate on eligible()"

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w9 = w.astype(x.dtype).reshape(9, Cin, Cout)

    if rows == H:
        x_spec = pl.BlockSpec((1, H + 2, W + 2, Cin), lambda n, r: (n, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((pl.Element(1), pl.Element(rows + 2),
                               pl.Element(W + 2), pl.Element(Cin)),
                              lambda n, r: (n, r * rows, 0, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel, rows=rows, W=W, Cin=Cin, Cout=Cout,
                               apply_prologue=apply_prologue)
    y, stats = pl.pallas_call(
        kernel,
        grid=(N, H // rows),
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
    )(xp, a.astype(jnp.float32)[None], b.astype(jnp.float32)[None], w9,
      bias.astype(jnp.float32)[None])
    return y, stats


# ---------------------------------------------------------------------------
# custom VJP: XLA backward (phase 1 — numerics identical to the unfused graph)
# ---------------------------------------------------------------------------

def _conv(xn, w):
    return jax.lax.conv_general_dilated(
        xn, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_conv_stats(x, a, b, w, bias, apply_prologue: bool = True,
                     interpret: bool = False):
    """y = conv3x3_same(relu(x*a + b), w) + bias;  stats = [sum(y), sum(y^2)].

    Args:
        x: (N, H, W, Cin) — the RAW previous-layer conv output (prologue on)
           or an already-normalized float input (prologue off).
        a, b: (Cin,) f32 prologue affine; ignored when ``apply_prologue`` is
           False (pass ones/zeros).
        w: (3, 3, Cin, Cout) HWIO kernel. bias: (Cout,).
    Returns:
        (y (N, H, W, Cout) in x.dtype, stats (2, Cout) f32).
    """
    return _pallas_fwd(x, a, b, w, bias, apply_prologue, interpret)


def _fcs_fwd(x, a, b, w, bias, apply_prologue, interpret):
    y, stats = _pallas_fwd(x, a, b, w, bias, apply_prologue, interpret)
    return (y, stats), (x, a, b, w, y)


def _fcs_bwd(apply_prologue, interpret, res, cts):
    x, a, b, w, y = res
    ybar, sbar = cts
    # stats = [sum(y), sum(y*y)] contribute  sbar0 + 2*y*sbar1  to dy
    ybar_eff = (ybar.astype(jnp.float32)
                + sbar[0][None, None, None, :]
                + 2.0 * y.astype(jnp.float32) * sbar[1][None, None, None, :])
    bias_bar = jnp.sum(ybar_eff, axis=(0, 1, 2))

    if apply_prologue:
        pre = x.astype(jnp.float32) * a + b
        xn = jnp.maximum(pre, 0.0).astype(x.dtype)
    else:
        xn = x

    # dx/dw through XLA's own conv backward, in the native compute dtype —
    # the same bf16 backward convs the unfused graph runs (a f32 VJP here
    # would silently double the backward conv cost)
    def _conv_native(xn_, w_):
        return jax.lax.conv_general_dilated(
            xn_, w_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    _, conv_vjp = jax.vjp(_conv_native, xn, w.astype(x.dtype))
    dxn, dw = conv_vjp(ybar_eff.astype(x.dtype))
    dxn = dxn.astype(jnp.float32)

    if apply_prologue:
        mask = (pre > 0).astype(jnp.float32)
        dpre = dxn * mask
        x_bar = (dpre * a).astype(x.dtype)
        a_bar = jnp.sum(dpre * x.astype(jnp.float32), axis=(0, 1, 2))
        b_bar = jnp.sum(dpre, axis=(0, 1, 2))
    else:
        x_bar = dxn.astype(x.dtype)
        a_bar = jnp.zeros_like(a)
        b_bar = jnp.zeros_like(b)

    return x_bar, a_bar, b_bar, dw.astype(w.dtype), bias_bar.astype(jnp.float32)


fused_conv_stats.defvjp(_fcs_fwd, _fcs_bwd)


def moments_from_stats(stats: jax.Array, n: int) -> Tuple[jax.Array, jax.Array]:
    """(mean, var) from [sum, sumsq] over n elements — flax's
    use_fast_variance math (var = E[x^2] - E[x]^2, clipped at 0)."""
    mean = stats[0] / n
    var = jnp.maximum(stats[1] / n - mean * mean, 0.0)
    return mean, var


def bn_affine(gamma, beta, mean, var, eps: float = 1e-5):
    """Fold BN(mean, var, gamma, beta) into (a, b): BN(x) = x * a + b."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    a = gamma.astype(jnp.float32) * inv
    b = beta.astype(jnp.float32) - mean.astype(jnp.float32) * a
    return a, b
