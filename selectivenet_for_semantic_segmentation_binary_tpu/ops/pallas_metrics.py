"""Pallas TPU kernel: fused binary eval metrics.

The evaluation hot loop (reference eval.py:191-251) per batch computes
sigmoid -> threshold -> selection sigmoid -> threshold -> validity mask ->
confusion counting. As separate XLA ops that is several full passes over the
(N, H, W) logit maps through HBM; this kernel fuses the whole post-forward
metric pipeline into ONE read of each logit map, emitting per-tile partial
counts (confusion-matrix cells, reject count, valid-pixel count) that the
caller integer-sums — exact for arbitrarily large batches.

Scope: binary heads (n_cls == 2, the repo's namesake task). The general-C XLA
path (ops/confusion.py) remains the fallback — eval_lib picks automatically.

Layout: inputs are flattened and padded to (rows, 128) lanes; padded pixels
carry PAD_LABEL so the validity mask drops them inside the kernel, mirroring
the static-shape batching contract used everywhere else.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .confusion import PAD_LABEL

LANES = 128
TILE_ROWS = 512  # (512, 128) f32 tiles = 256 KiB per operand, well under VMEM


def _flatten_pad(x: jax.Array, fill) -> Tuple[jax.Array, int]:
    flat = x.reshape(-1)
    total = flat.shape[0]
    tile = TILE_ROWS * LANES
    padded = ((total + tile - 1) // tile) * tile
    if padded != total:
        flat = jnp.concatenate([flat, jnp.full((padded - total,), fill, flat.dtype)])
    return flat.reshape(-1, LANES), padded // tile


def _metrics_kernel(f_ref, g_ref, l_ref, out_ref, *, apply_sigmoid: bool,
                    selective: bool, cut_off: float, s_cut_off: float):
    import jax.experimental.pallas as pl

    del pl
    x = f_ref[:].astype(jnp.float32)
    lab = l_ref[:].astype(jnp.int32)
    prob = jax.nn.sigmoid(x) if apply_sigmoid else x
    pred = prob > cut_off
    valid = (lab >= 0) & (lab < 2)

    if selective:
        g = g_ref[:].astype(jnp.float32)
        gprob = jax.nn.sigmoid(g) if apply_sigmoid else g
        sel = gprob > s_cut_off
        count_mask = valid & sel
        rejects = jnp.sum((valid & jnp.logical_not(sel)).astype(jnp.float32))
    else:
        count_mask = valid
        rejects = jnp.float32(0.0)

    pos = lab == 1

    def s(m):
        return jnp.sum(m.astype(jnp.float32))

    cm00 = s(jnp.logical_not(pos) & jnp.logical_not(pred) & count_mask)
    cm01 = s(jnp.logical_not(pos) & pred & count_mask)
    cm10 = s(pos & jnp.logical_not(pred) & count_mask)
    cm11 = s(pos & pred & count_mask)
    nvalid = s(valid)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    partial = (
        jnp.where(lane == 0, cm00, 0.0)
        + jnp.where(lane == 1, cm01, 0.0)
        + jnp.where(lane == 2, cm10, 0.0)
        + jnp.where(lane == 3, cm11, 0.0)
        + jnp.where(lane == 4, rejects, 0.0)
        + jnp.where(lane == 5, nvalid, 0.0)
    )
    # Per-tile partials, NOT a running f32 accumulator: each partial is
    # <= TILE_ROWS*LANES = 65536, exact in float32; the caller integer-sums
    # the rows so counts stay exact for arbitrarily large batches (a running
    # f32 total would silently lose counts past 2^24 pixels per cell).
    #
    # The block is (1, 8, LANES) — Mosaic requires the last two block dims
    # divisible by (8, 128), so a bare (1, LANES) row per tile only lowers
    # when the grid has exactly one step. The partials live in sublane row 0;
    # rows 1-7 are zeros and drop out of the caller's sum.
    row = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    out_ref[:] = jnp.where(row == 0, partial, 0.0).reshape(1, 8, LANES)


@functools.partial(
    jax.jit,
    static_argnames=("apply_sigmoid", "selective", "cut_off", "s_cut_off", "interpret"),
)
def fused_eval_metrics(
    output: jax.Array,
    label: jax.Array,
    selection: Optional[jax.Array] = None,
    apply_sigmoid: bool = True,
    selective: bool = False,
    cut_off: float = 0.5,
    s_cut_off: float = 0.5,
    interpret: bool = False,
):
    """Fused binary eval metrics.

    Args:
        output: prediction logits/scores, any shape.
        label: int labels, same shape (PAD_LABEL marks padding).
        selection: selection logits/scores when ``selective``.
    Returns:
        dict(cm=(2, 2) int32, n_reject=int32, n_pix=int32) — identical
        semantics to the XLA path (thresholds strictly ``>`` like the
        reference's fn_classifier, eval.py:179).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f2, num_tiles = _flatten_pad(output.astype(jnp.float32), 0.0)
    l2, _ = _flatten_pad(label.astype(jnp.int32), PAD_LABEL)
    if selective:
        g2, _ = _flatten_pad(selection.astype(jnp.float32), 0.0)
    else:
        g2 = f2  # unused operand; keeps the kernel arity static

    kernel = functools.partial(
        _metrics_kernel,
        apply_sigmoid=apply_sigmoid,
        selective=selective,
        cut_off=cut_off,
        s_cut_off=s_cut_off,
    )
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, LANES), jnp.float32),
        interpret=interpret,
    )(f2, g2, l2)

    # integer-sum the exact per-tile partials (see kernel comment)
    tot = jnp.sum(out.astype(jnp.int32), axis=(0, 1))
    cm = jnp.stack([tot[0], tot[1], tot[2], tot[3]]).reshape(2, 2)
    return {
        "cm": cm,
        "n_reject": tot[4],
        "n_pix": tot[5],
    }
