"""On-device confusion-matrix accumulation.

The reference round-trips every batch to host numpy and runs a bincount there
(reference utils/compute_metric.py:10-26 driven from train.py:211-239) — a
device->host sync per step. Here the update is a tiny jitted reduction that
stays on the TPU and composes into the train/eval step, so one (C, C) array is
all that ever leaves the device.

Semantics match Evaluator._generate_matrix exactly:
  * pixels are counted iff ``0 <= label < num_class`` (this also makes padded
    pixels — labelled ``PAD_LABEL`` — drop out for free, which is how the
    static-shape final batch is handled on TPU);
  * in selective mode additionally ``selection == 1``;
  * bin index = num_class * label + pred, reshaped to (num_class, num_class)
    so rows are ground truth and columns are predictions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Label value used to pad partial batches up to the static batch size; any value
# outside [0, num_class) works because of the validity mask above.
PAD_LABEL = 255


def confusion_matrix_update(
    label: jax.Array,
    pred: jax.Array,
    num_class: int,
    selection: Optional[jax.Array] = None,
) -> jax.Array:
    """Return the (num_class, num_class) confusion-count matrix of one batch.

    Args:
        label: integer ground truth, any shape.
        pred: integer predictions, same shape.
        num_class: static class count.
        selection: optional 0/1 mask of the same shape; only pixels with
            selection == 1 are counted (in-coverage evaluation,
            compute_metric.py:17-18).
    """
    label = label.astype(jnp.int32)
    pred = pred.astype(jnp.int32)
    valid = (label >= 0) & (label < num_class)
    if selection is not None:
        valid = valid & (selection.astype(jnp.int32) == 1)

    # One-hot contraction instead of bincount: bincount lowers to a serialized
    # scatter-add on TPU (measured ~60 ms for a 128x256x256 batch); the
    # (Npix, C)^T @ (Npix, C) product rides the MXU and fuses with the one-hot
    # construction. f32 accumulation is exact only below 2^24 counts per cell
    # — an 8-chip global batch of 1024x256x256 background-dominated pixels
    # exceeds that — so the contraction runs in chunks of <= 2^22 pixels
    # (each chunk exact in f32) and the chunk results are summed in int32
    # (exact to 2^31 per call). Cross-batch accumulation stays float64 on the
    # host (utils/metrics.Evaluator).
    flat_lab = label.reshape(-1)
    flat_pred = pred.reshape(-1)
    flat_valid = valid.reshape(-1)
    total = flat_lab.shape[0]

    # cap the chunk at the (lane-rounded) batch size: a fixed 2^22 chunk
    # would pad a typical 16x256x256 eval batch (1M pixels) with 3.1M
    # invalid pixels and quadruple the one-hot/contraction work; any chunk
    # <= 2^22 keeps the f32 accumulation exact
    chunk = min(1 << 22, -(-total // 1024) * 1024)
    n_chunks = -(-total // chunk)
    padded = n_chunks * chunk
    if padded != total:
        # pad with invalid pixels (label outside [0, C)) that count nowhere
        flat_lab = jnp.concatenate(
            [flat_lab, jnp.full((padded - total,), PAD_LABEL, flat_lab.dtype)])
        flat_pred = jnp.concatenate(
            [flat_pred, jnp.zeros((padded - total,), flat_pred.dtype)])
        flat_valid = jnp.concatenate(
            [flat_valid, jnp.zeros((padded - total,), flat_valid.dtype)])

    def chunk_cm(args):
        lab, prd, val = args
        lab_oh = jax.nn.one_hot(lab, num_class, dtype=jnp.float32)
        lab_oh = lab_oh * val[:, None].astype(jnp.float32)
        pred_oh = jax.nn.one_hot(prd, num_class, dtype=jnp.float32)
        cm = jax.lax.dot_general(
            lab_oh, pred_oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return cm.astype(jnp.int32)

    cms = jax.lax.map(chunk_cm, (
        flat_lab.reshape(n_chunks, chunk),
        flat_pred.reshape(n_chunks, chunk),
        flat_valid.reshape(n_chunks, chunk),
    ))
    return jnp.sum(cms, axis=0, dtype=jnp.int32)
