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

    idx = num_class * label + pred
    # route invalid pixels to an overflow bin that is sliced away
    idx = jnp.where(valid, idx, num_class * num_class)
    counts = jnp.bincount(idx.reshape(-1), length=num_class * num_class + 1)
    return counts[: num_class * num_class].reshape(num_class, num_class)
