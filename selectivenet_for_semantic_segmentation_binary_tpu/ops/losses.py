"""Segmentation losses and SelectiveNet coverage-constrained risks.

Functional JAX re-designs of the reference loss layer:

* ``bce_with_logits``        <- torch.nn.BCEWithLogitsLoss (reference train.py:78)
* ``softmax_cross_entropy``  <- torch.nn.CrossEntropyLoss  (reference train.py:80)
* ``selective_risk_b``       <- calc_selective_risk_image_b (selective_loss.py:58-85)
* ``selective_risk_ce``      <- calc_selective_risk_image   (selective_loss.py:24-56)
* ``make_one_hot``           <- make_one_hot                (selective_loss.py:6-22)

All functions are pure, shape-polymorphic, jit/grad/vmap-compatible, and reduce in
float32 regardless of the activation compute dtype (bf16 activations feed the MXU;
the scalar risk/coverage reductions must not lose precision).

Numerical-stability deviations from the reference (documented, results-identical
in exact arithmetic):

* the reference computes ``log(sigmoid(x))`` directly (selective_loss.py:79-80),
  which produces ``-inf`` for moderately negative logits in fp32; here
  ``log p = log_sigmoid(x)`` and ``log(1-p) = log_sigmoid(-x)``.

Data-parallel semantics: torch ``DataParallel`` gathers replica outputs to one
device and evaluates these losses on the *global* batch (reference
train.py:132-134), so ``coverage = mean(g)`` is a global-batch mean. Because
``risk / coverage`` is nonlinear, a per-shard loss + gradient-psum would change
the objective. Under ``jax.jit`` over a batch-sharded global array, ``jnp.mean``
*is* the global mean (XLA inserts the cross-chip reductions), so these functions
reproduce the reference objective on any mesh with zero extra code — see
parallel/mesh.py and tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Mean over all elements, or over mask==True elements when given.

    The mask exists for the TPU static-shape batching scheme: partial final
    batches are padded (data/loader.py) and padded pixels must not contribute
    to the loss — the reference never needs this because torch allows ragged
    final batches.
    """
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def bce_with_logits(
    logits: jax.Array, targets: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """Mean binary cross-entropy on logits (== torch BCEWithLogitsLoss).

    Uses the max(x,0) - x*y + log1p(exp(-|x|)) stable form.
    """
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    per_elem = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return _masked_mean(per_elem, mask)


def softmax_cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    class_axis: int = -1,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Mean softmax cross-entropy with integer targets (== torch CrossEntropyLoss).

    Args:
        logits: (..., C, ...) with the class dimension at ``class_axis``.
        targets: integer class indices with logits' shape minus the class axis.
        mask: optional validity mask of targets' shape (padded pixels excluded).
    """
    logits = jnp.moveaxis(logits.astype(jnp.float32), class_axis, -1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    n_cls = logits.shape[-1]
    safe_targets = jnp.clip(targets.astype(jnp.int32), 0, n_cls - 1)
    picked = jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    return -_masked_mean(picked, mask)


def make_one_hot(labels: jax.Array, num_classes: int) -> jax.Array:
    """(N, H, W) int -> (N, H, W, C) one-hot float32 (NHWC-native counterpart of
    reference selective_loss.py:6-22 which emits NCHW)."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def _coverage_constraint(coverage: jax.Array, target_coverage: float) -> jax.Array:
    """max(target_coverage - coverage, 0)^2 (selective_loss.py:51-52, 81-83)."""
    diff = jnp.maximum(target_coverage - coverage, 0.0)
    return jnp.square(diff)


def selective_risk_b(
    output: jax.Array,
    selection: jax.Array,
    target: jax.Array,
    target_coverage: float = 0.8,
    lamb: float = 8.0,
    hard_selection: bool = False,
    mask: Optional[jax.Array] = None,
):
    """SelectiveNet risk for binary segmentation with BCE (selective_loss.py:58-85).

    Args:
        output: prediction logits f, (N, H, W).
        selection: selection logits g, (N, H, W).
        target: binary labels y in {0,1}, (N, H, W).
    Returns:
        (loss, coverage) where
        ``g = sigmoid(selection)``; ``coverage = mean(g)``;
        ``risk = -mean((y log p + (1-y) log(1-p)) * g) / coverage`` with
        ``p = sigmoid(output)``; ``loss = risk + lamb * max(tc - coverage, 0)^2``.
    """
    x = output.astype(jnp.float32)
    y = target.astype(jnp.float32)
    if mask is not None:
        y = jnp.clip(y, 0.0, 1.0)  # padded labels carry PAD_LABEL; masked out below
    g = jax.nn.sigmoid(selection.astype(jnp.float32))
    coverage = _masked_mean(g, mask)

    if hard_selection:
        # reference selective_loss.py:74-77: detach then binarize at 0.5
        g = jax.lax.stop_gradient((g > 0.5).astype(jnp.float32))
        coverage = jax.lax.stop_gradient(coverage)

    # y*log(p) + (1-y)*log(1-p), stable: log p = log_sigmoid(x); log(1-p) = log_sigmoid(-x)
    log_lik = y * jax.nn.log_sigmoid(x) + (1.0 - y) * jax.nn.log_sigmoid(-x)
    risk = -_masked_mean(log_lik * g, mask) / coverage
    loss = risk + lamb * _coverage_constraint(coverage, target_coverage)
    return loss, coverage


def selective_risk_ce(
    output: jax.Array,
    selection: jax.Array,
    target: jax.Array,
    target_coverage: float = 0.8,
    lamb: float = 8.0,
    hard_selection: bool = False,
    mask: Optional[jax.Array] = None,
):
    """SelectiveNet risk for N-class segmentation with CE (selective_loss.py:24-56).

    NHWC layout (the reference is NCHW; only the class-axis position differs).

    Args:
        output: prediction logits f, (N, H, W, C).
        selection: selection logits, (N, H, W, 2); ``g = softmax(selection)[..., 1]``.
        target: either (N, H, W) int labels or (N, H, W, C) one-hot.
    Returns:
        (loss, coverage).
    """
    f = output.astype(jnp.float32)
    if target.ndim == 3:
        if mask is not None:
            target = jnp.clip(target, 0, f.shape[-1] - 1)  # padded labels masked below
        target = make_one_hot(target, f.shape[-1])
    target = target.astype(jnp.float32)

    g = jax.nn.softmax(selection.astype(jnp.float32), axis=-1)[..., 1]
    coverage = _masked_mean(g, mask)

    if hard_selection:
        g = jax.lax.stop_gradient((g > 0.5).astype(jnp.float32))
        coverage = jax.lax.stop_gradient(coverage)

    nll = jnp.sum(jax.nn.log_softmax(f, axis=-1) * target, axis=-1)  # (N,H,W)
    risk = -_masked_mean(nll * g, mask) / coverage
    loss = risk + lamb * _coverage_constraint(coverage, target_coverage)
    return loss, coverage
