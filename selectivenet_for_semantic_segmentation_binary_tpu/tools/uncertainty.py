"""MC stochastic-forward uncertainty.

The reference specifies only the aggregation math, in a numpy simulation
(jupyters/check_MC_dropout.ipynb cells 0-4): run N stochastic forwards, take
the per-element variance across repeats, average over the class axis, and
negate it as a confidence score. The reference model has no dropout layer
(model.py), so the feature was never wired up; here the models accept a
``dropout_rate`` (models/unet.py) and the whole pass — N forwards + variance
reduction — runs on device inside one jitted ``lax.map``.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp


def mc_uncertainty(
    model,
    variables: Dict,
    x: jax.Array,
    n_iter: int = 100,
    rng: jax.Array = None,
    selective: bool = False,
) -> Dict[str, jax.Array]:
    """Run ``n_iter`` MC-dropout forwards and aggregate.

    Args:
        model: a model built with dropout_rate > 0 (otherwise every repeat is
            identical and the variance is 0).
        variables: {'params', 'batch_stats'}.
        x: (N, H, W, C) input batch.
    Returns:
        {'mean_prob', 'variance', 'confidence'} — confidence is the negated
        class-averaged variance (check_MC_dropout.ipynb cell 4).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, n_iter)
    mean, var, conf = _mc_run(model, selective, variables, x, keys)
    return {"mean_prob": mean, "variance": var, "confidence": conf}


@partial(jax.jit, static_argnums=(0, 1))
def _mc_run(model, selective, variables, x, keys):
    """Module-level jit (model/selective static, arrays as arguments): a
    per-call closure would retrace and recompile the n_iter-forward program
    for every batch — the tools/wsi.py:_wsi_forward caching pattern."""
    def fwd(key):
        out = model.apply(
            variables, x, train=False, mc_dropout=True, rngs={"dropout": key}
        )
        if selective:
            out = out[0]
        if out.ndim == 3:  # binary logits -> (N, H, W, 1) prob
            return jax.nn.sigmoid(out)[..., None]
        return jax.nn.softmax(out, axis=-1)

    probs = jax.lax.map(fwd, keys)            # (T, N, H, W, C)
    mean = jnp.mean(probs, axis=0)
    var = jnp.var(probs, axis=0)              # per-element variance across repeats
    conf = -jnp.mean(var, axis=-1)            # mean over classes, negated
    return mean, var, conf
