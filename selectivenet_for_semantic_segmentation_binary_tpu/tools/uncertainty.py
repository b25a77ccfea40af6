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

    @jax.jit
    def run(keys):
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

    mean, var, conf = run(keys)
    return {"mean_prob": mean, "variance": var, "confidence": conf}
