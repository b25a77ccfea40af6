#!/usr/bin/env python3
"""Component-level performance bisection of the train step on the real TPU.

Times (with forced D2H fetch; see CLAUDE.md on block_until_ready):
  * forward, train mode
  * forward+backward of the full loss
  * full train step
  * forward+backward variants: no-BN (folded-style trunk), fp32 compute,
    eval-mode forward (running stats), encoder-only grad
so backward-pass overheads can be attributed. Run when investigating the
~27% backward gap documented in docs/RESULTS.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
    _losses,
    create_state,
    make_train_step,
)

B, P = 128, 256


def timeit(f, *args, n=10):
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)) * 0)  # sync (fetch, not block)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)) * 0)
    return (time.perf_counter() - t0) / n


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((B, P, P, 3)).astype(np.float32))
    y_int = jax.device_put((rng.random((B, P, P)) > 0.7).astype(np.int32))
    y = y_int.astype(jnp.float32)

    dtypes = {"fwd": ["bfloat16"], "bwd": ["bfloat16"], "full": ["bfloat16"],
              "fwd32": ["float32"], "bwd32": ["float32"], "nobn": []}.get(mode, ["bfloat16"])
    for dtype in dtypes:
        cfg = TrainConfig(model_arch="UNet_B", selective=True, loss="BCElogit",
                          s_lamb=2.0, patch_size=P, batch_size=B, compute_dtype=dtype)
        model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, dtype)
        tx = build_optimizer(cfg)
        state = create_state(cfg, model, tx, jax.random.PRNGKey(0))

        t_fwd = t_bwd = t_full = float("nan")
        if mode in ("fwd", "fwd32", "all"):
            fwd = jax.jit(lambda p, s: model.apply(
                {"params": p, "batch_stats": s}, x, train=True, mutable=["batch_stats"]))
            t_fwd = timeit(fwd, state.params, state.batch_stats)

        def lossfn(p, s):
            outs, _ = model.apply({"params": p, "batch_stats": s}, x,
                                  train=True, mutable=["batch_stats"])
            loss, _, _, _ = _losses(cfg, outs, y)
            return loss

        if mode in ("bwd", "bwd32", "all"):
            t_bwd = timeit(jax.jit(jax.grad(lossfn)), state.params, state.batch_stats)

        if mode in ("full", "all"):
            step = make_train_step(model, cfg, tx)
            st = state
            st, m = step(st, {"input": x, "label": y_int}, 1e-3, jax.random.PRNGKey(0))
            float(m["loss"])
            t0 = time.perf_counter()
            for _ in range(10):
                st, m = step(st, {"input": x, "label": y_int}, 1e-3, jax.random.PRNGKey(0))
            float(m["loss"])
            t_full = (time.perf_counter() - t0) / 10

        print(f"[{dtype}] fwd {t_fwd*1e3:.1f} ms | fwd+bwd {t_bwd*1e3:.1f} ms "
              f"| full {t_full*1e3:.1f} ms | {B/t_full:.0f} patches/s")

    if mode not in ("nobn", "all"):
        return
    # no-BN (folded) forward/backward: how much of the time is BatchNorm?
    cfg = TrainConfig(model_arch="UNet_B", selective=True, loss="BCElogit",
                      patch_size=P, batch_size=B, compute_dtype="bfloat16")
    fmodel = build_model("UNet_B", selective=True, compute_dtype="bfloat16", folded=True)
    fvars = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, P, P, 3)), train=False)

    ffwd = jax.jit(lambda p: fmodel.apply({"params": p}, x, train=False))
    t_ffwd = timeit(ffwd, fvars["params"])

    def floss(p):
        outs = fmodel.apply({"params": p}, x, train=False)
        loss, _, _, _ = _losses(cfg, outs, y)
        return loss

    t_fbwd = timeit(jax.jit(jax.grad(floss)), fvars["params"])
    print(f"[no-BN bf16] fwd {t_ffwd*1e3:.1f} ms | fwd+bwd {t_fbwd*1e3:.1f} ms")


if __name__ == "__main__":
    main()
