#!/usr/bin/env python3
"""Round-1 follow-up probes: profiler availability + batch-size frontier."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
    create_state,
    make_train_step,
)

P = 256


def time_batch(B: int) -> float:
    cfg = TrainConfig(model_arch="UNet_B", selective=True, loss="BCElogit",
                      patch_size=P, batch_size=B, compute_dtype="bfloat16")
    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
    tx = build_optimizer(cfg)
    state = create_state(cfg, model, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg, tx)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((B, P, P, 3)).astype(np.float32))
    y = jax.device_put((rng.random((B, P, P)) > 0.7).astype(np.int32))
    batch = {"input": x, "label": y}
    k = jax.random.PRNGKey(0)
    for _ in range(3):
        state, m = step(state, batch, 1e-3, k)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(15):
        state, m = step(state, batch, 1e-3, k)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 15
    del state, step, batch, x, y
    return B / dt


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "batch"
    if which == "profile":
        try:
            jax.profiler.start_trace("/tmp/jaxtrace")
            v = time_batch(64)
            jax.profiler.stop_trace()
            n_files = sum(len(f) for _, _, f in os.walk("/tmp/jaxtrace"))
            print(f"profile: ok, {n_files} files under /tmp/jaxtrace, {v:.0f} p/s")
        except Exception as e:
            print(f"profile: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    for B in (160, 192):
        try:
            v = time_batch(B)
            print(f"batch {B}: {v:.0f} patches/s")
        except Exception as e:
            print(f"batch {B}: failed {type(e).__name__}: {str(e)[:120]}")
            break


if __name__ == "__main__":
    main()
