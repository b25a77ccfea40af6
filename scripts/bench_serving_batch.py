#!/usr/bin/env python3
"""Serving batch-size sweep on the real TPU.

docs/RESULTS.md records the BN-folded serving graph at batch 128 only
(61.5 ms = 2082 patches/s/chip = ~152 TF/s effective of the ~73 GFLOP/patch
forward). Forward-only has no saved-activation pressure, so larger batches
fit where training OOMs at 256 — this sweeps the per-chip serving batch to
find whether the remaining ~12% to the measured 170 TF/s sustained matmul
rate is batch-amortizable.

Usage: python scripts/bench_serving_batch.py [batch ...]   (default sweep)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.ops.fold_bn import (
    fold_batchnorm,
)

P = 256


def main() -> None:
    batches = [int(a) for a in sys.argv[1:]] or [128, 192, 256, 384, 512]
    rng = np.random.default_rng(0)

    model = build_model("UNet_B", selective=True, compute_dtype="bfloat16")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, P, P, 3), jnp.float32), train=False)
    serving = build_model("UNet_B", selective=True, compute_dtype="bfloat16",
                          folded=True)
    folded = jax.device_put(fold_batchnorm(variables))  # host-folded (RESULTS)

    @jax.jit
    def fwd(folded, x):
        return serving.apply(folded, x, train=False)

    for b in batches:
        x = jax.device_put(
            rng.standard_normal((b, P, P, 3)).astype(np.float32))
        try:
            out = fwd(folded, x)
            float(jnp.sum(out[0].astype(jnp.float32)))  # sync via fetch
            t0 = time.perf_counter()
            for _ in range(10):
                out = fwd(folded, x)
            float(jnp.sum(out[0].astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / 10
            print(f"batch {b:4d}: {dt * 1e3:7.2f} ms  "
                  f"{b / dt:8.1f} patches/s/chip", flush=True)
        except Exception as e:  # noqa: BLE001 — OOM: record and continue
            print(f"batch {b:4d}: FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
