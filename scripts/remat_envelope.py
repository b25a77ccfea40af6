#!/usr/bin/env python3
"""Measure the huge-patch training envelope with and without --remat (one cell).

Round-3 shipped `--remat` (train_lib.py:253-257) as the activation-memory
relief for training patches too large for one chip's HBM, companion to
`--sp_ways`. This script converts that claim into a measurement: for a given
(patch, batch) cell it builds the flagship selective UNet_B train step
(bf16 compute, BCElogit selective risk, Adam — the reference train.sh:1
recipe scaled up in patch size) with remat on or off, runs it on the real
chip, and prints ONE JSON line:

    {"patch": P, "batch": N, "remat": bool, "ok": bool,
     "patches256_per_sec": float | null, "loss": float (ok cells only),
     "error": str | null}

patches256_per_sec is pixel throughput normalized to 256x256-patch
equivalents (pixels/s / 256^2) so cells of different patch sizes compare
directly against the 473 p/s @ 256px floor.

Usage: python scripts/remat_envelope.py PATCH BATCH REMAT(0|1)

Run each cell in a FRESH process (driver loop below): an OOM can leave the
tunnel client's device claim dirty, and the client leaks host RSS per
session (CLAUDE.md hazards).

    for cell in "1024 8 0" "1024 8 1" ...; do
        python scripts/remat_envelope.py $cell >> /tmp/remat_envelope.log
    done
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


WARMUP = 2
TIMED = 6


def run_cell(patch: int, batch: int, remat: bool) -> dict:
    from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
    from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
    from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
    from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_batch,
    )
    from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
        create_state,
        make_train_step,
    )

    cfg = TrainConfig(
        model_arch="UNet_B", selective=True, loss="BCElogit", s_lamb=2.0,
        patch_size=patch, batch_size=batch, compute_dtype="bfloat16",
        remat=remat,
    )
    mesh = make_mesh()
    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
    tx = build_optimizer(cfg)
    state = replicate(create_state(cfg, model, tx, jax.random.PRNGKey(0)), mesh)
    step = make_train_step(model, cfg, tx)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, patch, patch, 3)).astype(np.float32)
    y = (rng.random((batch, patch, patch)) > 0.7).astype(np.int32)
    batch_d = shard_batch({"input": x, "label": y}, mesh)
    key = jax.random.PRNGKey(0)

    for _ in range(WARMUP):
        state, metrics = step(state, batch_d, 1e-3, key)
    # axon tunnel: block_until_ready returns early; a scalar fetch is the
    # only real synchronization (CLAUDE.md hazards).
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(TIMED):
        state, metrics = step(state, batch_d, 1e-3, key)
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0

    pix_per_sec = batch * patch * patch * TIMED / dt
    return {
        "patch": patch, "batch": batch, "remat": remat, "ok": True,
        "patches256_per_sec": round(pix_per_sec / (256 * 256), 2),
        "loss": round(loss, 5), "error": None,
    }


def main() -> None:
    patch, batch, remat = int(sys.argv[1]), int(sys.argv[2]), bool(int(sys.argv[3]))
    try:
        out = run_cell(patch, batch, remat)
    except Exception as e:  # OOM is data, not failure: record and move on
        msg = f"{type(e).__name__}: {e}"
        out = {
            "patch": patch, "batch": batch, "remat": remat, "ok": False,
            "patches256_per_sec": None,
            "error": msg[:400],
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
