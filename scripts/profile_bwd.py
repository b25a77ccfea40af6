"""Profile the classic trunk's full train-step backward: where do the
~77 ms over the 2x-forward conv ideal sit? Groups device ops by kind."""

import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

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

N, P = 128, 256
TRACE = "/tmp/trace_step"


def profile_step():
    cfg = TrainConfig(model_arch="UNet_B", selective=True, loss="BCElogit",
                      patch_size=P, batch_size=N, compute_dtype="bfloat16")
    mesh = make_mesh()
    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
    tx = build_optimizer(cfg)
    state = replicate(create_state(cfg, model, tx, jax.random.PRNGKey(0)), mesh)
    step = make_train_step(model, cfg, tx)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N, P, P, 3)).astype(np.float32)
    y = (rng.random((N, P, P)) > 0.7).astype(np.int32)
    batch = shard_batch({"input": x, "label": y}, mesh)
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        state, m = step(state, batch, 1e-3, key)
    float(m["loss"])
    jax.profiler.start_trace(TRACE)
    for _ in range(3):
        state, m = step(state, batch, 1e-3, key)
    float(m["loss"])
    jax.profiler.stop_trace()


def classify(name: str) -> str:
    if "convolution" in name or "conv" in name and "fusion" not in name:
        return "conv"
    if "convert_reduce_fusion" in name or ("reduce" in name and "fusion" in name):
        return "reduce-fusion (BN stats/bwd)"
    if "select-and-scatter" in name:
        return "pool-grad"
    if "reverse" in name:
        return "convT-grad reverse"
    if "copy-start" in name or "copy-done" in name or "slice-start" in name \
            or "slice-done" in name or "copy." in name:
        return "async copies"
    if "fusion" in name:
        return "other fusions"
    if "all-reduce" in name or "psum" in name:
        return "collectives"
    return "other"


def summarize(top=20):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{TRACE}/**/*.xplane.pb", recursive=True)
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(files)[-1], "rb").read())
    per_op = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                per_op[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
    groups = defaultdict(float)
    for name, ms in per_op.items():
        groups[classify(name)] += ms
    total = sum(per_op.values())
    print(f"total XLA-op time (3 steps, incl. async overlap): {total:.0f} ms")
    for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {ms/3:8.2f} ms/step  {100*ms/total:5.1f}%  {g}")
    print("\ntop individual non-copy ops (ms per step):")
    items = [(n, ms) for n, ms in per_op.items()
             if classify(n) not in ("async copies",)]
    for name, ms in sorted(items, key=lambda kv: -kv[1])[:top]:
        print(f"  {ms/3:8.2f}  {name[:130]}")


if __name__ == "__main__":
    os.system(f"rm -rf {TRACE}")
    profile_step()
    summarize()
