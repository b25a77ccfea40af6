"""Profile the fused vs classic trunk forward and dump the device-op
breakdown from the xplane trace (round-1 recipe: tensorflow tsl protos)."""

import glob
import gzip
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model

N, P = 128, 256


def profile_fwd(fused: bool, trace_dir: str):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, P, P, 3)), jnp.float32)
    model = build_model("UNet_B", selective=True, compute_dtype="bfloat16",
                        fused=fused)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)

    @jax.jit
    def fwd(params, stats, x):
        out, mut = model.apply({"params": params, "batch_stats": stats},
                               x, train=True, mutable=["batch_stats"])
        return out[0]

    params, stats = variables["params"], variables["batch_stats"]
    r = fwd(params, stats, x)
    float(jnp.sum(r))
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        r = fwd(params, stats, x)
    float(jnp.sum(r))
    jax.profiler.stop_trace()


def summarize(trace_dir: str, top: int = 25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {trace_dir}"
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(files)[-1], "rb").read())
    tot = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name:
                # device op line names vary; accept op-level lines only
                pass
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[(line.name, name)] += ev.duration_ps / 1e9  # ms
    # aggregate per op name on op lines
    per_op = defaultdict(float)
    for (line, name), ms in tot.items():
        if "XLA Ops" in line:
            per_op[name] += ms
    items = sorted(per_op.items(), key=lambda kv: -kv[1])[:top]
    total = sum(per_op.values())
    print(f"total device op time: {total:.1f} ms (3 steps)")
    for name, ms in items:
        print(f"  {ms:8.2f} ms  {100*ms/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("classic", "both"):
        d = "/tmp/trace_classic"
        os.system(f"rm -rf {d}")
        profile_fwd(False, d)
        print("=== classic forward ===")
        summarize(d)
    if which in ("fused", "both"):
        d = "/tmp/trace_fused"
        os.system(f"rm -rf {d}")
        profile_fwd(True, d)
        print("=== fused forward ===")
        summarize(d)
