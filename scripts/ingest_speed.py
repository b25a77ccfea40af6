"""Measure the uint8 serving ingest: host-numpy -> device throughput.

The production Predictor serves from HOST-resident images (HTTP decode,
CLI file decode). Before round 4's ingest change that path shipped float32
(~96 MB per 128x256x256x3 batch); with ops/ingest.py the same pixels ship
as uint8 (24 MB) and /255 + (x-0.5)/0.5 fuse into the jitted forward.

Methodology: the axon tunnel's per-call latency drifts by seconds over
minutes, so sequential A-then-B blocks are confounded (a first cut of this
probe measured "0.999x" that way). This probe INTERLEAVES the float32 and
uint8 cells cycle by cycle and reports per-cell medians, plus a bare
jax.device_put H2D timing so the transfer term is visible on its own.

Two latency views per dtype:
  * logits+sync — submit the batch, force one scalar D2H: the host-blocking
    time a pipelined server pays per batch (transfers overlap compute for
    the next batch);
  * predict     — logits + full prob/pred map materialization on host: the
    synchronous single-client round trip.

Run (real TPU):
    python scripts/ingest_speed.py --ckpt <model_epoch{N}.ckpt> [--cycles 4]

Output: one line per cell + a JSON summary line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median(ts):
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--selective", type=lambda s: s not in ("0", "False"),
                    default=True)
    ap.add_argument("--quantize", choices=["none", "int8"], default="none")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--patch_size", type=int, default=256)
    ap.add_argument("--cycles", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from selectivenet_for_semantic_segmentation_binary_tpu.predictor import (
        Predictor,
    )

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    B, P = args.batch_size, args.patch_size
    u8 = rng.integers(0, 256, (B, P, P, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    cells = (("f32", f32), ("u8", u8))

    # bare transfer: device_put + force completion with a scalar fetch
    def h2d(x):
        d = jax.device_put(x)
        float(jnp.sum(d[0, 0, 0].astype(jnp.float32)))

    for name, imgs in cells:
        h2d(imgs)  # warm
        ts = []
        for _ in range(args.cycles):
            t0 = time.perf_counter()
            h2d(imgs)
            ts.append(time.perf_counter() - t0)
        print(f"H2D {name:>3} ({imgs.nbytes / 2**20:5.1f} MB): med "
              f"{median(ts) * 1e3:8.1f} ms", flush=True)

    p = Predictor(args.ckpt, selective=args.selective,
                  compute_dtype="bfloat16", quantize=args.quantize,
                  calibration_images=(f32[:8] if args.quantize == "int8"
                                      else None))

    def logits_sync(imgs):
        out = p.logits(imgs)
        leaf = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(leaf.astype(jnp.float32)))

    results = {}
    for label, fn in (("logits", logits_sync), ("predict", p.predict)):
        for _, imgs in cells:  # compile + warm both dtype programs
            fn(imgs)
        times = {name: [] for name, _ in cells}
        for _ in range(args.cycles):  # interleave dtypes within each cycle
            for name, imgs in cells:
                t0 = time.perf_counter()
                fn(imgs)
                times[name].append(time.perf_counter() - t0)
        for name, _ in cells:
            med = median(times[name])
            results[f"{label}/{name}"] = B / med
            print(f"{label:>7} {name:>3}: med {med * 1e3:8.1f} ms "
                  f"({B / med:7.1f} patches/s)  "
                  f"all {[round(t * 1e3) for t in times[name]]}", flush=True)
        ratio = median(times["f32"]) / median(times["u8"])
        print(f"{label:>7} u8 speedup (median): {ratio:.2f}x", flush=True)

    print(json.dumps({"batch": B, "patch": P, "cycles": args.cycles,
                      "quantize": args.quantize,
                      "patches_per_s": {k: round(v, 1)
                                        for k, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
