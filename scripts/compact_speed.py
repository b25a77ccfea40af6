"""Measure predict_compact vs predict: the output-transfer lever.

After round 4's uint8 ingest, the SYNCHRONOUS serving round trip is
output-transfer-bound (docs/RESULTS.md): predict() runs sigmoid eagerly on
device, ships the bf16 prob (+ selection_prob) planes D2H — 4 bytes/pixel
for the selective head (2 for non-selective) — and thresholds on the host.
Predictor.predict_compact fuses sigmoid/threshold/quantize into the jitted
forward and ships uint8 planes: with want_prob=True the byte count MATCHES
predict's (4 uint8 planes vs 2 bf16 planes) and the win comes from the fused
on-device postprocess + single dispatch; masks-only (want_prob=False) halves
the D2H on top (2 uint8 planes; 1 for non-selective).

Methodology: identical to scripts/ingest_speed.py — the axon tunnel's
per-call latency drifts by seconds over minutes, so sequential A-then-B
blocks are confounded; this probe INTERLEAVES the full-precision and compact
cells cycle by cycle and reports per-cell medians of the synchronous
round-trip (submit -> all host numpy arrays materialized).

Run (real TPU):
    python scripts/compact_speed.py [--ckpt model_epoch{N}.ckpt] [--cycles 6]

Without --ckpt a random-init selective UNet_B checkpoint is created in a
temp dir (timing does not depend on the weights' values).

Output: one line per cell + a JSON summary line.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def median(ts):
    return sorted(ts)[len(ts) // 2]


def make_random_ckpt(workdir: str, selective: bool = True) -> str:
    import jax
    import jax.numpy as jnp

    from selectivenet_for_semantic_segmentation_binary_tpu.models import (
        build_model,
    )
    from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
        save_checkpoint,
    )

    model = build_model("UNet_B", selective=selective, compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    variables = jax.device_get(variables)
    save_checkpoint(workdir, {"net": {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }, "epoch": 1}, 1)
    return os.path.join(workdir, "model_epoch1.ckpt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--selective", type=lambda s: s not in ("0", "False"),
                    default=True)
    ap.add_argument("--quantize", choices=["none", "int8"], default="none")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--patch_size", type=int, default=256)
    ap.add_argument("--cycles", type=int, default=6)
    args = ap.parse_args()

    import jax

    from selectivenet_for_semantic_segmentation_binary_tpu.predictor import (
        Predictor,
    )

    print(f"devices: {jax.devices()}", flush=True)
    ckpt = args.ckpt or make_random_ckpt(tempfile.mkdtemp(prefix="compact_"),
                                         selective=args.selective)

    p = Predictor(ckpt, selective=args.selective, quantize=args.quantize)
    rng = np.random.default_rng(0)
    B, P = args.batch_size, args.patch_size
    u8 = rng.integers(0, 256, (B, P, P, 3), dtype=np.uint8)

    def run_full():
        out = p.predict(u8)
        # predict() already returns host numpy; touch to be explicit
        return out["pred"][0, 0, 0]

    def run_compact():
        out = p.predict_compact(u8)
        return out["pred"][0, 0, 0]

    def run_masks():
        out = p.predict_compact(u8, want_prob=False)
        return out["pred"][0, 0, 0]

    cells = (("full", run_full), ("compact", run_compact),
             ("masks", run_masks))
    for _, fn in cells:  # warm both compiled programs before any timing
        fn()
        fn()

    times = {name: [] for name, _ in cells}
    for c in range(args.cycles):
        for name, fn in cells:  # interleave: tunnel drift hits both equally
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
        print(f"cycle {c}: " + "  ".join(
            f"{n} {times[n][-1] * 1e3:7.1f} ms" for n, _ in cells), flush=True)

    med = {n: median(ts) for n, ts in times.items()}
    px = B * P * P
    planes = 2 if args.selective else 1
    summary = {
        "metric": "predict_sync_roundtrip",
        "batch": [B, P, P, 3],
        "quantize": args.quantize,
        "full_ms": round(med["full"] * 1e3, 1),
        "compact_ms": round(med["compact"] * 1e3, 1),
        "masks_ms": round(med["masks"] * 1e3, 1),
        "compact_speedup_x": round(med["full"] / med["compact"], 3),
        "masks_speedup_x": round(med["full"] / med["masks"], 3),
        "full_patches_per_s": round(B / med["full"], 1),
        "compact_patches_per_s": round(B / med["compact"], 1),
        "masks_patches_per_s": round(B / med["masks"], 1),
        # full: bf16 prob planes D2H + host threshold; compact (want_prob):
        # prob_u8 + mask planes — same byte count as full; masks-only: half
        "d2h_bytes_full": px * 2 * planes,
        "d2h_bytes_compact": px * 2 * planes,
        "d2h_bytes_masks": px * planes,
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
