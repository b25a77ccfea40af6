"""Online-serving benchmark: PredictionService latency/throughput on the chip.

Measures the snet-serve micro-batcher (tools/serve.py) end to end —
enqueue -> batcher grouping -> occupancy-bucket padding -> BN-folded bf16
forward -> per-request crop/gather — with pre-decoded arrays, at several
client concurrency levels. This isolates the serving stack + device from the
host JPEG decode (which on this 1-core host caps any HTTP pipeline at ~170
patches/s regardless of the server; docs/SERVING.md).

Timing is honest under the axon tunnel: predict_one returns gathered numpy
arrays, so every sample includes the D2H fetch (CLAUDE.md hazard: bare
block_until_ready returns early here).

Usage:
  python scripts/bench_online_serving.py --model_path CKPT --selective 1 \
      --size 256 --n 40 --concurrency 1 2 4 8 --max_batch 8

Prints one JSON line per concurrency level.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

# runnable from any cwd, like the other scripts/*
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--model_arch", default="UNet_B")
    p.add_argument("--selective", type=int, default=1)
    p.add_argument("--compute_dtype", default="bfloat16")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n", type=int, default=40,
                   help="requests per client thread")
    p.add_argument("--concurrency", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--batch_window_ms", type=float, default=5.0)
    args = p.parse_args()

    from selectivenet_for_semantic_segmentation_binary_tpu.predictor import (
        Predictor,
    )
    from selectivenet_for_semantic_segmentation_binary_tpu.tools.serve import (
        PredictionService,
    )

    predictor = Predictor(args.model_path, model_arch=args.model_arch,
                          selective=bool(args.selective),
                          compute_dtype=args.compute_dtype)
    service = PredictionService(predictor, max_batch=args.max_batch,
                                batch_window_ms=args.batch_window_ms)
    rng = np.random.default_rng(0)
    img = rng.random((args.size, args.size, 3)).astype(np.float32)

    print(f"warmup (compiles every occupancy bucket up to {args.max_batch})...",
          flush=True)
    t0 = time.monotonic()
    service.warmup(args.size, args.size, 3)
    print(f"warmup {time.monotonic() - t0:.1f}s", flush=True)

    for conc in args.concurrency:
        lat: list = [[] for _ in range(conc)]

        def client(i):
            for _ in range(args.n):
                t = time.monotonic()
                service.predict_one(img)
                lat[i].append(time.monotonic() - t)

        # reset stats per level so occupancy reflects this level only
        with service._stats_lock:
            service.stats.n_requests = service.stats.n_batches = 0
            service.stats.occupancy_sum = service.stats.padded_sum = 0

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(conc)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0
        all_lat = sorted(x for per in lat for x in per)
        n_total = len(all_lat)
        stats = service.stats.as_dict()
        print(json.dumps({
            "concurrency": conc,
            "requests": n_total,
            "throughput_req_s": round(n_total / wall, 2),
            "p50_ms": round(all_lat[n_total // 2] * 1e3, 2),
            "p99_ms": round(all_lat[min(n_total - 1, int(n_total * 0.99))] * 1e3, 2),
            "mean_occupancy": round(stats["mean_occupancy"], 2),
            "mean_padded_batch": round(stats["mean_padded_batch"], 2),
        }), flush=True)

    service.close()


if __name__ == "__main__":
    main()
