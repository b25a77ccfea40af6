"""Measure QAT int8 training (--train_quant int8) vs the bf16 parity step.

The last unmeasured perf lever class (docs/ROADMAP.md: every parity-math
lever is measured-negative; int8/fp8 QUANTIZED TRAINING is the named
exception because it breaks exact parity). Round 4 proved the serving-side
int8 machinery wins 1.27x; this probe records the training-side number:
the same selective UNet_B train step with trunk convs running
int8 W8A8 forward (dynamic absmax scales) + bf16 straight-through backward
(models/unet.py int8_ste_conv).

Methodology: identical to scripts/ingest_speed.py / compact_speed.py — the
axon tunnel's latency drifts by seconds over minutes, so the bf16 and QAT
cells are INTERLEAVED cycle by cycle and per-cell medians reported. Each
timing fetches a scalar from the last step's metrics (block_until_ready
returns early on the tunnel, CLAUDE.md).

Run (real TPU):
    python scripts/qat_speed.py [--batch_size 128] [--cycles 5] [--steps 10]

Output: one line per cycle + a JSON summary line.
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
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--cycles", type=int, default=5)
    ap.add_argument("--steps", type=int, default=10,
                    help="train steps per timed cell")
    args = ap.parse_args()

    import jax

    import bench

    print(f"devices: {jax.devices()}", flush=True)

    cells = {}
    for name, tq in (("bf16", "none"), ("qat_int8", "int8")):
        state, step, batch, mesh = bench.build_step(args.batch_size,
                                                    train_quant=tq)
        cells[name] = {"state": state, "step": step, "batch": batch}

    rng = jax.random.PRNGKey(0)

    def run_cell(c, n):
        state = c["state"]
        for _ in range(n):
            state, metrics = c["step"](state, c["batch"], 1e-3, rng)
        c["state"] = state
        return float(metrics["loss"])  # scalar fetch = the only real sync

    for c in cells.values():  # warm both compiled programs before timing
        run_cell(c, 2)

    times = {n: [] for n in cells}
    losses = {}
    for cyc in range(args.cycles):
        for name, c in cells.items():
            t0 = time.perf_counter()
            losses[name] = run_cell(c, args.steps)
            times[name].append(time.perf_counter() - t0)
        print(f"cycle {cyc}: " + "  ".join(
            f"{n} {times[n][-1] / args.steps * 1e3:7.1f} ms/step"
            for n in cells), flush=True)

    med = {n: median(ts) / args.steps for n, ts in times.items()}
    pps = {n: args.batch_size / m for n, m in med.items()}
    summary = {
        "metric": "qat_train_step",
        "batch": args.batch_size,
        "patch": bench.PATCH,
        "bf16_ms_per_step": round(med["bf16"] * 1e3, 1),
        "qat_int8_ms_per_step": round(med["qat_int8"] * 1e3, 1),
        "bf16_patches_per_s": round(pps["bf16"], 1),
        "qat_int8_patches_per_s": round(pps["qat_int8"], 1),
        "qat_speedup_x": round(pps["qat_int8"] / pps["bf16"], 3),
        "final_losses": {n: round(v, 5) for n, v in losses.items()},
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
