#!/usr/bin/env python3
"""QAT int8 training convergence vs the bf16 parity recipe (round-5 plan #1).

Trains fold 1 of the camo'd hard-synthetic task (the round-4 ordering
artifact's regime: Adam 1e-3, BCElogit selective --s_lamb 2, batch 128,
256px, 20 epochs) twice through the public sweep harness — the bf16 parity
step and ``--train_quant int8`` (int8 W8A8 forward convs + bf16
straight-through backward, models/unet.py int8_ste_conv) — and reports the
in-coverage test metrics side by side. Pair with scripts/qat_speed.py (step
throughput) for the full docs/RESULTS.md row.

Each cell runs in a fresh child process (isolate_cells: the tunnel client
leaks ~10 GB RSS per train+eval sweep cell, CLAUDE.md) and auto-resumes, so
re-running after a kill costs nothing.

    python scripts/qat_convergence.py --workdir /tmp/qat_conv
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selectivenet_for_semantic_segmentation_binary_tpu.data import (  # noqa: E402
    write_hard_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep import (  # noqa: E402
    Variant,
    run_sweep,
)

TRAIN_KW = dict(
    model_arch="UNet_B", loss="BCElogit", s_lamb=2.0, lr=1e-3, optim="Adam",
    batch_size=128, patch_size=256, n_epoch=20, num_workers=16, seed=42,
    selective=True,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/qat_conv")
    ap.add_argument("--folds", type=int, nargs="+", default=[1])
    ap.add_argument("--n_epoch", type=int, default=TRAIN_KW["n_epoch"])
    args = ap.parse_args()
    TRAIN_KW["n_epoch"] = args.n_epoch
    os.makedirs(args.workdir, exist_ok=True)

    data_dir = os.path.join(args.workdir, "data")
    if not os.path.isdir(os.path.join(data_dir, "200x_256")):
        print("generating camo'd hard synthetic dataset (600 patches) ...",
              flush=True)
        write_hard_synthetic_patch_tree(
            data_dir, n_slides=6, patches_per_slide=100, patch_size=256,
            seed=0)

    rows = run_sweep(
        data_dir, os.path.join(args.workdir, "model"), folds=args.folds,
        variants=[Variant("bf16"),
                  Variant("qat_int8", train_kw={"train_quant": "int8"})],
        train_overrides=TRAIN_KW,
        eval_overrides=dict(select_eval=True),
        select_overrides=dict(select_eval=False),
        save_dir=args.workdir, isolate_cells=True,
    )

    summary = {}
    for r in rows:
        if r["fold"] == "mean":
            continue
        summary.setdefault(r["variant"], {})[r["fold"]] = {
            "best_epoch": r["best_epoch"],
            "in_coverage_accuracy": round(float(r["accuracy"]), 4),
            "in_coverage_mIoU": round(float(r["mIoU"]), 4),
            "rejection_ratio": round(float(r.get("rejection_ratio", 0.0)), 4),
        }
    print("QAT_CONVERGENCE " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
