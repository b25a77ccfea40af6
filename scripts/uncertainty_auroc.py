#!/usr/bin/env python3
"""Does MC-dropout variance actually discriminate error? (round-5 plan #3)

Round 4 shipped the mechanics (`snet-predict --uncertainty N`); the verdict's
open question is statistical: on a net TRAINED with dropout, does the
per-pixel MC variance separate mis-segmented pixels from correct ones?
This driver produces that artifact:

1. trains fold 1 of the camo'd hard-synthetic task with ``--dropout_rate
   DROPOUT`` (selective recipe otherwise unchanged; 20 epochs, valid-split
   best epoch via the public sweep harness, isolated cells);
2. runs the test fold through ``Predictor.predict_with_uncertainty``
   (n_iter stochastic forwards, batched);
3. reports, over all test pixels:
   * AUROC of variance against mis-segmentation (MC-mean pred != label) —
     the headline discrimination number;
   * mean variance on wrong vs right pixels (effect size);
   * AUROC of the deterministic probability margin |p - 0.5| as the
     baseline uncertainty signal variance must beat to justify 32 forwards.

AUROC is computed exactly via the rank statistic (no sklearn dependency at
run time on the TPU host).

    python scripts/uncertainty_auroc.py --workdir /tmp/unc_auroc
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

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

# child: the MC pass + AUROC on the real TPU in a fresh process (bounded RSS,
# fresh device claim — the isolate_cells parent has moved itself onto CPU)
_MC_CHILD = r"""
import json, sys
import numpy as np
spec = json.load(open(sys.argv[1]))
from selectivenet_for_semantic_segmentation_binary_tpu.config import EvalConfig
from selectivenet_for_semantic_segmentation_binary_tpu.data.folds import construct_test
from selectivenet_for_semantic_segmentation_binary_tpu.data.dataset import PatchDataset
from selectivenet_for_semantic_segmentation_binary_tpu.predictor import Predictor

pred = Predictor(spec["ckpt"], selective=True, dropout_rate=spec["dropout"],
                 fold_bn=True)
data_list = construct_test(spec["data_dir"], test_fold=spec["fold"])
ds = PatchDataset(spec["data_dir"], data_list, 200, spec["patch_size"], "RGB")

def auroc(score, err):
    # exact rank AUROC: P(score_wrong > score_right) + 0.5 P(tie)
    order = np.argsort(score, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(score) + 1)
    s = np.asarray(score, np.float64)[order]
    # average ranks over ties
    i = 0
    sorted_ranks = ranks[order]
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        if j > i:
            sorted_ranks[i:j + 1] = sorted_ranks[i:j + 1].mean()
        i = j + 1
    ranks[order] = sorted_ranks
    n_pos = int(err.sum()); n_neg = len(err) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[err].sum() - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg))

vs, errs, margins = [], [], []
B = spec["mc_batch"]
for i0 in range(0, len(ds), B):
    items = [ds[i] for i in range(i0, min(i0 + B, len(ds)))]
    x = np.stack([np.asarray(it["input"], np.float32) for it in items])
    y = np.stack([np.asarray(it["label"]) for it in items]).astype(np.int32)
    out = pred.predict_with_uncertainty(x, n_iter=spec["n_iter"],
                                        seed=spec["seed"])
    mean_p = out["mean_prob"][..., 0]          # (N, H, W)
    var = out["variance"][..., 0]
    mc_pred = (mean_p > 0.5).astype(np.int32)
    vs.append(var.reshape(-1)); errs.append((mc_pred != y).reshape(-1))
    margins.append((-np.abs(mean_p - 0.5)).reshape(-1))
    print(f"  mc batch {i0 // B}: {x.shape[0]} patches", flush=True)

var = np.concatenate(vs); err = np.concatenate(errs).astype(bool)
margin = np.concatenate(margins)
res = {
    "n_pixels": int(err.size),
    "error_rate": float(err.mean()),
    "auroc_variance": auroc(var, err),
    "auroc_margin": auroc(margin, err),
    "mean_var_wrong": float(var[err].mean()),
    "mean_var_right": float(var[~err].mean()),
    "var_ratio_wrong_over_right": float(var[err].mean()
                                        / max(var[~err].mean(), 1e-12)),
}
print("MC_ROW " + json.dumps(res), flush=True)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/unc_auroc")
    ap.add_argument("--fold", type=int, default=1)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--n_iter", type=int, default=32)
    ap.add_argument("--n_epoch", type=int, default=TRAIN_KW["n_epoch"])
    ap.add_argument("--mc_batch", type=int, default=8)
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
        data_dir, os.path.join(args.workdir, "model"), folds=[args.fold],
        variants=[Variant("dropout",
                          train_kw={"dropout_rate": args.dropout})],
        train_overrides=TRAIN_KW,
        eval_overrides=dict(select_eval=True),
        select_overrides=dict(select_eval=False),
        save_dir=args.workdir, isolate_cells=True,
    )
    row = next(r for r in rows if r["fold"] != "mean")
    ckpt = os.path.join(args.workdir, "model", "dropout",
                        f"{args.fold}-fold", "checkpoint",
                        f"model_epoch{row['best_epoch']}.ckpt")
    print(f"best epoch {row['best_epoch']} -> {ckpt}", flush=True)

    spec = dict(ckpt=ckpt, data_dir=data_dir, fold=args.fold,
                dropout=args.dropout, n_iter=args.n_iter, seed=0,
                patch_size=TRAIN_KW["patch_size"], mc_batch=args.mc_batch)
    spec_path = os.path.join(args.workdir, "mc_spec.json")
    with open(spec_path, "w") as f:
        json.dump(spec, f)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", _MC_CHILD, spec_path],
                         env=env, capture_output=True, text=True)
    sys.stdout.write(out.stdout)
    line = next((ln for ln in out.stdout.splitlines()
                 if ln.startswith("MC_ROW ")), None)
    if line is None:
        raise RuntimeError(f"MC child failed (rc={out.returncode}):\n"
                           f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    res = json.loads(line[len("MC_ROW "):])
    res["best_epoch"] = row["best_epoch"]
    res["in_coverage_mIoU"] = float(row["mIoU"])
    with open(os.path.join(args.workdir, "uncertainty_auroc.json"), "w") as f:
        json.dump(res, f, indent=2)
    print("UNCERTAINTY_AUROC " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
