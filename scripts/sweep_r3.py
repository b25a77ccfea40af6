#!/usr/bin/env python3
"""Round-3 full-grid results artifact (VERDICT round-2 #4).

Produces the direct analog of the reference's README results table
(README.md:80-86) at the reference's report shape — 5 folds x 5 variants —
on the hard synthetic task (write_hard_synthetic_patch_tree: ~20% of pixels
carry an irreducible hidden-coin-flip label), entirely through the public
harness (tools/sweep.py -> train()/evaluate()):

1. the selective grid: every (variant, fold) trains selective UNet_B with
   the reference recipe (Adam 1e-3, BCElogit, --s_lamb 2, batch 128, 256px)
   and reports IN-COVERAGE metrics of the valid-split best epoch
   -> {workdir}/sweep_summary.csv  (u-net_testing.ipynb cells 21-60 analog);
2. the same best checkpoints re-scored WITHOUT selection (select_eval=0);
3. plain (non-selective) UNet_B per fold, baseline variant — the "UNet" row;
4. one ordering table per fold + nanmean: plain / w-o-selection /
   in-coverage  -> {workdir}/ordering_summary.csv  (README.md:84-86 analog).

Idempotent/resumable: dataset generation is guarded, run_sweep auto-resumes
each cell from its latest checkpoint, and completed evals are recomputed
cheaply (cached jitted steps). Runs on the real TPU; budget ~2-3 h for the
full grid over the axon tunnel (host-path variants are H2D-bound here).

    python scripts/sweep_r3.py --workdir /tmp/sweep_r3 [--folds 1 2 3 4 5]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selectivenet_for_semantic_segmentation_binary_tpu.config import EvalConfig  # noqa: E402
from selectivenet_for_semantic_segmentation_binary_tpu.data import (  # noqa: E402
    write_hard_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep import (  # noqa: E402
    Variant,
    _eval_single_checkpoint,
    default_grid,
    run_sweep,
)
from selectivenet_for_semantic_segmentation_binary_tpu.tools.wsi import (  # noqa: E402
    save_performance_as_csv,
)

TRAIN_KW = dict(
    model_arch="UNet_B", loss="BCElogit", s_lamb=2.0, lr=1e-3, optim="Adam",
    batch_size=128, patch_size=256, n_epoch=20, num_workers=16, seed=42,
)


def _eval_cfg(data_dir, fold, ckpt_dir, variant, select_eval, selective):
    kw = dict(
        data_dir=data_dir, test_fold=fold, model_dir=ckpt_dir,
        model_arch=["UNet_B"], selective=selective, select_eval=select_eval,
        batch_size=128, patch_size=256, num_workers=16, seed=42,
    )
    kw.update(variant.eval_kw)
    return EvalConfig(**kw)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/sweep_r3")
    ap.add_argument("--folds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    ap.add_argument("--n_epoch", type=int, default=TRAIN_KW["n_epoch"])
    ap.add_argument("--variants", nargs="+",
                    default=[v.name for v in default_grid()])
    args = ap.parse_args()
    TRAIN_KW["n_epoch"] = args.n_epoch

    data_dir = os.path.join(args.workdir, "data")
    if not os.path.isdir(os.path.join(data_dir, "200x_256")):
        print("generating hard synthetic dataset (600 patches) ...", flush=True)
        write_hard_synthetic_patch_tree(
            data_dir, n_slides=6, patches_per_slide=100, patch_size=256, seed=0)

    by_name = {v.name: v for v in default_grid()}
    variants = [by_name[n] for n in args.variants]

    # 1. selective grid, in-coverage report
    print("=== selective grid (in-coverage) ===", flush=True)
    sel_root = os.path.join(args.workdir, "selective")
    sel_rows = run_sweep(
        data_dir, sel_root, folds=args.folds, variants=variants,
        train_overrides=dict(selective=True, **TRAIN_KW),
        eval_overrides=dict(select_eval=True),
        # select on without-selection quality; in-coverage selection is
        # degenerate (an all-rejecting epoch-1 head scores ~1.0 and wins)
        select_overrides=dict(select_eval=False),
        save_dir=args.workdir,
    )

    # 2. the same best checkpoints scored WITHOUT selection (cached per cell:
    # the grid process can be OOM-killed by the tunnel client's host-memory
    # growth — every stage must be restartable)
    print("=== re-scoring best checkpoints w/o selection ===", flush=True)
    wo_cache_path = os.path.join(args.workdir, "wo_rows.json")
    try:
        with open(wo_cache_path) as f:
            wo_cache = json.load(f)
    except (OSError, ValueError):
        wo_cache = {}
    wo_rows = {}
    for row in sel_rows:
        if row["fold"] == "mean":
            continue
        v = by_name[row["variant"]]
        key = f"{v.name}/{row['fold']}/{row['best_epoch']}"
        if key in wo_cache:
            wo_rows[(v.name, row["fold"])] = wo_cache[key]
            continue
        ckpt_dir = os.path.join(sel_root, v.name, f"{row['fold']}-fold",
                                "checkpoint")
        ckpt = os.path.join(ckpt_dir, f"model_epoch{row['best_epoch']}.ckpt")
        cfg = _eval_cfg(v.data_dir or data_dir, row["fold"], ckpt_dir, v,
                        select_eval=False, selective=True)
        res = _eval_single_checkpoint(cfg, ckpt, None)
        res = {k: (np.asarray(val).tolist() if isinstance(val, np.ndarray)
                   else float(val) if isinstance(val, (np.floating, float))
                   else val)
               for k, val in res.items() if k != "confusion_matrix"}
        wo_rows[(v.name, row["fold"])] = res
        wo_cache[key] = res
        with open(wo_cache_path, "w") as f:
            json.dump(wo_cache, f)
        print(f"[{v.name} fold {row['fold']}] w/o selection "
              f"mIoU={res['mIoU']:.4f}", flush=True)

    # 3. plain UNet_B per fold (baseline variant) — the "UNet" row
    print("=== plain UNet_B (baseline variant) ===", flush=True)
    plain_root = os.path.join(args.workdir, "plain")
    plain_rows = run_sweep(
        data_dir, plain_root, folds=args.folds,
        variants=[Variant("baseline")],
        train_overrides=dict(selective=False, **TRAIN_KW),
        eval_overrides=dict(select_eval=False),
        save_dir=None,
    )
    plain_by_fold = {r["fold"]: r for r in plain_rows if r["fold"] != "mean"}

    # 4. ordering table (README.md:84-86 analog), baseline variant
    header = ["fold", "model", "accuracy", "recall", "precision", "f1",
              "mIoU", "rejection"]
    csv_rows, ordering = [], []
    sel_by_fold = {r["fold"]: r for r in sel_rows
                   if r["variant"] == "baseline" and r["fold"] != "mean"}
    for fold in args.folds:
        rows3 = []
        p = plain_by_fold.get(fold)
        if p is not None:
            rows3.append(("UNet (plain)", p["accuracy"],
                          np.nanmean(p["recall"]), np.nanmean(p["precision"]),
                          np.nanmean(p["f1_score"]), p["mIoU"], ""))
        w = wo_rows.get(("baseline", fold))
        if w is not None:
            rows3.append(("SelectiveUNet w/o selection", w["accuracy"],
                          float(np.nanmean(w["recall"])),
                          float(np.nanmean(w["precision"])),
                          float(np.nanmean(w["f1_score"])), w["mIoU"], ""))
        s = sel_by_fold.get(fold)
        if s is not None:
            rows3.append(("SelectiveUNet in-coverage", s["accuracy"],
                          np.nanmean(s["recall"]), np.nanmean(s["precision"]),
                          np.nanmean(s["f1_score"]), s["mIoU"],
                          s.get("rejection_ratio", "")))
        for name, acc, rec, prec, f1, miou, rej in rows3:
            csv_rows.append([fold, name, acc, rec, prec, f1, miou, rej])
            ordering.append((fold, name, miou))
            print(f"fold {fold} | {name:28s} acc={acc:.4f} mIoU={miou:.4f} "
                  f"{'rej=%.3f' % rej if rej != '' else ''}", flush=True)

    # nanmean rows across folds per model
    for name in ("UNet (plain)", "SelectiveUNet w/o selection",
                 "SelectiveUNet in-coverage"):
        sub = [r for r in csv_rows if r[1] == name]
        if sub:
            mean = [float(np.nanmean([r[i] for r in sub]))
                    for i in range(2, 7)]
            rejs = [r[7] for r in sub if r[7] != ""]
            csv_rows.append(["mean", name, *mean,
                             float(np.nanmean(rejs)) if rejs else ""])
            print(f"mean   | {name:28s} acc={mean[0]:.4f} mIoU={mean[4]:.4f}",
                  flush=True)

    save_performance_as_csv(args.workdir, csv_rows, "ordering_summary",
                            header=header)
    with open(os.path.join(args.workdir, "ordering_summary.json"), "w") as f:
        json.dump({"rows": [list(map(str, r)) for r in csv_rows]}, f, indent=1)
    print(f"artifacts: {args.workdir}/sweep_summary.csv, "
          f"{args.workdir}/ordering_summary.csv", flush=True)


if __name__ == "__main__":
    main()
