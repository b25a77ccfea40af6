#!/usr/bin/env python3
"""Selective-prediction benchmark: reproduce the reference's headline ordering.

The reference's core result (README.md:84-86) is that the SelectiveNet
variant's IN-COVERAGE metrics beat both the plain UNet and the same model
scored without selection (in-coverage mIoU 0.9612 vs 0.8565 / 0.8214 on its
private WSI dataset). That dataset is not distributable, so this script
reproduces the ORDERING on the hard synthetic task
(data/dataset.py::write_hard_synthetic_patch_tree): ~20% of pixels carry an
irreducible coin-flip label with a recognizable appearance, capping any plain
model near 0.9 accuracy while a selective model can reject exactly those
pixels and recover clean-zone metrics in coverage. A further ~4%
CAMOUFLAGED coin-flip mass (camo_level) leaves no pixel trace at all, so
even perfect selection accepts it — in-coverage metrics land mid-range
(the reference's published regime, accuracy 0.9839 / mIoU 0.9612) instead
of saturating at ~1.0 like the round-3 grid.

Runs on the real TPU in a few minutes:

    python scripts/selective_benchmark.py --workdir /tmp/selbench

Trains UNet_B plain and selective (reference recipe: Adam 1e-3, BCElogit,
--s_lamb 2) on fold 1, then evaluates plain / selective-without-selection /
selective-in-coverage on the held-out fold and prints the reference-shaped
table. Expected: in-coverage >> plain >= without-selection, with the
rejection ratio close to the ambiguous-pixel mass (~0.2) and in-coverage
accuracy/mIoU mid-range (~0.95-0.98), NOT saturated.
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from selectivenet_for_semantic_segmentation_binary_tpu.config import (
    EvalConfig,
    TrainConfig,
)
from selectivenet_for_semantic_segmentation_binary_tpu.data import (
    write_hard_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import evaluate
from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import train


def run(workdir: str, n_epoch: int, batch_size: int, patch_size: int,
        n_slides: int, patches_per_slide: int, fold: int, seed: int):
    data_dir = os.path.join(workdir, "data")
    if not os.path.isdir(os.path.join(data_dir, f"200x_{patch_size}")):
        print(f"generating hard synthetic dataset under {data_dir} ...")
        write_hard_synthetic_patch_tree(
            data_dir, n_slides=n_slides, patches_per_slide=patches_per_slide,
            patch_size=patch_size, seed=seed,
        )

    results = {}
    for name, selective in (("plain", False), ("selective", True)):
        model_dir = os.path.join(workdir, name)
        shutil.rmtree(model_dir, ignore_errors=True)
        print(f"\n=== training {name} UNet_B ({n_epoch} epochs) ===")
        cfg = TrainConfig(
            data_dir=data_dir, fold=fold, model_dir=model_dir,
            model_arch="UNet_B", selective=selective, s_lamb=2.0,
            loss="BCElogit", optim="Adam", lr=1e-3,
            batch_size=batch_size, patch_size=patch_size, n_epoch=n_epoch,
            log_img=False, keep_ckpt=1,  # only the final epoch is evaluated
        )
        train(cfg)
        ckpt_dir = cfg.ckpt_dir

        eval_modes = [("", False)] if not selective else [
            (" w/o selection", False), (" in-coverage", True),
        ]
        for suffix, select_eval in eval_modes:
            print(f"\n=== eval {name}{suffix} ===")
            ecfg = EvalConfig(
                data_dir=data_dir, test_fold=fold, model_dir=ckpt_dir,
                model_arch=["UNet_B"], selective=selective,
                select_eval=select_eval, batch_size=batch_size,
                patch_size=patch_size,
            )
            results[name + suffix] = evaluate(ecfg)

    print("\n=== summary (reference README.md:84-86 table shape) ===")
    header = f"{'model':<28}{'Accuracy':>10}{'Recall':>9}{'Precision':>11}" \
             f"{'F1':>8}{'mIoU':>8}{'reject':>8}"
    print(header)
    for name, r in results.items():
        rej = r.get("rejection_ratio", float("nan"))
        print(f"{name:<28}{r['accuracy']:>10.4f}{r['recall'][1]:>9.4f}"
              f"{r['precision'][1]:>11.4f}{r['f1_score'][1]:>8.4f}"
              f"{r['mIoU']:>8.4f}{rej:>8.3f}")
    return results


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--workdir", default="/tmp/selective_benchmark")
    p.add_argument("--n_epoch", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--n_slides", type=int, default=5)
    p.add_argument("--patches_per_slide", type=int, default=120)
    p.add_argument("--fold", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    run(a.workdir, a.n_epoch, a.batch_size, a.patch_size,
        a.n_slides, a.patches_per_slide, a.fold, a.seed)


if __name__ == "__main__":
    main()
