#!/usr/bin/env python3
"""End-to-end demo on synthetic data: split -> train -> eval -> serve.

Runs the complete framework loop without any external dataset:

    python examples/synthetic_end_to_end.py --workdir /tmp/demo --epochs 4

1. generates a synthetic WSI patch tree in the reference on-disk layout;
2. regenerates the 5-fold lists with the data-split tool (same artifact the
   reference's split notebook produces);
3. trains the selective UNet_B with the reference train.sh recipe (scaled
   down) via the library train() driver;
4. evaluates the held-out fold with in-coverage metrics;
5. loads the final checkpoint into the serving Predictor and writes a
   seamless whole-slide probability heatmap.
"""

import argparse
import os
import shutil
import sys

import numpy as np

# runnable from any cwd, like scripts/*
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default="/tmp/snseg_demo")
    parser.add_argument("--epochs", type=int, default=4)
    parser.add_argument("--patch_size", type=int, default=64)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--n_patches", type=int, default=200)
    args = parser.parse_args()

    from selectivenet_for_semantic_segmentation_binary_tpu.config import (
        EvalConfig,
        TrainConfig,
    )
    from selectivenet_for_semantic_segmentation_binary_tpu.data import (
        write_synthetic_patch_tree,
    )
    from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import evaluate
    from selectivenet_for_semantic_segmentation_binary_tpu.predictor import Predictor
    from selectivenet_for_semantic_segmentation_binary_tpu.tools import build_fold_lists
    from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import train

    data_dir = os.path.join(args.workdir, "data")
    model_dir = os.path.join(args.workdir, "model")
    # clear only the demo's own subdirectories — an unconditional rmtree of a
    # user-supplied --workdir (e.g. ~/experiments) would be irreversible
    # data loss from a demo script
    for sub in ("data", "model", "best", "results"):
        shutil.rmtree(os.path.join(args.workdir, sub), ignore_errors=True)

    print("== 1/5 synthetic patch tree ==")
    write_synthetic_patch_tree(
        data_dir, n_slides=4, patches_per_slide=args.n_patches // 4,
        patch_size=args.patch_size, seed=11,
    )

    print("== 2/5 fold lists via the data-split tool ==")
    counts = build_fold_lists(data_dir, patch_mag=200, patch_size=args.patch_size)
    print(f"   {counts}")

    print("== 3/5 selective training ==")
    cfg = TrainConfig(
        data_dir=data_dir, model_dir=model_dir, fold=1,
        patch_size=args.patch_size, batch_size=args.batch_size,
        n_epoch=args.epochs, model_arch="UNet_B", loss="BCElogit",
        selective=True, s_lamb=2.0, num_workers=8,
    )
    train(cfg)

    print("== 4/5 in-coverage evaluation on the held-out fold ==")
    # digit sort, not lexicographic: epoch 9 would sort after epochs 10..12
    from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
        latest_checkpoint,
    )

    final_ckpt = latest_checkpoint(f"{model_dir}/1-fold/checkpoint",
                                   verify=False)[0]
    single_dir = os.path.join(args.workdir, "best")
    os.makedirs(single_dir, exist_ok=True)
    shutil.copy(final_ckpt, single_dir)
    ecfg = EvalConfig(
        data_dir=data_dir, test_fold=1, patch_size=args.patch_size,
        batch_size=args.batch_size, model_dir=single_dir,
        model_arch=["UNet_B"], selective=True, select_eval=True,
        save_dir=os.path.join(args.workdir, "results"),
    )
    results = evaluate(ecfg)

    print("== 5/5 serving: seamless whole-slide heatmap ==")
    predictor = Predictor(
        os.path.join(single_dir, os.path.basename(final_ckpt)),
        selective=True,
    )
    rng = np.random.default_rng(0)
    slide = np.clip(
        0.85 + 0.05 * rng.standard_normal((args.patch_size * 4, args.patch_size * 4, 3)),
        0, 1,
    ).astype(np.float32)
    out = predictor.predict_wsi(slide, tile=(args.patch_size, args.patch_size))
    from selectivenet_for_semantic_segmentation_binary_tpu.tools import make_heatmap
    from PIL import Image

    heat = (make_heatmap(out["prob"]) * 255).astype(np.uint8)
    heat_path = os.path.join(args.workdir, "slide_heatmap.png")
    Image.fromarray(heat).save(heat_path)

    print(f"\ndemo complete: mIoU={results['mIoU']:.4f}, heatmap at {heat_path}")


if __name__ == "__main__":
    main()
