#!/usr/bin/env python3
"""The reference's canonical recipe at FULL length (round-5 plan #4).

Every prior accuracy artifact trains 20 epochs; the reference's published
table comes from 200-epoch training (reference train.sh:1 — fold 1, UNet_B,
--selective 1, BCElogit, batch 128, constant lr: lr_sche defaults to None,
reference train.py:37). This driver runs that recipe once on the camo'd
hard-synthetic task, through the PUBLIC train.py/eval.py CLIs, exercising
the long-horizon surfaces the short runs never touch:

* 200 per-epoch checkpoints' worth of digit-sorted bookkeeping with
  ``--keep_ckpt 30`` retention (disk-bounded; resume still digit-sorted);
* a mid-run stop + restart at epoch SPLIT (the resume = rerun-same-command
  UX, reference train.py:111-129) — the restart must pick up from the
  newest checkpoint and continue epoch numbering;
* BN running-stat drift / selective-coverage behavior over a 10x longer
  horizon, reported per-quarter from the TB scalars;
* final in-coverage AND without-selection eval of the last epoch.

    python scripts/canonical_200ep.py --workdir /tmp/canon200
"""

import argparse
import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args, log_path):
    print("+ " + " ".join(args), flush=True)
    with open(log_path, "a") as log:
        rc = subprocess.run(args, stdout=log, stderr=subprocess.STDOUT,
                            cwd=REPO).returncode
    if rc != 0:
        raise RuntimeError(f"{args[1]} failed rc={rc}; see {log_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/canon200")
    ap.add_argument("--fold", type=int, default=1)
    ap.add_argument("--total", type=int, default=200)
    ap.add_argument("--split", type=int, default=120,
                    help="epochs in the first command; the rest resume")
    ap.add_argument("--keep_ckpt", type=int, default=30)
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    log_path = os.path.join(args.workdir, "canonical.log")

    data_dir = os.path.join(args.workdir, "data")
    if not os.path.isdir(os.path.join(data_dir, "200x_256")):
        print("generating camo'd hard synthetic dataset (600 patches) ...",
              flush=True)
        from selectivenet_for_semantic_segmentation_binary_tpu.data import (
            write_hard_synthetic_patch_tree,
        )

        write_hard_synthetic_patch_tree(
            data_dir, n_slides=6, patches_per_slide=100, patch_size=256,
            seed=0)

    model_dir = os.path.join(args.workdir, "model")
    ckpt_dir = os.path.join(model_dir, f"{args.fold}-fold", "checkpoint")

    def epochs_done():
        eps = [int(re.search(r"model_epoch(\d+)\.ckpt$", p).group(1))
               for p in glob.glob(os.path.join(ckpt_dir, "model_epoch*.ckpt"))]
        return max(eps) if eps else 0

    base = [sys.executable, "train.py", "--fold", str(args.fold),
            "--data_dir", data_dir, "--model_dir", model_dir,
            "--model_arch", "UNet_B", "--selective", "1", "--s_lamb", "2",
            "--loss", "BCElogit", "--batch_size", "128",
            "--patch_size", "256", "--local_rank", "0",
            "--keep_ckpt", str(args.keep_ckpt)]

    # stage A: epochs 1..split (idempotent: resumes if partially done)
    done = epochs_done()
    if done < args.split:
        sh(base + ["--n_epoch", str(args.split - done)], log_path)
    print(f"stage A done: {epochs_done()} epochs", flush=True)

    # stage B: the restart — SAME command shape, remaining epochs. This is
    # the reference resume UX: the driver re-reads the newest digit-sorted
    # checkpoint (among the keep_ckpt survivors) and continues numbering.
    done = epochs_done()
    if done < args.total:
        sh(base + ["--n_epoch", str(args.total - done)], log_path)
    final_epoch = epochs_done()
    print(f"stage B done: {final_epoch} epochs", flush=True)
    assert final_epoch == args.total, (final_epoch, args.total)

    kept = sorted(glob.glob(os.path.join(ckpt_dir, "model_epoch*.ckpt")))
    assert len(kept) <= args.keep_ckpt, len(kept)

    # long-horizon curve: decode the TB event files per quarter
    from selectivenet_for_semantic_segmentation_binary_tpu.utils.tb_reader import (  # noqa: E501
        read_scalars,
    )

    curve = {}
    for split_name in ("train", "valid"):
        scalars = read_scalars(os.path.join(model_dir, f"{args.fold}-fold",
                                            "log", split_name))
        curve[split_name] = {
            tag: [list(vals[i]) for i in
                  sorted({0, len(vals) // 4, len(vals) // 2,
                          3 * len(vals) // 4, len(vals) - 1})]
            for tag, vals in scalars.items() if len(vals) > 0
        }

    # final eval: in-coverage and without selection, single newest ckpt
    single = os.path.join(args.workdir, "single")
    os.makedirs(single, exist_ok=True)
    for p in glob.glob(os.path.join(single, "*.ckpt")):
        os.remove(p)
    import shutil

    shutil.copy(kept[-1] if kept else None, single)
    evals = {}
    for name, sel_eval in (("in_coverage", "1"), ("wo_selection", "0")):
        out = subprocess.run(
            [sys.executable, "eval.py", "--fold", str(args.fold),
             "--data_dir", data_dir, "--model_dir", single,
             "--model_arch", "UNet_B", "--selective", "1",
             "--select_eval", sel_eval, "--batch_size", "128",
             "--patch_size", "256"],
            capture_output=True, text=True, cwd=REPO)
        evals[name] = out.stdout[-1500:]
        print(f"=== eval {name} ===\n{out.stdout[-800:]}", flush=True)

    with open(os.path.join(args.workdir, "canonical_summary.json"), "w") as f:
        json.dump({"final_epoch": final_epoch, "kept_ckpts": len(kept),
                   "curve": curve, "evals": evals}, f, indent=2)
    print("CANONICAL_DONE", flush=True)


if __name__ == "__main__":
    main()
