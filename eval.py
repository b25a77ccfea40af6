#!/usr/bin/env python3
"""Evaluation entry point (reference eval.py:76-280 CLI surface).

Usage matches the reference README, e.g.:

    python3 eval.py --fold 1 --data_dir /data --model_dir /model/SUNet_B \
        --model_arch UNet_B --selective 1 --select_eval 1 \
        --batch_size 128 --local_rank 0 1 2 3 4 5 6 7

Accepts both --fold (README) and --test_fold (reference implementation).
Every checkpoint (.ckpt native, .pth reference-torch) found in --model_dir is
loaded; more than one checkpoint triggers device-side ensemble averaging with
the --ens_scale rescale. --select_eval 1 reports in-coverage metrics and the
rejection ratio.
"""

from selectivenet_for_semantic_segmentation_binary_tpu.cli import eval_main as main


if __name__ == "__main__":
    main()
