#!/usr/bin/env python3
"""Training entry point (reference train.py:360-388 CLI surface).

Usage matches the reference README, e.g.:

    python3 train.py --fold 1 --data_dir /data --model_dir /model/SUNet_B \
        --model_arch UNet_B --selective 1 --s_lamb 2 \
        --optim Adam --lr 1e-3 --loss BCElogit \
        --n_epoch 200 --batch_size 128 --local_rank 0 1 2 3 4 5 6 7 --log_img 1

On TPU, --local_rank selects how many mesh devices to use (its length), not
CUDA device ids. Checkpoints/logs land in the reference layout
{model_dir}/{fold}-fold/{checkpoint,log/{train,valid}} and training auto-resumes
from the digit-latest checkpoint when rerun with the same command.
"""

from selectivenet_for_semantic_segmentation_binary_tpu.cli import train_main as main


if __name__ == "__main__":
    main()
