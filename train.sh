#!/bin/sh
# Canonical selective training run (reference train.sh:1): fold 1, UNet_B,
# selective, BCElogit, 8-device mesh, 200 epochs, global batch 128.
python3 train.py --fold 1 --data_dir '/data' --model_dir '/model' --model_arch 'UNet_B' --selective 1 --loss 'BCElogit' --local_rank 0 1 2 3 4 5 6 7 --n_epoch 200 --batch_size 128
