"""Subprocess worker: fleet train() with a SABOTAGED checkpoint directory.

Only host 0 writes checkpoints; before the per-epoch fleet agreement
(train_lib._fleet_checkpoint_agreement) a write failure there killed host 0
alone while hosts 1..N — which saw no error — blocked forever in the next
epoch's collectives. The parent test makes the checkpoint path unwritable
(a regular FILE where the directory should be, which defeats even root) and
asserts every process exits nonzero promptly instead of hanging.

Usage: python _multihost_fail_worker.py <pid> <nproc> <port> <data_dir> \
           <model_dir> <out_json>
"""

import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_dir, model_dir = sys.argv[4], sys.argv[5]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 // nproc)
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )

    from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
    from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import train

    t_cfg = TrainConfig(
        data_dir=data_dir, fold=1, model_arch="UNet_B", selective=True,
        loss="BCElogit", s_lamb=2.0, compute_dtype="float32",
        model_dir=model_dir, batch_size=8, patch_size=32, n_epoch=2,
        num_workers=2, drop_last=True, seed=42,
        local_rank=list(range(8)),
    )
    train(t_cfg, verbose=False)
    # reaching here means the sabotage failed to fail — report it loudly
    print("UNEXPECTED: train() completed despite unwritable checkpoint dir",
          flush=True)
    sys.exit(17)


if __name__ == "__main__":
    main()
