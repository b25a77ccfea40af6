"""Subprocess worker driving the PUBLIC entry points under jax.distributed.

Unlike _multihost_worker.py (which hand-builds its loader and step to pin the
step semantics), this worker calls the public ``train()`` and ``evaluate()``
exactly as a user would on a fleet — exercising ``make_loaders``' /
``make_eval_loader``'s process wiring (train_lib.py / eval_lib.py), the
host-0-writes checkpoint/TB discipline, and the end-of-train fleet barrier.
The parent test asserts the loss/metric trajectory is process-count-invariant
(the multi-host analog of reference train.py:132-134 / eval.py:152-154).

Usage: python _multihost_entry_worker.py <pid> <nproc> <port> <data_dir> \
           <model_dir> <out_json>
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_dir, model_dir, out_path = sys.argv[4], sys.argv[5], sys.argv[6]

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

    from selectivenet_for_semantic_segmentation_binary_tpu.config import (
        EvalConfig,
        TrainConfig,
    )
    from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import evaluate
    from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import train

    assert len(jax.devices()) == 8, f"expected 8 global devices, {len(jax.devices())}"

    t_cfg = TrainConfig(
        data_dir=data_dir, fold=1, model_arch="UNet_B", selective=True,
        loss="BCElogit", s_lamb=2.0, compute_dtype="float32",
        model_dir=model_dir, batch_size=8, patch_size=32, n_epoch=2,
        num_workers=2, drop_last=True, seed=42, keep_ckpt=1,
        local_rank=list(range(8)),
    )
    final = train(t_cfg, verbose=False)

    e_cfg = EvalConfig(
        data_dir=data_dir, test_fold=1, model_dir=t_cfg.ckpt_dir,
        model_arch=["UNet_B"], selective=True, select_eval=True,
        compute_dtype="float32", batch_size=8, patch_size=32,
        num_workers=2, seed=42, local_rank=list(range(8)),
    )
    results = evaluate(e_cfg, verbose=False)

    if pid == 0:
        tr, va = final["train"], final["valid"]
        with open(out_path, "w") as f:
            json.dump({
                "train_loss": tr.loss, "train_rejection": tr.rejection,
                "valid_loss": va.loss, "valid_acc": va.acc,
                "valid_rejection": va.rejection,
                "eval_accuracy": results["accuracy"],
                "eval_mIoU": results["mIoU"],
                "eval_rejection": results["rejection_ratio"],
            }, f)


if __name__ == "__main__":
    main()
