"""Subprocess worker: tools-layer fleet semantics (sweep + calibrate).

Drives run_sweep TWICE and calibrate ONCE under jax.distributed so the
fleet-only code paths execute for real:

- run_sweep #1 (cold): trains/scores through the public harness; only host 0
  may write the per-cell row cache and the summary CSV;
- run_sweep #2 (warm): every process must take the broadcast cache-HIT branch
  (tools/sweep._fleet_cache_decision) with ZERO checkpoint scoring;
- calibrate + risk_coverage_curve: host-0-only curve CSV and one threshold,
  identical on every process.

Each process writes its own ``{out}.{pid}`` JSON; the parent asserts
cross-process equality and the zero-rescore warm run.

Usage: python _multihost_sweep_worker.py <pid> <nproc> <port> <data_dir> \
           <model_root> <out_json>
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    data_dir, model_root, out_path = sys.argv[4], sys.argv[5], sys.argv[6]

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

    import selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep as sweep_mod
    from selectivenet_for_semantic_segmentation_binary_tpu.config import EvalConfig
    from selectivenet_for_semantic_segmentation_binary_tpu.tools.calibrate import (
        calibrate,
        risk_coverage_curve,
    )

    calls = []
    real_eval = sweep_mod._eval_single_checkpoint

    def counting_eval(cfg, ckpt, loader):
        calls.append(os.path.basename(ckpt))
        return real_eval(cfg, ckpt, loader)

    sweep_mod._eval_single_checkpoint = counting_eval

    kw = dict(
        folds=[1], variants=[sweep_mod.Variant("baseline")],
        train_overrides=dict(
            model_arch="UNet_B", selective=True, loss="BCElogit", s_lamb=2.0,
            n_epoch=2, batch_size=8, patch_size=32, num_workers=2,
            compute_dtype="float32", seed=42, drop_last=True,
            local_rank=list(range(8)),
        ),
        eval_overrides=dict(select_eval=False, local_rank=list(range(8))),
        save_dir=model_root, verbose=False,
    )
    rows_cold = sweep_mod.run_sweep(data_dir, model_root, **kw)
    cold_calls = len(calls)

    calls.clear()
    rows_warm = sweep_mod.run_sweep(data_dir, model_root, **kw)
    warm_calls = len(calls)

    ckpt_dir = os.path.join(model_root, "baseline", "1-fold", "checkpoint")
    curve_csv = os.path.join(model_root, "curve.csv")
    cal_cfg = EvalConfig(
        data_dir=data_dir, test_fold=1, model_dir=ckpt_dir,
        model_arch=["UNet_B"], selective=True, select_eval=True,
        compute_dtype="float32", batch_size=8, patch_size=32, num_workers=2,
        seed=42, local_rank=list(range(8)),
    )
    cal = calibrate(cal_cfg, target_coverage=0.8, verbose=False)
    risk_coverage_curve(cal_cfg, csv_path=curve_csv, verbose=False)

    with open(f"{out_path}.{pid}", "w") as f:
        json.dump({
            "rows_cold": [{k: r[k] for k in ("variant", "fold", "best_epoch",
                                             "mIoU", "accuracy")}
                          for r in rows_cold if r["fold"] != "mean"],
            "rows_warm": [{k: r[k] for k in ("variant", "fold", "best_epoch",
                                             "mIoU", "accuracy")}
                          for r in rows_warm if r["fold"] != "mean"],
            "cold_calls": cold_calls,
            "warm_calls": warm_calls,
            "s_cut_off": cal["s_cut_off"],
            "achieved_coverage": cal["achieved_coverage"],
        }, f)


if __name__ == "__main__":
    main()
