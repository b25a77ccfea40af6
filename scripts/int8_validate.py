"""Validate the production int8 (W8A8) serving path on the real TPU.

Two questions the probe (scripts/proto_int8.py) could not answer:

  accuracy   on a TRAINED checkpoint (the probe used random weights), does
             int8 preserve the eval metrics? Runs the PUBLIC eval driver
             (eval_lib.evaluate) bf16 vs int8 on a held-out fold — plain,
             and in-coverage for selective checkpoints.
  speed      through the PRODUCTION Predictor (not the probe's hand-rolled
             forward): batch-128 @ 256px serving throughput bf16 vs int8.

Usage:
  python scripts/int8_validate.py --data_dir /tmp/sweep_r4/data \
      --ckpt /tmp/sweep_r4/selective/baseline/1-fold/checkpoint/model_epoch14.ckpt \
      --selective 1 [--test_fold 1] [--skip_eval] [--skip_speed]

Timing note: on the axon tunnel block_until_ready returns early; every
timing below forces a scalar D2H fetch (CLAUDE.md hazard).
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_eval(args, quantize):
    from selectivenet_for_semantic_segmentation_binary_tpu.config import EvalConfig
    from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import evaluate

    # evaluate() discovers every ckpt in model_dir (ensemble); isolate the one
    d = tempfile.mkdtemp(prefix="int8val_")
    shutil.copy(args.ckpt, d)
    rows = {}
    for select_eval in ([False, True] if args.selective else [False]):
        cfg = EvalConfig(
            data_dir=args.data_dir, test_fold=args.test_fold,
            patch_size=args.patch_size, batch_size=args.batch_size,
            num_workers=4, model_dir=d, selective=args.selective,
            select_eval=select_eval, quantize=quantize,
        )
        t0 = time.perf_counter()
        r = evaluate(cfg, verbose=False)
        dt = time.perf_counter() - t0
        key = "in-coverage" if select_eval else "plain"
        rows[key] = r
        line = (f"  {quantize:>4} {key:>12}: acc {r['accuracy']:.6f} "
                f"mIoU {r['mIoU']:.6f} f1 {np.atleast_1d(r['f1_score'])[-1]:.6f}")
        if select_eval:
            line += f" rejection {r['rejection_ratio']:.4f}"
        print(line + f"   ({dt:.0f}s)", flush=True)
    shutil.rmtree(d)
    return rows


def run_speed(args):
    """Times the production Predictor's jitted forward (``p._forward``, the
    exact graph ``predict``/serve dispatch) on a DEVICE-RESIDENT normalized
    batch. Feeding host numpy through ``Predictor.logits`` instead measures
    the tunnel's ~100 MB/batch H2D transfer (~2.2 s, measured), not the
    forward — same hazard docs/RESULTS.md records for the data path."""
    import jax
    import jax.numpy as jnp

    from selectivenet_for_semantic_segmentation_binary_tpu.predictor import Predictor

    rng = np.random.default_rng(0)
    B, P = 128, 256
    imgs = rng.random((B, P, P, 3)).astype(np.float32)
    calib = imgs[:8]
    x = jax.device_put(jnp.asarray((imgs - 0.5) / 0.5, jnp.float32))

    def sync(out):
        leaf = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(leaf.astype(jnp.float32)))  # forced D2H scalar fetch

    results = {}
    for quantize in ("none", "int8"):
        p = Predictor(args.ckpt, selective=args.selective,
                      compute_dtype="bfloat16", quantize=quantize,
                      calibration_images=calib if quantize == "int8" else None)
        sync(p._forward(x))  # compile + warm
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            sync(p._forward(x))
        dt = (time.perf_counter() - t0) / n
        results[quantize] = B / dt
        print(f"  {quantize:>4}: {dt * 1e3:7.2f} ms/batch  "
              f"{B / dt:7.1f} patches/s", flush=True)
    print(f"  speedup int8/bf16: {results['int8'] / results['none']:.3f}x",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--test_fold", type=int, default=1)
    ap.add_argument("--patch_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--selective", type=lambda s: s not in ("0", "False"),
                    default=True)
    ap.add_argument("--skip_eval", action="store_true")
    ap.add_argument("--skip_speed", action="store_true")
    args = ap.parse_args()

    import jax

    print(f"devices: {jax.devices()}", flush=True)
    if not args.skip_eval:
        print(f"== eval metrics, fold {args.test_fold}, {args.ckpt} ==",
              flush=True)
        for q in ("none", "int8"):
            run_eval(args, q)
    if not args.skip_speed:
        print("== Predictor serving throughput, batch 128 @ 256px ==",
              flush=True)
        run_speed(args)


if __name__ == "__main__":
    main()
