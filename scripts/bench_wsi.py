"""Measure the WSI tool's round-2 speedup (VERDICT round-2 item 8).

Round-1 ``wsi_inference`` had three costs the round-2 version removes:
  1. a closure-local @jax.jit that RECOMPILED on every call (~20 s on the
     tunnel) — a sweep (5 folds x 6 variants) paid it 30 times;
  2. sequential dataset[i] decode + host float normalize + float32 H2D
     (4x the bytes of the raw-uint8 device-preproc path);
  3. sequential per-patch get_performance scoring and strictly serialized
     per-batch H2D -> compute -> D2H (no overlap).

This bench runs the genuine round-1 implementation (reconstructed verbatim
from git history) against the round-2 tool on one synthetic 108-patch slide,
real TPU. Reported:
  * per-call: round-1 cost of ONE call (incl. its unavoidable recompile) vs
    the warm round-2 call — what any repeated-call workload (sweeps,
    per-fold loops) actually pays;
  * steady-state: both warm (round-1's compile hoisted out), isolating the
    decode/transfer/overlap wins.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from selectivenet_for_semantic_segmentation_binary_tpu.data import (  # noqa: E402
    PatchDataset,
    write_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model  # noqa: E402
from selectivenet_for_semantic_segmentation_binary_tpu.tools.wsi import (  # noqa: E402
    _group_by_slide,
    get_performance,
    make_heatmap,
    stitch_patches,
    wsi_inference,
)

N_PATCHES = 108  # one 6x18 slide grid at 256px
NROW = 6


def round1_wsi_inference(model, variables, dataset, nrow, cut_off=0.5,
                         batch_size=32, forward=None):
    """The round-1 implementation (git 0ba3b64 tools/wsi.py:75-142):
    closure-local jit (recompiles each call unless ``forward`` is injected),
    sequential decode, host float preproc, sequential scoring."""
    if forward is None:
        @jax.jit
        def forward(x):
            out = model.apply(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                x, train=False,
            )
            return jax.nn.sigmoid(out)

    ids = [name.split("_input")[0] for name in dataset.input_list]
    results = {}
    for slide, indices in _group_by_slide(ids).items():
        samples = [dataset[i] for i in indices]
        inputs = np.stack([s["input"] for s in samples])
        labels = np.stack([s["label"] for s in samples])
        normed = (inputs - 0.5) / 0.5
        probs = []
        for i in range(0, len(indices), batch_size):
            probs.append(np.asarray(forward(jnp.asarray(normed[i:i + batch_size]))))
        prob = np.concatenate(probs)
        pred = (prob > cut_off).astype(np.uint8)
        patch_scores = [get_performance(labels[j], prob[j], pred[j])
                        for j in range(len(indices))]
        results[slide] = {
            "prob": stitch_patches(prob, nrow),
            "pred": stitch_patches(pred, nrow),
            "label": stitch_patches(labels, nrow),
            "sample": stitch_patches(inputs, nrow),
            "patch_scores": np.asarray(patch_scores, np.float64),
        }
        results[slide]["heatmap"] = make_heatmap(results[slide]["prob"])
        results[slide]["wsi_score"] = get_performance(
            results[slide]["label"], results[slide]["prob"], results[slide]["pred"])
    return results


def main():
    with tempfile.TemporaryDirectory() as d:
        write_synthetic_patch_tree(d, n_slides=1, patches_per_slide=N_PATCHES,
                                   patch_size=256, seed=0)
        files = sorted(f for f in os.listdir(os.path.join(d, "200x_256"))
                       if f.endswith("_input.jpg"))
        data_list = [(f, f.replace("_input.jpg", "_label.png")) for f in files]
        dataset = PatchDataset(d, data_list, 200, 256, "RGB")

        model = build_model("UNet_B", selective=False, compute_dtype="bfloat16")
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)

        # warm the round-2 path (its jit is cached across calls by design)
        wsi_inference(model, variables, dataset, nrow=NROW)
        t0 = time.perf_counter()
        wsi_inference(model, variables, dataset, nrow=NROW)
        t_new = time.perf_counter() - t0

        # round-1 per-call cost: the closure jit recompiles, as it did then
        t0 = time.perf_counter()
        round1_wsi_inference(model, variables, dataset, NROW)
        t_old_call = time.perf_counter() - t0

        # round-1 steady-state: hoist its jit so compile is excluded
        @jax.jit
        def fwd(x):
            out = model.apply(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}, x, train=False)
            return jax.nn.sigmoid(out)
        round1_wsi_inference(model, variables, dataset, NROW, forward=fwd)  # warm
        t0 = time.perf_counter()
        round1_wsi_inference(model, variables, dataset, NROW, forward=fwd)
        t_old_warm = time.perf_counter() - t0

        print(f"round-1 tool, per call (recompiles): {t_old_call:6.2f}s "
              f"({N_PATCHES / t_old_call:6.1f} p/s)")
        print(f"round-1 tool, steady-state:          {t_old_warm:6.2f}s "
              f"({N_PATCHES / t_old_warm:6.1f} p/s)")
        print(f"round-2 tool, steady-state:          {t_new:6.2f}s "
              f"({N_PATCHES / t_new:6.1f} p/s)")
        print(f"per-call speedup:     {t_old_call / t_new:.2f}x")
        print(f"steady-state speedup: {t_old_warm / t_new:.2f}x")


if __name__ == "__main__":
    main()
