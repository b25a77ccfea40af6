"""WSI-level stitched inference, heatmaps, and CSV reporting.

Library form of reference jupyters/u-net_testing.ipynb cells 4-8/64-74:

* ``stitch_patches``: tile per-patch arrays into a whole-slide canvas with the
  notebook's ``row = j % nrow, col = j // nrow`` convention (cell 7);
* ``make_heatmap``: jet-colormap probability rendering (cell 7 make_heatmap);
* ``wsi_inference``: batch all patches of one slide, forward on device, stitch
  sample/label/pred/prob canvases, score per patch and per stitched WSI with
  get_performance, nanmean summaries (cells 6-8) — also covers the
  arbitrary-size single-tile path (cells 64-74) since the model is fully
  convolutional;
* ``save_performance_as_csv``: working replacement for the reference's broken
  dead CSV helper (eval.py:67-74 uses an invalid multi-char delimiter and a
  ``list.join`` misuse; this writes standard comma-separated rows).
"""

from __future__ import annotations

import csv
import os
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.metrics import get_performance


def stitch_patches(patches: np.ndarray, nrow: int) -> np.ndarray:
    """(B, H, W[, C]) per-patch arrays -> (nrow*H, ncol*W[, C]) canvas.

    Placement: patch j lands at row j % nrow, column j // nrow
    (u-net_testing.ipynb cell 7).
    """
    patches = np.asarray(patches)
    b, h, w = patches.shape[:3]
    ncol = -(-b // nrow)
    canvas = np.zeros((nrow * h, ncol * w) + patches.shape[3:], patches.dtype)
    for j in range(b):
        r, c = j % nrow, j // nrow
        canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = patches[j]
    return canvas


def make_heatmap(output: np.ndarray) -> np.ndarray:
    """Probability map -> jet RGB float32 (u-net_testing.ipynb cell 7)."""
    from matplotlib import cm

    return cm.jet(np.asarray(output))[..., :3].astype(np.float32)


def save_performance_as_csv(save_dir: str, rows: Sequence[Sequence], csv_name: str,
                            header: Optional[Sequence[str]] = None) -> str:
    """Write performance rows to {save_dir}/{csv_name}.csv."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{csv_name}.csv")
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(header or ["accuracy", "recall", "precision", "f1 score", "AUC score"])
        for row in rows:
            writer.writerow(list(map(str, row)))
    return path


@partial(jax.jit, static_argnames=("model", "selective"))
def _wsi_forward(model, variables, x, selective: bool):
    """Module-level jit so repeated wsi_inference calls (sweeps, per-fold
    loops) reuse the compiled executable — a closure-local @jax.jit would
    recompile on every call (~20 s per compile on the tunnel)."""
    if x.dtype == jnp.uint8:
        from ..ops.ingest import normalize_raw

        # raw-uint8 fast path: /255 and (x-.5)/.5 fused into the forward,
        # so the host ships 4x less and does zero per-pixel float math
        x = normalize_raw(x)
    out = model.apply(
        # quantized/folded serving trees have no batch_stats collection
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        x, train=False,
    )
    if selective:
        out = out[0]
    return jax.nn.sigmoid(out) if out.ndim == 3 else jax.nn.softmax(out, -1)[..., 1]


def _find_normalization(transform):
    """The Normalization instance inside ``transform`` (Compose or single),
    or None — wsi_inference must not re-normalize a dataset whose own
    transform chain already did (x - mean) / std."""
    from ..data.transforms import Normalization

    if transform is None:
        return None
    chain = getattr(transform, "transforms", [transform])
    for t in chain:
        if isinstance(t, Normalization):
            return t
    return None


def _group_by_slide(ids: List[str]) -> Dict[str, List[int]]:
    groups: Dict[str, List[int]] = {}
    for i, pid in enumerate(ids):
        slide = pid.rsplit("_", 2)[0]  # {slide_id}_{x}_{y}
        groups.setdefault(slide, []).append(i)
    return groups


def wsi_inference(
    model,
    variables: Dict,
    dataset,
    nrow: int,
    selective: bool = False,
    cut_off: float = 0.5,
    batch_size: int = 32,
    save_dir: Optional[str] = None,
    num_workers: int = 16,
) -> Dict[str, Dict]:
    """Stitched whole-slide inference + per-patch / per-WSI scoring.

    Args:
        dataset: a PatchDataset whose ids follow {slide_id}_{x}_{y}; every
            patch of a slide is stitched into one canvas of ``nrow`` rows.
    Returns:
        {slide_id: {"prob", "pred", "label", "sample", "heatmap",
                    "patch_scores", "wsi_score"}}
    """
    def forward(x):
        return _wsi_forward(model, variables, x, selective)

    # ids are derivable from filenames; decoding every patch just for its id
    # would double the pipeline's I/O
    if hasattr(dataset, "input_list"):
        ids = [name.split("_input")[0] for name in dataset.input_list]
    else:
        ids = [dataset[i]["id"] for i in range(len(dataset))]

    # throughput path: thread-pool decode (GIL-released JPEG/PNG) instead of
    # a sequential dataset[i] loop; raw uint8 + on-device preproc when the
    # dataset needs no host-side color math (same gating as data/loader.py)
    raw_mode = (
        hasattr(dataset, "get_raw")
        and getattr(dataset, "transform", None) is None
        and getattr(dataset, "input_type", "RGB") == "RGB"
    )
    pool = ThreadPoolExecutor(max_workers=num_workers)

    results: Dict[str, Dict] = {}
    for slide, indices in _group_by_slide(ids).items():
        if raw_mode:
            decoded = list(pool.map(dataset.get_raw, indices))
            inputs_u8 = np.stack([d[0] for d in decoded])
            labels = np.stack([d[1] for d in decoded])
            inputs = inputs_u8.astype(np.float32) / 255.0  # display canvas
            feed = inputs_u8
        else:
            samples = list(pool.map(dataset.__getitem__, indices))
            inputs = np.stack([s["input"] for s in samples])
            labels = np.stack([s["label"] for s in samples])
            norm = _find_normalization(getattr(dataset, "transform", None))
            if norm is not None:
                # the dataset's own transform already normalized: feed as-is,
                # and invert it for the [0,1] display canvas (re-normalizing
                # here would feed the net (x-mean)/std applied twice)
                feed = inputs
                inputs = np.clip(inputs * norm.std + norm.mean, 0.0, 1.0)
            else:
                feed = (inputs - 0.5) / 0.5

        # dispatch every batch before fetching any: jax dispatch is async, so
        # batch i+1's H2D/compute overlaps batch i's D2H fetch
        outs = [
            forward(jnp.asarray(feed[i : i + batch_size]))
            for i in range(0, len(indices), batch_size)
        ]
        prob = np.concatenate([np.asarray(o) for o in outs])
        pred = (prob > cut_off).astype(np.uint8)

        patch_scores = list(pool.map(
            lambda j: get_performance(labels[j], prob[j], pred[j]),
            range(len(indices)),
        ))
        prob_c = stitch_patches(prob, nrow)
        pred_c = stitch_patches(pred, nrow)
        label_c = stitch_patches(labels, nrow)
        sample_c = stitch_patches(inputs, nrow)
        wsi_score = get_performance(label_c, prob_c, pred_c)

        entry = {
            "prob": prob_c,
            "pred": pred_c,
            "label": label_c,
            "sample": sample_c,
            "heatmap": make_heatmap(prob_c),
            "patch_scores": np.asarray(patch_scores, dtype=np.float64),
            "patch_scores_mean": np.nanmean(np.asarray(patch_scores, np.float64), axis=0),
            "wsi_score": wsi_score,
        }
        results[slide] = entry

        if save_dir is not None:
            from PIL import Image

            os.makedirs(save_dir, exist_ok=True)
            Image.fromarray((entry["heatmap"] * 255).astype(np.uint8)).save(
                os.path.join(save_dir, f"{slide}_heatmap.png")
            )
            Image.fromarray((pred_c * 255).astype(np.uint8)).save(
                os.path.join(save_dir, f"{slide}_pred.png")
            )

    pool.shutdown()

    if save_dir is not None:
        save_performance_as_csv(
            save_dir,
            [[s] + list(r["wsi_score"]) for s, r in results.items()],
            "wsi_performance",
            header=["slide", "accuracy", "recall", "precision", "f1 score", "AUC score"],
        )
    return results


def main(argv=None) -> None:
    """CLI (``snet-wsi``): stitched whole-slide scoring over a test fold.

    Command form of reference u-net_testing.ipynb cells 4-8 (and the stripped
    check_wsi-level_mask.ipynb, .MISSING_LARGE_BLOBS:2): load the fold's test
    patches, forward every slide's patch grid, stitch sample/pred/prob
    canvases, score per patch and per stitched WSI, and save heatmaps +
    ``wsi_performance.csv`` under ``--save_dir``.
    """
    import argparse

    from ..config import parse_bool
    from ..data import PatchDataset, construct_test
    from ..models import build_model
    from ..utils.checkpoint import load_net_checkpoint, resolve_checkpoint

    parser = argparse.ArgumentParser(
        description="stitched whole-slide inference + per-patch/per-WSI scoring")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--test_fold", type=int, default=1)
    parser.add_argument("--model_path", default=None,
                        help="one specific .ckpt/.pth checkpoint")
    parser.add_argument("--model_dir", default=None,
                        help="checkpoint dir: digit-latest model_epoch{N} wins")
    parser.add_argument("--model_arch", default="UNet_B",
                        choices=["UNet", "UNet_B"])
    parser.add_argument("--n_cls", type=int, default=2)
    parser.add_argument("--selective", type=parse_bool, default=False)
    parser.add_argument("--input_type", default="RGB",
                        choices=["RGB", "GH", "H_RGB"])
    parser.add_argument("--blankfield", type=parse_bool, default=False,
                        help="apply blank-field correction — required for "
                             "checkpoints trained with --blankfield 1 (the "
                             "BC/GH_BC sweep variants)")
    parser.add_argument("--patch_mag", type=int, default=200)
    parser.add_argument("--patch_size", type=int, default=256)
    parser.add_argument("--nrow", type=int, required=True,
                        help="rows in each slide's patch grid (the notebook's "
                             "3x6 layout used nrow=3, cell 4)")
    parser.add_argument("--cut_off", type=float, default=0.5)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--num_workers", type=int, default=16)
    parser.add_argument("--compute_dtype", default="bfloat16")
    parser.add_argument("--quantize", default="none", choices=["none", "int8"],
                        help="int8: W8A8 quantized serving trunk (BN-folded; "
                             "measured 1.27x over bf16, docs/RESULTS.md). "
                             "Activation scales calibrate on the test fold's "
                             "first patches")
    parser.add_argument("--calib_patches", type=int, default=8,
                        help="how many patches calibrate the int8 activation "
                             "scales (--quantize int8)")
    parser.add_argument("--save_dir", default=None,
                        help="write {slide}_heatmap.png / {slide}_pred.png + "
                             "wsi_performance.csv here")
    a = parser.parse_args(argv)

    try:
        ckpt = resolve_checkpoint(a.model_path, a.model_dir)
    except ValueError as e:
        parser.error(str(e))

    model = build_model(a.model_arch, a.n_cls, a.selective, a.compute_dtype)
    variables = load_net_checkpoint(ckpt)
    data_list = construct_test(a.data_dir, test_fold=a.test_fold)
    # default: no transform, so wsi_inference takes the raw-uint8
    # device-preproc fast path for RGB and normalizes GH itself (its
    # raw_mode / norm handling). Blankfield needs host-side color math, so
    # it rides the transform path (applied after stain conversion, matching
    # the train/eval pipelines; wsi_inference then normalizes the fed batch).
    transform = None
    if a.blankfield:
        from ..data.transforms import BlankfieldCorrection, Compose

        transform = Compose([BlankfieldCorrection()])
    dataset = PatchDataset(a.data_dir, data_list, a.patch_mag, a.patch_size,
                           a.input_type, transform=transform)
    if a.quantize == "int8":
        if a.calib_patches < 1:
            parser.error(f"--calib_patches must be >= 1, got {a.calib_patches}")
        from ..ops.quant import quantize_serving

        n_calib = min(a.calib_patches, len(dataset))
        calib = np.stack([np.asarray(dataset[i]["input"], np.float32)
                          for i in range(n_calib)])
        model, variables = quantize_serving(
            a.model_arch, a.n_cls, a.selective, a.compute_dtype, variables,
            calib)
        print(f"int8 serving trunk: calibrated on {n_calib} patches")
    print(f"checkpoint: {ckpt} ({a.model_arch}, selective={a.selective}"
          + (", int8" if a.quantize == "int8" else "") + ")")
    print(f"test fold {a.test_fold}: {len(dataset)} patches")

    results = wsi_inference(
        model, variables, dataset, a.nrow, selective=a.selective,
        cut_off=a.cut_off, batch_size=a.batch_size, save_dir=a.save_dir,
        num_workers=a.num_workers,
    )
    if not results:
        print(f"no slides found in test fold {a.test_fold} of {a.data_dir}")
        return
    header = ("accuracy", "recall", "precision", "f1", "auc")
    fmt = lambda vals: " ".join(f"{m}={v:.4f}" for m, v in zip(header, vals))
    wsi_scores = []
    for slide, entry in results.items():
        wsi_scores.append(entry["wsi_score"])
        print(f"[{slide}] WSI {fmt(entry['wsi_score'])}")
        print(f"[{slide}] patch-mean {fmt(entry['patch_scores_mean'])}")
    mean = np.nanmean(np.asarray(wsi_scores, np.float64), axis=0)
    print(f"[nanmean over {len(results)} slides] {fmt(mean)}")


if __name__ == "__main__":
    main()
