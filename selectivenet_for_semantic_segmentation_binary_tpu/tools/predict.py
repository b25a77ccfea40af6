"""Standalone image -> mask prediction CLI (``snet-predict``).

The reference had a standalone-inference story — ``u-net_inference.ipynb``
and ``check_wsi-level_mask.ipynb`` existed but were stripped from the repo as
large blobs (reference .MISSING_LARGE_BLOBS:1-3), and the surviving
arbitrary-size FCN demo is u-net_testing.ipynb cells 64-74 (normalize a crop,
single forward, jet heatmap). This CLI is that capability as a command:

* arbitrary JPEG/PNG images (any size) in; probability map, binary mask, jet
  heatmap, and — for selective checkpoints — the selection (coverage) mask
  out, named ``{stem}_pred.png`` / ``{stem}_heatmap.png`` / ... next to the
  input or under ``--save_dir`` (outputs are keyed by the input's basename
  stem: within one run colliding stems are disambiguated ``{stem}_2``, ...;
  across runs same-stem outputs overwrite, which is what makes re-runs
  idempotent);
* inference through the serving :class:`~..predictor.Predictor` (BN-folded
  bf16 forward by default, native ``.ckpt`` or reference ``.pth`` weights);
* images are edge-padded to the pool grid (dims divisible by 8) and the
  outputs cropped back, so any size works — exactly, not approximately;
* ``--tile H W`` switches to the bounded-memory exact tiled path
  (tools/tiled_inference.py) for slides too large for one forward.

``--uncertainty N`` adds MC-dropout uncertainty: N stochastic forwards per
image, aggregated on device into mean probability / per-element variance /
negated class-mean-variance confidence — exactly the aggregation the
reference specifies in its numpy simulation (check_MC_dropout.ipynb cells
0-4; the reference model has no dropout layer, so it never wired the math to
a model — here ``--dropout_rate`` > 0 enables serving-time dropout,
models/unet.py). Emits ``{stem}_uncertainty.npz`` + a ``{stem}_variance.png``
map, and derives pred/prob from the MC predictive mean.

GH (Gray+Hematoxylin) checkpoints are served by converting each RGB input
with the reference's stain transform (data_utils.py:13-27) before the
forward (``--input_type GH``); ``--input_type H_RGB`` re-renders the
Hematoxylin plane back to a 3-channel RGB image (data_utils.py:29-41), the
reference's other first-class stain input; ``--blankfield 1`` applies the same
white-balance correction the BC/GH_BC training variants use
(data/transforms.py::BlankfieldCorrection, after stain conversion exactly
like the train/eval pipelines).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .tiled_inference import GRID  # the trunk max-pools 3x: dims % 8 == 0


_OUTPUT_SUFFIXES = ("_pred.png", "_heatmap.png", "_selection.png", "_label.png")


def _collect_inputs(paths: List[str]) -> List[str]:
    """Expand directories into their image files; skip labels and our own
    previously-written outputs so re-runs on a directory are idempotent."""
    out: List[str] = []
    for p in paths:
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                if not name.lower().endswith((".jpg", ".jpeg", ".png")):
                    continue
                if name.lower().endswith(_OUTPUT_SUFFIXES):
                    continue
                out.append(os.path.join(p, name))
        else:
            if not os.path.isfile(p):
                raise FileNotFoundError(
                    f"input image does not exist: {p}")  # fail BEFORE any
                    # checkpoint load / device work, not mid-batch
            out.append(p)
    if not out:
        raise FileNotFoundError(f"no input images found in {paths}")
    return out


def _load_image(path: str, input_type: str,
                blankfield: bool = False) -> np.ndarray:
    """Decode to (H, W, C): raw uint8 for plain RGB (the device fuses
    /255 + normalization into the forward and the transfer ships 1
    byte/pixel, ops/ingest.py), float32 [0, 1] when a host-side float
    transform applies — GH/H_RGB run the reference's stain transform
    (RGB2GH, data_utils.py:13-27) exactly like the train pipeline;
    blankfield applies BlankfieldCorrection AFTER stain conversion,
    matching the train/eval transform order (train_lib.py make_loaders)."""
    from PIL import Image

    raw = np.asarray(Image.open(path).convert("RGB"))
    if input_type == "RGB" and not blankfield:
        return raw  # uint8 fast path
    img = raw.astype(np.float32) / 255.0
    if input_type == "GH":
        from ..data.stain import RGB2GH

        img = RGB2GH(img)
    elif input_type == "H_RGB":
        from ..data.stain import H_RGB

        img = H_RGB(img)
    if blankfield:
        from ..data.transforms import BlankfieldCorrection

        img = BlankfieldCorrection()({"input": img}, None)["input"]
    return img


def _pad_to_grid(img: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """Edge-pad (H, W, C) so both dims divide GRID; returns original dims."""
    h, w = img.shape[:2]
    ph, pw = (-h) % GRID, (-w) % GRID
    if ph or pw:
        # edge (replicate) padding: valid for any pad width, unlike reflect,
        # which requires pad < dim and would reject tiny images
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return img, h, w


def predict_image(
    predictor,
    image: np.ndarray,
    tile: Optional[Tuple[int, int]] = None,
    batch_size: int = 8,
    mesh=None,
) -> Dict[str, np.ndarray]:
    """One (H, W, C) raw image (float [0, 1] or uint8 [0, 255]) ->
    {'prob', 'pred'[, 'selection']}.

    Handles the pool-grid padding around either the whole-image forward or
    the exact tiled path; every output is cropped back to (H, W). uint8
    images keep their dtype through the padding so the device transfer
    stays 1 byte/pixel (ops/ingest.py).
    """
    padded, h, w = _pad_to_grid(np.asarray(image))
    if tile is not None:
        out = predictor.predict_wsi(padded, tile=tile, batch_size=batch_size,
                                    mesh=mesh)
    else:
        raw = predictor.predict(padded[None])
        out = {k: v[0] for k, v in raw.items() if k in ("prob", "pred", "selection")}
    out = {k: v[:h, :w] for k, v in out.items()}
    # a bf16 serving graph yields ml_dtypes bfloat16 maps, which PIL/matplotlib
    # reject — standardize the output dtypes at the API edge
    out["prob"] = np.asarray(out["prob"], np.float32)
    return out


def predict_image_with_uncertainty(
    predictor,
    image: np.ndarray,
    n_iter: int,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """One (H, W, C) raw [0, 1] image -> MC-dropout aggregation maps.

    The reference's aggregation (check_MC_dropout.ipynb cells 0-4): ``n_iter``
    stochastic forwards -> per-element variance across repeats -> mean over
    the class axis, negated as confidence. Pads to the pool grid and crops
    back exactly like :func:`predict_image` (uint8 images stay uint8 for
    the transfer). Returns float32
    {'mean_prob' (H, W, C), 'variance' (H, W, C), 'confidence' (H, W)}.
    """
    padded, h, w = _pad_to_grid(np.asarray(image))
    out = predictor.predict_with_uncertainty(padded[None], n_iter=n_iter,
                                             seed=seed)
    return {k: np.asarray(v[0], np.float32)[:h, :w] for k, v in out.items()}


def _mc_pred(unc: Dict[str, np.ndarray], cut_off: float) -> Dict[str, np.ndarray]:
    """pred/prob from the MC predictive mean (the standard MC-dropout
    decision rule): binary heads threshold the mean sigmoid probability at
    cut_off; CE heads argmax the mean softmax."""
    mp = unc["mean_prob"]
    if mp.shape[-1] == 1:
        prob = mp[..., 0]
        pred = (prob > cut_off).astype(np.uint8)
    else:
        prob = mp[..., 1]
        pred = np.argmax(mp, axis=-1).astype(np.uint8)
    return {"prob": prob.astype(np.float32), "pred": pred}


def _save_uncertainty(unc: Dict[str, np.ndarray], stem: str, save_dir: str,
                      heatmap: bool) -> List[str]:
    """{stem}_uncertainty.npz (mean_prob/variance/confidence) + a
    min-max-normalized class-mean-variance PNG (jet when matplotlib is
    available and --heatmap 1, grayscale otherwise)."""
    from PIL import Image

    os.makedirs(save_dir, exist_ok=True)
    written: List[str] = []
    npz_path = os.path.join(save_dir, f"{stem}_uncertainty.npz")
    np.savez(npz_path, **{k: v.astype(np.float32) for k, v in unc.items()})
    written.append(npz_path)

    var = -unc["confidence"]  # class-mean variance (confidence is its negation)
    spread = float(var.max() - var.min())
    norm = (var - var.min()) / spread if spread > 0 else np.zeros_like(var)
    img = (norm * 255).astype(np.uint8)
    if heatmap:
        try:
            from .wsi import make_heatmap

            img = (make_heatmap(norm) * 255).astype(np.uint8)
        except ImportError:  # matplotlib optional; grayscale fallback
            pass
    png_path = os.path.join(save_dir, f"{stem}_variance.png")
    Image.fromarray(img).save(png_path)
    written.append(png_path)
    return written


def _save_outputs(out: Dict[str, np.ndarray], stem: str, save_dir: str,
                  save_prob: bool, heatmap: bool, n_cls: int = 2) -> List[str]:
    from PIL import Image

    os.makedirs(save_dir, exist_ok=True)
    written: List[str] = []

    def _write_png(suffix: str, arr: np.ndarray) -> None:
        path = os.path.join(save_dir, f"{stem}{suffix}")
        Image.fromarray(arr).save(path)
        written.append(path)

    # space CE-head class ids evenly over gray levels; binary (n_cls=2) keeps
    # the 0/255 convention. Plain *255 wraps in uint8 for class ids >= 2.
    scale = np.uint8(255 // max(int(n_cls) - 1, 1))
    _write_png("_pred.png", (out["pred"].astype(np.uint8) * scale))
    if "selection" in out:
        _write_png("_selection.png", (out["selection"].astype(np.uint8) * 255))
    if heatmap:
        try:
            from .wsi import make_heatmap

            _write_png("_heatmap.png",
                       (make_heatmap(out["prob"]) * 255).astype(np.uint8))
        except ImportError:  # matplotlib is optional; degrade, don't fail
            print(f"  (matplotlib unavailable: skipping {stem}_heatmap.png)")
    if save_prob:
        path = os.path.join(save_dir, f"{stem}_prob.npy")
        np.save(path, out["prob"].astype(np.float32))
        written.append(path)
    return written


def main(argv=None) -> None:
    """CLI: python -m selectivenet_for_semantic_segmentation_binary_tpu.tools.predict"""
    import argparse

    from ..config import parse_bool

    parser = argparse.ArgumentParser(
        description="standalone image -> tumor mask prediction (whole-image "
                    "or exact tiled inference through the serving Predictor)")
    parser.add_argument("inputs", nargs="+",
                        help="image files and/or directories of JPEG/PNG images")
    parser.add_argument("--model_path", default=None,
                        help="one specific .ckpt/.pth checkpoint")
    parser.add_argument("--model_dir", default=None,
                        help="checkpoint dir: the digit-latest model_epoch{N} "
                             "file is used (reference resume convention)")
    parser.add_argument("--model_arch", default="UNet_B",
                        choices=["UNet", "UNet_B"])
    parser.add_argument("--n_cls", type=int, default=2)
    parser.add_argument("--selective", type=parse_bool, default=False)
    parser.add_argument("--input_type", default="RGB",
                        choices=["RGB", "GH", "H_RGB"])
    parser.add_argument("--blankfield", type=parse_bool, default=False,
                        help="apply blank-field (white-balance) correction — "
                             "required for checkpoints trained with "
                             "--blankfield 1 (the BC/GH_BC sweep variants)")
    parser.add_argument("--compute_dtype", default="bfloat16")
    parser.add_argument("--cut_off", type=float, default=0.5)
    parser.add_argument("--s_cut_off", type=float, default=0.5)
    parser.add_argument("--fold_bn", type=parse_bool, default=True,
                        help="fold BatchNorm into the convs (serving graph)")
    parser.add_argument("--quantize", default="none", choices=["none", "int8"],
                        help="int8: W8A8 quantized serving trunk (measured "
                             "1.27x over the bf16 folded forward on v5e, "
                             "docs/RESULTS.md). Activation scales calibrate "
                             "on the first image (whole-image path) or a "
                             "center crop of the first slide (--tile path) "
                             "unless --calib_images is given; requires "
                             "--fold_bn 1")
    parser.add_argument("--calib_images", nargs="+", default=None,
                        metavar="PATH",
                        help="representative images (files or directories) "
                             "that calibrate the int8 activation scales "
                             "up front instead of the lazy first-input "
                             "calibration — same semantics as snet-serve; "
                             "preprocessed exactly like the inputs "
                             "(--input_type / --blankfield). Scales widen "
                             "monotonically with more samples (absmax), so "
                             "a stain-diverse sample is never less safe")
    parser.add_argument("--tile", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="bounded-memory exact tiled inference with this "
                             "output tile (dims divisible by 8); default is "
                             "one whole-image forward")
    parser.add_argument("--batch_size", type=int, default=8,
                        help="windows per device batch on the tiled path")
    parser.add_argument("--shard_windows", type=parse_bool, default=False,
                        help="shard tiled-path window batches across all "
                             "visible chips (data-parallel windows, zero "
                             "cross-chip communication; requires --tile)")
    parser.add_argument("--uncertainty", type=int, default=0, metavar="N",
                        help="MC-dropout uncertainty: N stochastic forwards "
                             "per image, aggregated on device into "
                             "{stem}_uncertainty.npz (mean_prob/variance/"
                             "confidence) + {stem}_variance.png (reference "
                             "check_MC_dropout.ipynb cells 0-4); requires "
                             "--dropout_rate > 0")
    parser.add_argument("--dropout_rate", type=float, default=0.0,
                        help="serving-time dropout rate for --uncertainty "
                             "(the reference model has no dropout layer; "
                             "these models accept one, models/unet.py)")
    parser.add_argument("--mc_seed", type=int, default=0,
                        help="PRNG seed for the MC-dropout forwards")
    parser.add_argument("--save_dir", default=None,
                        help="output directory (default: next to each input)")
    parser.add_argument("--save_prob", type=parse_bool, default=False,
                        help="also write {stem}_prob.npy float32 maps")
    parser.add_argument("--heatmap", type=parse_bool, default=True)
    a = parser.parse_args(argv)

    tile = tuple(a.tile) if a.tile else None
    if tile and any(t <= 0 or t % GRID for t in tile):
        parser.error(f"--tile dims must be positive multiples of {GRID}, "
                     f"got {tile}")
    if a.batch_size <= 0:
        parser.error(f"--batch_size must be positive, got {a.batch_size}")
    if a.shard_windows and tile is None:
        parser.error("--shard_windows requires --tile (whole-image forwards "
                     "run on one chip)")
    if a.uncertainty < 0:
        parser.error(f"--uncertainty must be >= 0, got {a.uncertainty}")
    if a.uncertainty:
        if a.dropout_rate <= 0:
            parser.error("--uncertainty requires --dropout_rate > 0: with no "
                         "dropout every stochastic forward is identical and "
                         "the variance is zero (the reference model has no "
                         "dropout layer — check_MC_dropout.ipynb only specs "
                         "the aggregation math)")
        if tile is not None:
            parser.error("--uncertainty runs whole-image forwards; it is "
                         "incompatible with --tile")
    elif a.dropout_rate > 0:
        parser.error("--dropout_rate without --uncertainty has no effect "
                     "(inference dropout only runs on the MC path); remove "
                     "the flag or add --uncertainty N")
    if a.quantize == "int8":
        if not a.fold_bn:
            parser.error("--quantize int8 requires --fold_bn 1 (the int8 "
                         "trunk consumes BN-folded weights, ops/quant.py)")
        if a.uncertainty:
            parser.error("--quantize int8 and --uncertainty are exclusive "
                         "(MC-dropout uncertainty runs the bf16 folded graph)")
    elif a.calib_images:
        parser.error("--calib_images without --quantize int8 has no effect")

    from ..utils.checkpoint import resolve_checkpoint

    try:
        ckpt = resolve_checkpoint(a.model_path, a.model_dir)
    except ValueError as e:
        parser.error(str(e))

    inputs = _collect_inputs(a.inputs)  # validate before the checkpoint load

    from ..predictor import Predictor

    predictor = Predictor(
        ckpt, model_arch=a.model_arch, n_cls=a.n_cls, selective=a.selective,
        compute_dtype=a.compute_dtype, cut_off=a.cut_off,
        s_cut_off=a.s_cut_off, fold_bn=a.fold_bn,
        dropout_rate=a.dropout_rate, quantize=a.quantize,
    )
    if a.quantize == "int8" and a.calib_images:
        calib_paths = _collect_inputs(a.calib_images)
        calib = [_pad_to_grid(_load_image(p, a.input_type, a.blankfield))[0]
                 for p in calib_paths]
        predictor.calibrate(calib)
        print(f"int8 serving trunk: calibrated on {len(calib)} images")
    mesh = None
    if a.shard_windows:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"sharding window batches over {mesh.devices.size} chips")
    print(f"checkpoint: {ckpt} ({a.model_arch}, selective={a.selective}, "
          f"fold_bn={a.fold_bn}, {a.compute_dtype}"
          + (", int8" if a.quantize == "int8" else "") + ")")

    seen_stems = set()
    padded_shapes = set()
    for path in inputs:
        image = _load_image(path, a.input_type, a.blankfield)
        unc = None
        if a.uncertainty:
            unc = predict_image_with_uncertainty(predictor, image,
                                                 a.uncertainty, a.mc_seed)
            out = _mc_pred(unc, a.cut_off)
        else:
            out = predict_image(predictor, image, tile=tile,
                                batch_size=a.batch_size, mesh=mesh)
        base = os.path.splitext(os.path.basename(path))[0]
        save_dir = a.save_dir or (os.path.dirname(os.path.abspath(path)))
        # disambiguate colliding stems (a.png + a.jpg, or same-named inputs
        # from different directories funneled into one --save_dir)
        stem, n = base, 2
        while (save_dir, stem) in seen_stems:
            stem = f"{base}_{n}"
            n += 1
        seen_stems.add((save_dir, stem))
        _save_outputs(out, stem, save_dir, a.save_prob, a.heatmap,
                      n_cls=a.n_cls)
        if unc is not None:
            _save_uncertainty(unc, stem, save_dir, a.heatmap)
        line = (f"{path}: {image.shape[0]}x{image.shape[1]} "
                f"tumor_fraction={float(out['pred'].mean()):.4f}")
        if "selection" in out:
            line += f" coverage={float(out['selection'].mean()):.4f}"
        if unc is not None:
            line += (f" mc_iters={a.uncertainty}"
                     f" mean_var={float(unc['variance'].mean()):.3e}")
        print(line, flush=True)
        if tile is None:
            # whole-image forwards jit-compile once PER padded shape; remote
            # compiles are expensive (docs/RESULTS.md: 24-1128 s each on the
            # tunnel) — steer mixed-size batch runs to the tiled path, whose
            # window shape is fixed
            h, w = image.shape[:2]
            padded_shapes.add(((-h) % GRID + h, (-w) % GRID + w))
            if len(padded_shapes) == 4:
                print("note: 4+ distinct image sizes seen — each size "
                      "compiles its own forward; --tile H W compiles once "
                      "for any mix of sizes", flush=True)


if __name__ == "__main__":
    main()
