"""Selection-threshold calibration (TPU-native extension).

The reference evaluates with a fixed ``--s_cut_off 0.5`` (eval.py:45): the
fraction of pixels actually rejected is whatever the trained selection head
happens to produce at 0.5 — it tracks the train-time ``--target_coverage``
only loosely. This tool picks the threshold that achieves a REQUESTED
empirical coverage on a calibration split (SelectiveNet's standard post-hoc
calibration step): run the selective model once, accumulate an on-device
histogram of the selection confidence g = sigmoid(selection) over valid
pixels, and return the (1 - coverage)-quantile as the threshold.

Usage::

    python -m selectivenet_for_semantic_segmentation_binary_tpu.tools.calibrate \
        --data_dir /data --fold 1 --model_dir /model/1-fold/checkpoint \
        --model_arch UNet_B --target_coverage 0.8

then evaluate with the printed ``--s_cut_off``.
"""

from __future__ import annotations

import argparse
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EvalConfig, parse_bool
from ..parallel.mesh import make_mesh, replicate
from ..train_lib import device_preprocess

N_BINS = 4096


def make_histogram_step(model, n_cls: int):
    """Jitted (variables, batch) -> int32[N_BINS] histogram of the selection
    confidence sigmoid(selection) over valid (non-padded) pixels.

    The histogram always lives in sigmoid space — sigmoid is monotonic, so
    quantiles commute and the caller maps the threshold back to logit space
    when eval will compare raw logits (single_scale != 'sigmoid')."""

    def step(variables, batch):
        x, label = device_preprocess(batch)
        out = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x, train=False,
        )
        _output, selection, _aux = out
        if selection.ndim != 3:
            # CE-form (UNet) selection is a 2-channel softmax evaluated by
            # argmax — eval never consults s_cut_off there (eval_lib's 4-D
            # branch), so a calibrated threshold would be unusable.
            raise ValueError(
                "s_cut_off calibration applies to binary (BCE-form, UNet_B) "
                "selection heads only; CE-form selection is argmax-evaluated"
            )
        g = jax.nn.sigmoid(selection)
        valid = (label >= 0) & (label < n_cls)
        idx = jnp.clip((g * N_BINS).astype(jnp.int32), 0, N_BINS - 1)
        # one histogram bump per valid pixel; invalid pixels land in a
        # scratch bin that is dropped on the host
        idx = jnp.where(valid, idx, N_BINS)
        return jnp.zeros(N_BINS + 1, jnp.int32).at[idx.reshape(-1)].add(1)[:N_BINS]

    return jax.jit(step)


def make_rc_histogram_step(model, cfg: EvalConfig):
    """Jitted (variables, batch) -> int32[N_BINS, 2] joint histogram of
    (selection-confidence bin, prediction correctness) over valid pixels —
    the sufficient statistic for the whole risk-coverage curve in one pass."""
    apply_sigmoid = getattr(cfg, "single_scale", "sigmoid") == "sigmoid"

    def step(variables, batch):
        x, label = device_preprocess(batch)
        out = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x, train=False,
        )
        output, selection, _aux = out
        if selection.ndim != 3:
            raise ValueError(
                "risk-coverage analysis applies to binary (BCE-form, UNet_B) "
                "selection heads only; CE-form selection is argmax-evaluated"
            )
        g = jax.nn.sigmoid(selection)
        prob = jax.nn.sigmoid(output) if apply_sigmoid else output
        pred = (prob > cfg.cut_off).astype(jnp.int32)
        correct = (pred == label).astype(jnp.int32)
        valid = (label >= 0) & (label < cfg.n_cls)
        idx = jnp.clip((g * N_BINS).astype(jnp.int32), 0, N_BINS - 1)
        idx = jnp.where(valid, idx, N_BINS)  # scratch row, dropped on host
        hist = jnp.zeros((N_BINS + 1, 2), jnp.int32)
        hist = hist.at[idx.reshape(-1), correct.reshape(-1)].add(1)
        return hist[:N_BINS]

    return jax.jit(step)


def curve_from_histogram(hist2d: np.ndarray) -> Dict[str, np.ndarray]:
    """(N_BINS, 2) [incorrect, correct] counts -> monotone coverage sweep.

    Row i of the output is the operating point 's_cut_off = i / N_BINS'
    (sigmoid space): coverage = P(g >= t), selective_risk = P(wrong | g >= t)
    — the standard SelectiveNet risk-coverage trade-off curve."""
    total = int(hist2d.sum())
    if total == 0:
        raise ValueError("empty calibration split")
    tail = np.cumsum(hist2d[::-1], axis=0)[::-1].astype(np.float64)
    selected = tail.sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        risk = np.where(selected > 0, tail[:, 0] / selected, np.nan)
    return {
        "threshold": np.arange(N_BINS) / N_BINS,
        "coverage": selected / total,
        "selective_risk": risk,
        "selective_accuracy": 1.0 - risk,
    }


def _accumulate(loader, variables, step) -> np.ndarray:
    # device-side accumulation, one D2H fetch after the loop (the eval_lib
    # pattern) — a per-batch device_get would serialize decode vs compute
    hists = []
    for batch in loader:
        device_batch = {k: batch[k] for k in ("input", "label", "flips") if k in batch}
        hists.append(step(variables, device_batch))
    return np.sum(np.asarray(jax.device_get(hists), np.int64), axis=0)


def _load_single(cfg: EvalConfig, verbose: bool = True):
    from ..models import build_model
    from ..utils.checkpoint import list_checkpoints, load_latest_checkpoint

    if not cfg.selective:
        raise ValueError("calibration requires a selective model")
    if cfg.model_arch[0] != "UNet_B":
        raise ValueError(
            "s_cut_off calibration applies to binary (BCE-form, UNet_B) "
            "selection heads only; CE-form (UNet) selection is argmax-evaluated"
        )
    mesh = make_mesh(cfg.n_devices)
    # A default training run keeps EVERY epoch in the checkpoint dir; unlike
    # eval (which would ensemble them), calibration targets one model — the
    # digit-latest, matching resume semantics (net_utils.py:18-24).
    found = load_latest_checkpoint(cfg.model_dir)  # parses the winner ONCE
    if found is None:
        raise FileNotFoundError(f"no .ckpt/.pth checkpoints in {cfg.model_dir}")
    path, epoch, payload = found
    n = len(list_checkpoints(cfg.model_dir))
    if verbose and n > 1:
        print(f"calibrating the digit-latest of {n} checkpoints: epoch {epoch}")
    model = build_model(cfg.model_arch[0], cfg.n_cls, cfg.selective,
                        cfg.compute_dtype)
    return mesh, model, replicate(payload["net"], mesh)


def _to_eval_space(t, single_scale: str):
    """Sigmoid-space threshold(s) -> whatever space eval will threshold in:
    identity for --single_scale sigmoid, else the (monotonic) logit — eval's
    non-sigmoid modes compare RAW selection logits (eval.py:241-243)."""
    if single_scale == "sigmoid":
        return t
    lo, hi = 1.0 / (2 * N_BINS), 1.0 - 1.0 / (2 * N_BINS)
    t = np.clip(np.asarray(t, np.float64), lo, hi)
    out = np.log(t / (1.0 - t))
    return float(out) if out.ndim == 0 else out


def risk_coverage_curve(cfg: EvalConfig, data_list=None,
                        csv_path: Optional[str] = None,
                        verbose: bool = True) -> Dict[str, np.ndarray]:
    """Full risk-coverage trade-off of a selective checkpoint in one pass.

    The returned/written ``threshold`` column is in EVAL space (sigmoid for
    --single_scale sigmoid, raw-logit otherwise), so any row's s_cut_off can
    be passed to eval.py directly. Also returns ``histogram2d`` — its
    ``sum(axis=1)`` marginal is exactly the calibration histogram, so callers
    needing both never run the split twice."""
    from ..eval_lib import make_eval_loader

    # a fleet runs this on every host; only host 0 may write/print (same
    # discipline as eval_lib's CSV export) — concurrent open('w') on a shared
    # filesystem tears the file
    verbose = verbose and jax.process_index() == 0
    mesh, model, variables = _load_single(cfg, verbose)
    loader = make_eval_loader(cfg, mesh, data_list=data_list)
    hist2d = _accumulate(loader, variables, make_rc_histogram_step(model, cfg))
    curve = curve_from_histogram(hist2d)
    single_scale = getattr(cfg, "single_scale", "sigmoid")
    curve["threshold"] = _to_eval_space(curve["threshold"], single_scale)
    curve["histogram2d"] = hist2d

    if csv_path and jax.process_index() == 0:
        import csv as _csv
        import os as _os

        d = _os.path.dirname(csv_path)
        if d:
            _os.makedirs(d, exist_ok=True)
        with open(csv_path, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["s_cut_off", "coverage", "selective_risk",
                        "selective_accuracy"])
            for i in range(N_BINS):
                w.writerow([curve["threshold"][i], curve["coverage"][i],
                            curve["selective_risk"][i],
                            curve["selective_accuracy"][i]])
        if verbose:
            print(f"risk-coverage curve ({N_BINS} points, thresholds in "
                  f"--single_scale {single_scale} eval space) -> {csv_path}")
    if verbose:
        for cov in (1.0, 0.9, 0.8, 0.7, 0.5):
            i = int(np.argmin(np.abs(curve["coverage"] - cov)))
            print(f"    coverage {curve['coverage'][i]:.3f} @ s_cut_off "
                  f"{curve['threshold'][i]:.4f}: selective accuracy "
                  f"{curve['selective_accuracy'][i]:.4f}")
    return curve


def threshold_for_coverage(hist: np.ndarray, target_coverage: float) -> Dict[str, float]:
    """Largest bin edge t with P(g >= t) >= target_coverage — the
    (1 - coverage)-quantile, erring on the inclusive side so the achieved
    coverage is never below the request (up to one bin of granularity)."""
    total = int(hist.sum())
    if total == 0:
        raise ValueError("empty calibration split")
    # cov[i] = fraction of pixels with g >= the lower edge of bin i
    cov = (np.cumsum(hist[::-1])[::-1] / total).astype(np.float64)
    ok = np.nonzero(cov >= target_coverage)[0]
    bin_idx = int(ok[-1]) if len(ok) else 0
    return {
        "s_cut_off": bin_idx / N_BINS,
        "achieved_coverage": float(cov[bin_idx]),
        "n_pixels": total,
    }


def calibrate(cfg: EvalConfig, target_coverage: float = 0.8,
              data_list=None, verbose: bool = True) -> Dict[str, float]:
    """Calibrate s_cut_off for ``target_coverage`` on the test fold (or an
    explicit ``data_list`` — pass the VALID split to keep the test fold
    untouched, the methodologically clean choice)."""
    from ..eval_lib import make_eval_loader

    verbose = verbose and jax.process_index() == 0  # one report per fleet
    mesh, model, variables = _load_single(cfg, verbose)
    loader = make_eval_loader(cfg, mesh, data_list=data_list)
    hist = _accumulate(loader, variables, make_histogram_step(model, cfg.n_cls))
    return _finish_calibration(
        hist, target_coverage, getattr(cfg, "single_scale", "sigmoid"), verbose
    )


def _finish_calibration(hist: np.ndarray, target_coverage: float,
                        single_scale: str, verbose: bool) -> Dict[str, float]:
    verbose = verbose and jax.process_index() == 0  # one report per fleet
    res = threshold_for_coverage(hist, target_coverage)
    res["s_cut_off"] = _to_eval_space(res["s_cut_off"], single_scale)
    res["space"] = "sigmoid" if single_scale == "sigmoid" else "logit"
    if verbose:
        print(f"calibrated on {res['n_pixels']:,} pixels: "
              f"--s_cut_off {res['s_cut_off']:.6f} ({res['space']} space, "
              f"--single_scale {single_scale}) "
              f"-> empirical coverage {res['achieved_coverage']:.4f} "
              f"(requested {target_coverage})")
    return res


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--data_dir", required=True)
    p.add_argument("--fold", "--test_fold", dest="fold", type=int, required=True)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--model_arch", default="UNet_B")
    p.add_argument("--input_type", default="RGB")
    p.add_argument("--patch_mag", type=int, default=200)
    p.add_argument("--patch_size", type=int, default=256)
    p.add_argument("--n_cls", type=int, default=2)
    p.add_argument("--blankfield", type=parse_bool, default=False,
                   help="apply blank-field correction — required to calibrate "
                        "models trained with --blankfield 1 (BC/GH_BC sweep "
                        "variants); mismatched preprocessing silently biases "
                        "the calibrated threshold")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--single_scale", default="sigmoid",
                   choices=["None", "clip", "minmax", "sigmoid"],
                   help="must match the --single_scale you will evaluate with; "
                        "non-sigmoid modes get a raw-logit threshold")
    p.add_argument("--target_coverage", type=float, default=0.8)
    p.add_argument("--split", choices=["test", "valid"], default="valid",
                   help="calibration split; 'valid' keeps the test fold clean")
    p.add_argument("--seed", type=int, default=42,
                   help="train/valid split seed — must match the --seed the "
                        "model was trained with, or the 'valid' split overlaps "
                        "the training data and biases the threshold")
    p.add_argument("--curve_csv", default=None,
                   help="also sweep the full risk-coverage curve and write it "
                        "as CSV (s_cut_off, coverage, risk, accuracy rows)")
    a = p.parse_args(argv)

    cfg = EvalConfig(
        data_dir=a.data_dir, test_fold=a.fold, model_dir=a.model_dir,
        model_arch=[a.model_arch], selective=True, select_eval=True,
        input_type=a.input_type, patch_mag=a.patch_mag, patch_size=a.patch_size,
        n_cls=a.n_cls, batch_size=a.batch_size, single_scale=a.single_scale,
        blankfield=a.blankfield,
    )
    data_list = None
    if a.split == "valid":
        from ..data import construct_train_valid

        _train, data_list = construct_train_valid(a.data_dir, test_fold=a.fold,
                                                  seed=a.seed)
    if a.curve_csv:
        # one pass serves both: the rc histogram's correctness marginal IS
        # the calibration histogram
        curve = risk_coverage_curve(cfg, data_list=data_list, csv_path=a.curve_csv)
        _finish_calibration(curve["histogram2d"].sum(axis=1),
                            a.target_coverage, a.single_scale, True)
    else:
        calibrate(cfg, a.target_coverage, data_list=data_list)


if __name__ == "__main__":
    main()
