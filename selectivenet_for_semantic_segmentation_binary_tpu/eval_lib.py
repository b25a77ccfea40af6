"""Evaluation driver: single model, ensemble, and selective in-coverage paths.

Capability parity with reference eval.py:76-280, re-designed for TPU:

* checkpoint discovery: every .ckpt/.pth in model_dir is loaded; one
  model_arch entry is replicated across all checkpoints (eval.py:116-120);
* single model: forward, sigmoid-if-requested (only 'sigmoid' affects the
  threshold stage; 'clip'/'minmax' are accepted no-ops there), cut_off
  threshold (eval.py:201-233);
* ensemble (>1 checkpoint): instead of looping nets per batch on the host
  (eval.py:209-222), the checkpoints are STACKED into one leading-axis pytree
  and the forward is ``vmap``-ed over it — one XLA program computes all
  members' outputs and their (optionally rescaled) mean on device. Selective
  ensemble is unsupported exactly like the reference (eval.py:208);
* selective in-coverage evaluation: selection thresholded at s_cut_off masks
  the confusion matrix; rejection ratio reported (eval.py:235-247, 273-274);
* metrics: confusion matrix, Acc, Acc_class, Precision, Recall, F1, mIoU,
  IoU_class printed in the reference's format (eval.py:261-280).

Everything per batch stays on device; only the (C, C) matrix and the reject
counters come back to the host once per batch, asynchronously.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import EvalConfig
from .data import Compose, Normalization, PatchDataset, PatchLoader, ToArray, construct_test
from .models import build_model
from .ops.confusion import confusion_matrix_update
from .parallel.mesh import (batch_sharding, make_mesh, make_mesh_dp_sp,
                            replicate)
from .train_lib import device_preprocess
from .utils.checkpoint import list_checkpoints, load_net_checkpoint
from .utils.metrics import Evaluator


def _rescale(output: jax.Array, mode: str, valid=None) -> jax.Array:
    """'None' | 'clip' | 'sigmoid' | 'minmax' output rescaling, used for the
    per-member ensemble rescale where all four modes are real
    (reference eval.py:209-222).

    ``valid`` (bool, batch-shaped) restricts the minmax extrema to real pixels:
    the static-shape final batch is padded here, whereas the reference has no
    padding, and padded rows' garbage logits must not shift the rescale.
    """
    if mode == "sigmoid":
        return jax.nn.sigmoid(output)
    if mode == "clip":
        return jnp.clip(output, 0.0, 1.0)
    if mode == "minmax":
        if valid is not None:
            while valid.ndim < output.ndim:
                valid = valid[..., None]
            lo = jnp.min(jnp.where(valid, output, jnp.inf))
            hi = jnp.max(jnp.where(valid, output, -jnp.inf))
        else:
            lo, hi = jnp.min(output), jnp.max(output)
        return (output - lo) / (hi - lo)
    return output


def _threshold_scale(output: jax.Array, mode: str) -> jax.Array:
    """Rescale applied at the threshold stage (single-model output, ensemble
    MEAN, and the selection map): the reference only implements the 'sigmoid'
    branch here — 'None'/'clip'/'minmax' are accepted no-ops
    (eval.py:230-233, 241-243)."""
    if mode == "sigmoid":
        return jax.nn.sigmoid(output)
    return output


def load_models(cfg: EvalConfig):
    """Discover + load all checkpoints; return (model, [variables...])
    (reference eval.py:116-157)."""
    paths = list_checkpoints(cfg.model_dir)
    if not paths:
        raise FileNotFoundError(f"no .ckpt/.pth checkpoints in {cfg.model_dir}")

    arch_list = list(cfg.model_arch)
    if len(paths) != 1 and len(arch_list) == 1:
        arch_list = arch_list * len(paths)
    # ValueError, not assert: user-input validation must survive python -O
    if len(arch_list) != len(paths):
        raise ValueError(
            f"model_arch count ({len(arch_list)}) must match the number of "
            f"checkpoints in {cfg.model_dir} ({len(paths)})")
    if len(set(arch_list)) != 1:
        raise ValueError("mixed architectures in one ensemble are unsupported "
                         f"(got {sorted(set(arch_list))})")

    model = build_model(arch_list[0], cfg.n_cls, cfg.selective, cfg.compute_dtype)
    variables = [load_net_checkpoint(p) for p in paths]
    if cfg.info_print:
        for p, a in zip(paths, arch_list):
            print(f"    {p} - {a} / SelectiveNet: {cfg.selective}")
    return model, variables


class _StepKey(NamedTuple):
    """The EvalConfig fields the jitted step actually closes over — hashable
    so structurally identical evals reuse one compiled step."""

    selective: bool
    select_eval: bool
    n_cls: int
    cut_off: float
    s_cut_off: float
    single_scale: str
    ens_scale: str


def make_eval_step(model, cfg: EvalConfig, n_models: int,
                   use_pallas: bool = False) -> Callable:
    """Jitted (variables, batch) -> {cm, n_pix[, n_reject]} evaluation step.

    ``use_pallas`` routes the post-forward metric pipeline (rescale ->
    threshold -> selection mask -> confusion counting) through the fused
    Pallas kernel (ops/pallas_metrics.py) — single-chip binary-head paths
    only; the caller guards mesh size and backend.

    Cached on (model, step-relevant cfg fields): repeated evaluate() calls —
    the sweep harness scores EVERY epoch checkpoint this way — reuse one
    jitted step instead of paying a fresh trace+compile each call (measured
    8.1 s -> sub-second per call after the first).
    """
    key = _StepKey(
        selective=bool(cfg.selective), select_eval=bool(cfg.select_eval),
        n_cls=int(cfg.n_cls), cut_off=float(cfg.cut_off),
        s_cut_off=float(cfg.s_cut_off), single_scale=cfg.single_scale,
        ens_scale=getattr(cfg, "ens_scale", "None"),
    )
    return _build_eval_step(model, key, n_models, use_pallas)


@functools.lru_cache(maxsize=32)
def _build_eval_step(model, key: _StepKey, n_models: int,
                     use_pallas: bool) -> Callable:
    selective = key.selective
    select_eval = key.select_eval
    cfg = key  # the body only reads the _StepKey fields
    if n_models > 1 and selective:
        raise ValueError("selective evaluation of an ensemble is unsupported "
                         "(reference eval.py:208)")

    def forward_single(variables, x):
        out = model.apply(
            # quantized serving trees (ops/quant.py) carry no batch_stats
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            x, train=False,
        )
        if selective:
            output, selection, _aux = out
            return output, selection
        return out, None

    def step(variables, batch):
        x, label = device_preprocess(batch)
        valid_px = (label >= 0) & (label < cfg.n_cls)

        if n_models == 1:
            output, selection = forward_single(variables, x)
            if (
                use_pallas
                and output.ndim == 3
                and cfg.n_cls == 2
                and (selection is not None or not select_eval)
            ):
                # Only 'sigmoid' affects the threshold stage (the reference's
                # clip/minmax branches are no-ops there, eval.py:230-233), so
                # every non-sigmoid mode shares the raw-threshold kernel mode.
                from .ops.pallas_metrics import fused_eval_metrics

                res = fused_eval_metrics(
                    output, label,
                    selection if select_eval else None,
                    apply_sigmoid=(cfg.single_scale == "sigmoid"),
                    selective=select_eval,
                    cut_off=cfg.cut_off, s_cut_off=cfg.s_cut_off,
                )
                metrics = {"cm": res["cm"], "n_pix": res["n_pix"]}
                if select_eval:
                    metrics["n_reject"] = res["n_reject"]
                return metrics
        else:
            # stacked-params ensemble: vmap over the member axis, mean on device.
            # The rescale is per member (reference eval.py:213-220 rescales each
            # net's output before averaging) — matters for 'minmax', whose
            # min/max must not couple members.
            outputs, _ = jax.vmap(lambda v: forward_single(v, x))(variables)
            outputs = jax.vmap(
                lambda o: _rescale(o, cfg.ens_scale, valid=valid_px)
            )(outputs)
            output = jnp.mean(outputs, axis=0)
            selection = None

        if output.ndim == 3:  # binary head: sigmoid-if-asked, threshold at cut_off
            # single_scale applies to the ensemble MEAN as well — the reference
            # reaches eval.py:230-233 on both paths.
            output = _threshold_scale(output, cfg.single_scale)
            pred = (output > cfg.cut_off).astype(jnp.int32)
        else:
            pred = jnp.argmax(output, axis=-1).astype(jnp.int32)

        valid = valid_px.astype(jnp.int32)
        metrics: Dict[str, Any] = {"n_pix": jnp.sum(valid)}

        sel_mask = None
        if select_eval:
            if selection is None:
                raise ValueError("--select_eval 1 requires --selective 1 and a "
                                 "selective checkpoint")
            if selection.ndim == 3:
                s = _threshold_scale(selection, cfg.single_scale)
                sel_mask = (s > cfg.s_cut_off).astype(jnp.int32)
            else:
                sel_mask = jnp.argmax(selection, axis=-1).astype(jnp.int32)
            metrics["n_reject"] = metrics["n_pix"] - jnp.sum(sel_mask * valid)

        metrics["cm"] = confusion_matrix_update(label, pred, cfg.n_cls, sel_mask)
        return metrics

    return jax.jit(step)


def stack_variables(variables_list: List[Dict]) -> Dict:
    """Stack N checkpoints' pytrees along a new leading axis for vmap."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *variables_list)


def make_eval_loader(cfg: EvalConfig, mesh, data_list=None) -> PatchLoader:
    """Build the no-shuffle eval loader (test fold by default, or any explicit
    ``data_list`` — e.g. the valid split for best-epoch selection in
    tools/sweep.py), with the same raw-uint8 device-preproc fast path the
    training pipeline uses when no host-side color math is required."""
    if data_list is None:
        data_list = construct_test(cfg.data_dir, test_fold=cfg.test_fold)
    raw_mode = (
        getattr(cfg, "device_preproc", True)
        and cfg.input_type == "RGB"
        and not getattr(cfg, "blankfield", False)
    )
    # multi-host: per-process batch slices (train_lib.make_loaders does the same)
    proc = dict(process_index=jax.process_index(),
                process_count=jax.process_count())
    if raw_mode:
        ds = PatchDataset(cfg.data_dir, data_list, cfg.patch_mag,
                          cfg.patch_size, cfg.input_type)
        return PatchLoader(ds, cfg.batch_size, shuffle=False,
                           num_workers=cfg.num_workers, drop_last=False,
                           seed=cfg.seed, sharding=batch_sharding(mesh),
                           device_preproc=True, random_flip=False, **proc)
    pre = []
    if getattr(cfg, "blankfield", False):
        from .data.transforms import BlankfieldCorrection

        pre.append(BlankfieldCorrection())
    transform = Compose(pre + [Normalization(0.5, 0.5), ToArray()])
    ds = PatchDataset(cfg.data_dir, data_list, cfg.patch_mag, cfg.patch_size,
                      cfg.input_type, transform=transform)
    return PatchLoader(ds, cfg.batch_size, shuffle=False,
                       num_workers=cfg.num_workers, drop_last=False,
                       seed=cfg.seed, sharding=batch_sharding(mesh), **proc)


def _quantize_models(cfg: EvalConfig, variables_list: List[Dict],
                     verbose: bool):
    """``--quantize int8``: fold + calibrate + quantize every checkpoint
    (ops/quant.py). Calibration images are the test fold's first
    ``--calib_patches`` patches (input statistics only — no labels), decoded
    raw [0, 1] with the same pre-normalization transforms the eval loader
    applies (stain conversion inside PatchDataset, then blankfield)."""
    from .ops.quant import quantize_serving

    n_want = int(getattr(cfg, "calib_patches", 8))
    if n_want < 1:
        raise ValueError(f"--calib_patches must be >= 1, got {n_want}")
    data_list = construct_test(cfg.data_dir, test_fold=cfg.test_fold)
    transform = None
    if getattr(cfg, "blankfield", False):
        from .data.transforms import BlankfieldCorrection

        transform = Compose([BlankfieldCorrection()])
    ds = PatchDataset(cfg.data_dir, data_list, cfg.patch_mag, cfg.patch_size,
                      cfg.input_type, transform=transform)
    n_calib = min(n_want, len(ds))
    calib = np.stack([np.asarray(ds[i]["input"], np.float32)
                      for i in range(n_calib)])
    model = None
    quantized = []
    for v in variables_list:  # per-member scales: activations differ per net
        model, qv = quantize_serving(
            cfg.model_arch[0], cfg.n_cls, cfg.selective, cfg.compute_dtype,
            v, calib)
        quantized.append(qv)
    if verbose:
        print(f"    int8 serving trunk: {len(quantized)} model(s) "
              f"calibrated on {n_calib} patches")
    return model, quantized


def evaluate(cfg: EvalConfig, loader: Optional[PatchLoader] = None,
             verbose: bool = True) -> Dict[str, Any]:
    """Full evaluation (reference eval.py:76-280). Returns the metric dict."""
    from .config import validate_output_dim

    validate_output_dim(cfg)
    mesh = make_mesh_dp_sp(cfg.n_devices, getattr(cfg, "sp_ways", 1),
                           cfg.batch_size, cfg.patch_size)
    model, variables_list = load_models(cfg)
    q = getattr(cfg, "quantize", "none")
    if q not in ("none", "int8"):  # the dataclass-generated flag is untyped —
        #                            an unknown value must not silently no-op
        raise ValueError(f"unknown --quantize {q!r} (expected 'none' or 'int8')")
    if q == "int8":
        model, variables_list = _quantize_models(cfg, variables_list, verbose)
    n_models = len(variables_list)

    if n_models == 1:
        variables = replicate(variables_list[0], mesh)
    else:
        variables = replicate(stack_variables(variables_list), mesh)

    if loader is None:
        loader = make_eval_loader(cfg, mesh)
        ds = loader.dataset
        if cfg.info_print:
            print(f"Load Test Dataset ({cfg.test_fold}-fold)")
            print(f"    patch mag: {cfg.patch_mag}")
            print(f"    patch size: {cfg.patch_size}")
            print(f"    batch size: {cfg.batch_size}")
            print(f"    num workers: {cfg.num_workers}")
            print("     # of test dataset", len(ds))

    use_pallas = (
        getattr(cfg, "use_pallas", True)
        and mesh.devices.size == 1
        and jax.default_backend() == "tpu"
    )
    step = make_eval_step(model, cfg, n_models, use_pallas=use_pallas)
    evaluator = Evaluator(num_class=cfg.n_cls, selective=cfg.select_eval)

    device_cms = []  # per-batch int32 matrices; summed in float64 on host
    total_pix = 0
    total_reject = 0
    reject_metrics = []
    for batch in loader:
        device_batch = {"input": batch["input"], "label": batch["label"]}
        if "flips" in batch:
            device_batch["flips"] = batch["flips"]
        metrics = step(variables, device_batch)
        device_cms.append(metrics["cm"])
        if cfg.select_eval:
            reject_metrics.append((metrics["n_pix"], metrics["n_reject"]))

    for cm in jax.device_get(device_cms):
        evaluator.add_confusion_matrix(cm)
    for n_pix, n_reject in jax.device_get(reject_metrics):
        total_pix += int(n_pix)
        total_reject += int(n_reject)

    prec = evaluator.get_Precision()
    recall = evaluator.get_Recall()
    results = {
        "confusion_matrix": evaluator.confusion_matrix.copy(),
        "accuracy": evaluator.get_Pixel_Accuracy(),
        "accuracy_class": evaluator.get_Pixel_Accuracy_Class(),
        "precision": prec,
        "recall": recall,
        "f1_score": evaluator.get_F1_Score(prec, recall),
        "mIoU": evaluator.get_mIoU(),
        "IoU_class": evaluator.get_IoU_Class(),
        "n_models": n_models,
    }
    if cfg.select_eval:
        results["rejection_ratio"] = total_reject / total_pix if total_pix else float("nan")

    if verbose:
        print(evaluator.confusion_matrix)
        if cfg.select_eval:
            print(f"    rejection ratio: {round(results['rejection_ratio'], 3)}")
        print(f"    Acc:{results['accuracy']}")
        print(f"    Acc_class:{results['accuracy_class']}")
        print(f"    Prec:{results['precision']}, Recall:{results['recall']}, "
              f"F1_Score:{results['f1_score']}")
        print(f"    mIoU:{results['mIoU']}")
        print(f"    IoU_class:{results['IoU_class']}")

    # --save_dir: persist the metric block as CSV (the reference declares the
    # flag but its CSV helper is broken dead code, eval.py:67-74). Fleet runs:
    # every process computes identical metrics; host 0 writes.
    if getattr(cfg, "save_dir", None) and jax.process_index() == 0:
        from .tools.wsi import save_performance_as_csv

        fmt = lambda a: " ".join(f"{float(v):.6f}" for v in np.atleast_1d(a))
        row = [
            f"{results['accuracy']:.6f}", f"{results['accuracy_class']:.6f}",
            fmt(results["precision"]), fmt(results["recall"]),
            fmt(results["f1_score"]), f"{results['mIoU']:.6f}",
            fmt(results["IoU_class"]),
            f"{results['rejection_ratio']:.6f}" if cfg.select_eval else "",
            n_models,
        ]
        save_performance_as_csv(
            cfg.save_dir, [row], f"eval_fold{cfg.test_fold}",
            header=["accuracy", "accuracy_class", "precision", "recall",
                    "f1_score", "mIoU", "IoU_class", "rejection_ratio", "n_models"],
        )
    return results
