"""Post-training W8A8 int8 quantization for the serving path.

The training path is exact-parity with the reference (model.py:9-103) and
every training-side perf lever class is measured-negative at 473-474
patches/s/chip (docs/RESULTS.md rounds 1-3). SERVING tolerates bounded
quantization error, and the v5e MXU rates int8 at ~2x bf16 — measured 1.87x
per conv and **1.27x end to end** on the folded UNet_B forward
(scripts/proto_int8.py, docs/RESULTS.md "int8 (W8A8) quantized serving").
This module turns that probe into the production transform consumed by
``Predictor(quantize="int8")``:

* **weights**: every 3x3 trunk CBR kernel (14 per UNet forward) is quantized
  symmetric int8 with a PER-OUTPUT-CHANNEL float scale — after BN folding
  (ops/fold_bn.py) the per-channel BN gain is already inside the kernel, so
  per-channel scales recover it losslessly. 1x1 heads and the k2s2
  transposed convs stay bf16 (they are ~2% of the FLOPs and the heads feed
  sigmoid/softmax decisions directly).
* **activations**: per-layer STATIC scales from a calibration pass — the
  folded float model runs over representative images while each CBR sows its
  input's absmax (models/unet.py ``quant_calibrate``); scales from multiple
  calibration batches merge by elementwise max. Static scales keep the
  quantize step a single fused VPU multiply-round-clip that XLA folds into
  the previous layer's epilogue (dynamic per-batch scales would force a
  full-tensor reduction between every conv).
* **arithmetic**: x_q = clip(round(x / a), +-127) int8; y = conv(x_q, w_q)
  accumulated in int32 on the MXU (``preferred_element_type``);
  y_f32 = y * (a * w_scale) + bias; ReLU — the exact pipeline the probe
  measured. Zero-point-free symmetric quantization means zero padding is
  exact in both domains.

Everything here is host-side numpy tree surgery (same rationale as
ops/fold_bn.py: device-computed parameter trees inherit producing-op layouts
that measured 2x slower when fed to the jitted convs).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

# symmetric int8: 127 levels per sign, no zero point
QMAX = 127.0
# guards degenerate all-zero kernels/activations (a dead calibration channel
# would otherwise produce scale 0 -> division by zero at quantize time)
EPS = 1e-12


def quantize_kernel(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(kh, kw, in, out) float kernel -> (int8 kernel, (out,) f32 scale).

    Symmetric per-output-channel: scale_c = absmax(kernel[..., c]) / 127, so
    dequantized weights reproduce every channel's full dynamic range (BN
    folding bakes per-channel gains of orders-of-magnitude spread into the
    kernel — a per-tensor scale would crush the small-gain channels).
    """
    k = np.asarray(kernel, np.float32)
    scale = np.maximum(np.abs(k).max(axis=(0, 1, 2)), EPS) / QMAX
    q = np.clip(np.round(k / scale[None, None, None, :]), -QMAX, QMAX)
    return q.astype(np.int8), scale.astype(np.float32)


def extract_act_scales(calib_vars: Dict[str, Any]) -> Dict[str, Any]:
    """``{'quant_calib': tree}`` from a calibration apply -> nested dict of
    python-float activation scales (absmax / 127), keyed by module path
    (e.g. ``{'trunk': {'enc1_1': 0.0184, ...}}``)."""
    tree = calib_vars["quant_calib"]

    def walk(node):
        if "in_absmax" in node:
            v = node["in_absmax"]
            # plain sow (no reduce_fn) stores a tuple of per-call values
            if isinstance(v, (tuple, list)):
                v = max(float(np.asarray(x)) for x in v)
            return max(float(np.asarray(v)), EPS) / QMAX
        return {k: walk(v) for k, v in node.items()}

    return walk(tree)


def merge_act_scales(a: Dict[str, Any], b: Dict[str, Any]) -> Dict[str, Any]:
    """Elementwise max of two scale trees (multi-batch calibration)."""
    if not isinstance(a, dict):
        return max(a, b)
    if set(a) != set(b):
        raise ValueError(f"calibration trees disagree: {set(a)} vs {set(b)}")
    return {k: merge_act_scales(a[k], b[k]) for k in a}


def quantize_folded(folded_params: Dict[str, Any],
                    act_scales: Dict[str, Any]) -> Dict[str, Any]:
    """BN-folded float params (ops/fold_bn.py output) + calibrated activation
    scales -> the parameter tree of the ``quantize='int8'`` serving model.

    Every ``{'conv': {'kernel' (3,3,in,out), 'bias'}}`` node (a folded trunk
    CBR) becomes ``{'conv': {'kernel_q' int8, 'kernel_scale' (out,),
    'act_scale' (), 'bias'}}``; 1x1 heads and ``convt`` upsamplers pass
    through untouched (they stay bf16). Raises if a CBR has no calibrated
    scale — quantizing with a default scale would silently garbage the
    output.
    """

    def walk(p: Dict[str, Any], s: Any, path: str) -> Dict[str, Any]:
        if "conv" in p and isinstance(p["conv"], dict) and "kernel" in p["conv"]:
            kernel = np.asarray(p["conv"]["kernel"])
            if kernel.ndim == 4 and kernel.shape[:2] == (3, 3):
                if not isinstance(s, float):
                    raise ValueError(
                        f"no calibrated activation scale for CBR {path!r} — "
                        "run calibration over at least one batch before "
                        "quantizing (Predictor.calibrate)")
                if not np.isfinite(s) or s <= 0.0:
                    # a zero scale (all-constant calibration input) or a
                    # NaN/inf (poisoned activations) would silently garbage
                    # every downstream layer via dequant division
                    raise ValueError(
                        f"degenerate activation scale {s!r} for CBR {path!r}"
                        " — calibrate on representative non-constant images")
                kq, ks = quantize_kernel(kernel)
                return {"conv": {
                    "kernel_q": kq,
                    "kernel_scale": ks,
                    "act_scale": np.float32(s),
                    "bias": np.asarray(p["conv"]["bias"], np.float32),
                }}
            return p  # 1x1 head: bf16 passthrough
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                sub = s.get(k, {}) if isinstance(s, dict) else {}
                out[k] = walk(v, sub, f"{path}/{k}")
            else:
                out[k] = v
        return out

    return walk(folded_params, act_scales, "")


def quantize_serving(model_arch: str, n_cls: int, selective: bool,
                     compute_dtype: str, variables: Dict[str, Any],
                     calib_images: np.ndarray):
    """One-shot checkpoint -> quantized serving graph (the non-incremental
    convenience behind ``snet-wsi --quantize int8``; the Predictor keeps its
    own incremental-merge calibration for lazy/multi-batch serving).

    ``variables``: ``{'params', 'batch_stats'}`` as loaded from a checkpoint.
    ``calib_images``: (N, H, W, C) raw [0, 1] batch (dims divisible by 8).
    Returns ``(model, {'params': quantized_tree})`` ready for
    ``model.apply(variables, x, train=False)``.
    """
    import jax.numpy as jnp

    from ..models import build_model  # lazy: models lazily imports ops.*
    from .fold_bn import fold_batchnorm

    folded = fold_batchnorm(variables)["params"]
    calib_model = build_model(model_arch, n_cls, selective, "float32",
                              folded=True, quant_calibrate=True)
    x = (jnp.asarray(np.asarray(calib_images), jnp.float32) - 0.5) / 0.5
    _, calib = calib_model.apply({"params": folded}, x, train=False,
                                 mutable=["quant_calib"])
    scales = extract_act_scales(calib)
    model = build_model(model_arch, n_cls, selective, compute_dtype,
                        folded=True, quantize="int8")
    return model, {"params": quantize_folded(folded, scales)}


def quantized_layer_names(quant_params: Dict[str, Any]) -> List[str]:
    """Paths of the quantized convs (for logging/tests)."""
    names: List[str] = []

    def walk(p, path):
        if "conv" in p and isinstance(p["conv"], dict) and "kernel_q" in p["conv"]:
            names.append(path)
            return
        for k, v in p.items():
            if isinstance(v, dict):
                walk(v, f"{path}/{k}" if path else k)

    walk(quant_params, "")
    return names
