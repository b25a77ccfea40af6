"""Serving-side predictor: one object from checkpoint to predictions.

The reference has no serving story — inference lives in notebook cells
(u-net_testing.ipynb). This consolidates the deployment path:

* loads a native ``model_epoch{N}.ckpt`` or a reference torch ``.pth``
  (utils/checkpoint.py interchange);
* folds BatchNorm into the convs (ops/fold_bn.py) and jits a bf16 forward —
  the serving graph is pure conv+ReLU on the MXU;
* ``quantize="int8"``: the W8A8 serving graph instead — per-output-channel
  int8 trunk weights x static-scale int8 activations with int32 MXU
  accumulation (ops/quant.py; measured 1.27x over the bf16 folded forward,
  docs/RESULTS.md). Activation scales come from a calibration pass over
  representative images: pass ``calibration_images`` (or call
  :meth:`calibrate`) up front, or let the first ``predict`` batch calibrate
  lazily;
* ``predict``: batched probability/mask inference with cut_off;
* ``predict_compact``: the transfer-lean variant — sigmoid/softmax +
  thresholding fuse into the jitted forward and every output ships D2H as
  uint8 (masks exact, probabilities quantized to 1/255). The synchronous
  ``predict`` round trip is output-transfer-bound on the axon tunnel
  (docs/RESULTS.md "raw-uint8 serving ingest"), so shrinking the D2H bytes
  is the remaining latency lever;
* ``predict_wsi``: exact seamless whole-slide masks with bounded memory
  (tools/tiled_inference.py);
* ``predict_with_uncertainty``: MC stochastic-forward variance/confidence
  (tools/uncertainty.py; requires a dropout_rate > 0 model).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .models import build_model
from .ops.fold_bn import fold_batchnorm
from .ops.ingest import device_ingest, normalize_raw, to_unit_float
from .utils.checkpoint import load_net_checkpoint

# the trunk max-pools 3x, so serving inputs need dims % 8 == 0 (same GRID as
# tools/tiled_inference); calibration crops/samples are bounded because the
# one-off calibration forward runs EAGER (unjitted, docstring below) — every
# trunk intermediate materializes in HBM at f32, so an unbounded first batch
# (e.g. 128 @ 256px = 2.1 GB per level-1 activation) OOMs the chip. Absmax
# scales from a bounded sample only start narrower; explicit calibrate()
# calls merge-widen them monotonically.
_GRID = 8
_CALIB_MAX_DIM = 1024
_CALIB_MAX_EXAMPLES = 8


class Predictor:
    def __init__(
        self,
        checkpoint_path: str,
        model_arch: str = "UNet_B",
        n_cls: int = 2,
        selective: bool = False,
        compute_dtype: str = "bfloat16",
        cut_off: float = 0.5,
        s_cut_off: float = 0.5,
        fold_bn: bool = True,
        dropout_rate: float = 0.0,
        quantize: str = "none",
        calibration_images: Optional[Union[np.ndarray, Sequence[np.ndarray]]] = None,
    ):
        self.selective = selective
        self.cut_off = cut_off
        self.s_cut_off = s_cut_off
        self.quantize = quantize
        if quantize not in ("none", "int8"):
            raise ValueError(f"unknown quantize {quantize!r} "
                             "(expected 'none' or 'int8')")
        variables = load_net_checkpoint(checkpoint_path)

        if quantize == "int8":
            if not fold_bn:
                raise ValueError("quantize='int8' requires fold_bn=True — the "
                                 "int8 trunk consumes BN-folded weights "
                                 "(ops/quant.py)")
            if dropout_rate > 0:
                raise ValueError("quantize='int8' and dropout_rate > 0 are "
                                 "exclusive (MC-dropout uncertainty runs the "
                                 "bf16 folded graph)")
            self._folded_params = fold_batchnorm(variables)["params"]
            # calibration runs the float32 folded graph so absmax statistics
            # aren't themselves bf16-rounded
            self._calib_model = build_model(
                model_arch, n_cls, selective, "float32", folded=True,
                quant_calibrate=True)
            self._act_scales = None  # merged calibration tree (ops/quant.py)
            self.model = build_model(model_arch, n_cls, selective,
                                     compute_dtype, folded=True,
                                     quantize="int8")
            self.variables = None    # set by _finalize_quant after calibration
            self._forward = None
            self._tiled_apply = None
            self._compact = None
            if calibration_images is not None:
                self.calibrate(calibration_images)
            return

        # MC uncertainty needs live dropout, which the folded graph supports
        # too; folding only removes BN.
        if fold_bn:
            folded = fold_batchnorm(variables)
            self.model = build_model(model_arch, n_cls, selective, compute_dtype,
                                     dropout_rate=dropout_rate, folded=True)
            self.variables = {"params": folded["params"]}
        else:
            self.model = build_model(model_arch, n_cls, selective, compute_dtype,
                                     dropout_rate=dropout_rate)
            self.variables = {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            }

        self._forward = jax.jit(
            lambda x: self.model.apply(self.variables, normalize_raw(x),
                                       train=False)
        )
        self._tiled_apply = None  # built lazily on first predict_wsi
        self._compact = None      # built lazily on first predict_compact

    # -- int8 calibration -----------------------------------------------------
    def calibrate(self, images: Union[np.ndarray, Sequence[np.ndarray]]) -> None:
        """Calibrate the int8 activation scales on raw images (float [0, 1]
        or uint8 [0, 255]) and build the quantized serving graph.

        ``images``: one (N, H, W, C) batch or a sequence of (H, W, C) images
        (sizes may differ; dims must divide 8). Repeated calls merge scales by
        elementwise max (ops/quant.py) and rebuild the graph — scales only
        ever widen, so previously-served results stay within their error
        bound."""
        if self.quantize != "int8":
            raise ValueError("calibrate() is only meaningful for "
                             "Predictor(quantize='int8')")
        if isinstance(images, np.ndarray) and images.ndim == 3:
            images = [images]
        batches: List[np.ndarray] = (
            [images] if isinstance(images, np.ndarray)
            else [np.asarray(im)[None] if np.asarray(im).ndim == 3
                  else np.asarray(im) for im in images])
        for batch in batches:
            # eager device normalize: uint8 batches still ship as bytes
            self._calibrate_normalized(normalize_raw(device_ingest(batch)))

    def _calibrate_normalized(self, x: jax.Array) -> None:
        """One calibration batch (already normalized) -> merge scales and
        (re)build the quantized forward. Runs the float folded graph UNJITTED
        — a one-off pass; jitting it would pay a full remote compile for a
        graph used once (docs/RESULTS.md: 24-1128 s per compile on the
        tunnel). Because the pass is eager, every trunk intermediate
        materializes in HBM at f32 — so the batch is processed in
        <= _CALIB_MAX_EXAMPLES example chunks, which is EXACT (the absmax of
        a union is the max of the chunk absmaxes, and chunk scales merge by
        elementwise max); an unchunked 128 @ 256px batch OOMs a v5e."""
        from .ops.quant import extract_act_scales, merge_act_scales

        for i in range(0, x.shape[0], _CALIB_MAX_EXAMPLES):
            _, calib = self._calib_model.apply(
                {"params": self._folded_params},
                x[i:i + _CALIB_MAX_EXAMPLES], train=False,
                mutable=["quant_calib"])
            scales = extract_act_scales(calib)
            if self._act_scales is not None:
                scales = merge_act_scales(self._act_scales, scales)
            self._act_scales = scales
        self._finalize_quant()

    def _finalize_quant(self) -> None:
        from .ops.quant import quantize_folded

        qp = quantize_folded(self._folded_params, self._act_scales)
        self.variables = {"params": qp}
        self._forward = jax.jit(
            lambda x: self.model.apply(self.variables, normalize_raw(x),
                                       train=False)
        )
        self._tiled_apply = None  # sharing the stale bf16 wrapper would
        #                           silently serve unquantized tiles
        self._compact = None      # ditto for the compact postprocess graph

    # -- core ---------------------------------------------------------------
    def logits(self, images: np.ndarray):
        """(N, H, W, C) raw images -> model logits. Accepts float [0, 1]
        (the reference decode convention) or uint8 [0, 255] — uint8 ships
        1 byte/pixel (4x less H2D, the transfer-bound term of remote
        serving, docs/RESULTS.md) and /255 + the training normalization
        (x-0.5)/0.5 fuse into the jitted forward (ops/ingest.py; matches
        the float path to 1 ulp). With ``quantize='int8'`` and no prior
        calibration, the FIRST batch calibrates the activation scales (and
        is then served quantized)."""
        x = device_ingest(images)
        if self._forward is None:  # int8 pending lazy calibration
            self._calibrate_normalized(normalize_raw(x))
        return self._forward(x)

    def predict(self, images: np.ndarray) -> Dict[str, np.ndarray]:
        """Returns {'prob', 'pred'[, 'selection_prob', 'selection']}."""
        out = self.logits(images)
        if self.selective:
            f, g, _ = out
        else:
            f, g = out, None

        if f.ndim == 3:
            prob = np.asarray(jax.nn.sigmoid(f))
            # threshold in float32 (an exact superset of bf16 prob values) so
            # the mask bit-matches predict_compact's on-device comparison for
            # ANY cutoff — comparing the raw bf16 prob against the Python
            # float would run in float64 while the compact graph cannot,
            # diverging on cutoffs not representable in the compute dtype
            pred = (prob.astype(np.float32) > np.float32(self.cut_off)
                    ).astype(np.uint8)
        else:
            prob = np.asarray(jax.nn.softmax(f, axis=-1))[..., 1]
            pred = np.asarray(jnp.argmax(f, axis=-1)).astype(np.uint8)

        result = {"prob": prob, "pred": pred}
        if g is not None:
            if g.ndim == 3:
                sp = np.asarray(jax.nn.sigmoid(g))
            else:
                sp = np.asarray(jax.nn.softmax(g, axis=-1))[..., 1]
            result["selection_prob"] = sp
            result["selection"] = (sp.astype(np.float32)
                                   > np.float32(self.s_cut_off)).astype(np.uint8)
        return result

    def predict_compact(self, images: np.ndarray,
                        want_prob: bool = True) -> Dict[str, np.ndarray]:
        """Transfer-lean :meth:`predict`: everything ships D2H as uint8.

        Returns ``{'pred', 'prob_u8'[, 'selection', 'selection_prob_u8']}``;
        with ``want_prob=False`` only the masks (``pred``[, ``selection``])
        come back — half the D2H again, for consumers that never read the
        probability map (the serve PNG/JSON formats, mask-only pipelines).
        ``pred``/``selection`` are the SAME masks ``predict`` derives (both
        paths cast the probability to float32 — exact for bf16 — and compare
        against float32(cutoff), so the masks bit-match even for cutoffs not
        representable in the compute dtype); probabilities come back
        quantized, ``prob_u8 = round(prob * 255)`` — reconstruct with
        ``prob_u8 / 255`` (max error 1/510).

        Rationale: the synchronous serving round trip is output-transfer
        bound once inputs ship as bytes (docs/RESULTS.md). ``predict`` runs
        sigmoid as two eager device dispatches, ships bf16 probability
        planes, and thresholds on the (1-core) host; this path fuses
        sigmoid/threshold/quantize into the jitted forward, ships uint8
        planes (masks-only: 2 bytes/pixel for the selective head vs
        predict's 4), and does zero host math. The reference has no serving
        path to compare (inference is notebook cells, u-net_testing.ipynb
        cell 6).
        """
        x = device_ingest(images)
        if self._forward is None:  # int8 pending lazy calibration
            self._calibrate_normalized(normalize_raw(x))
        if self._compact is None:
            self._compact = {}
        key = bool(want_prob)
        if key not in self._compact:
            self._compact[key] = self._build_compact(key)
        return {k: np.asarray(v) for k, v in self._compact[key](x).items()}

    def _build_compact(self, want_prob: bool):
        model, variables, selective = self.model, self.variables, self.selective
        cut, s_cut = self.cut_off, self.s_cut_off

        def to_u8(prob):
            return jnp.round(prob.astype(jnp.float32) * 255.0).astype(jnp.uint8)

        def fn(x):
            out = model.apply(variables, normalize_raw(x), train=False)
            f, g = (out[0], out[1]) if selective else (out, None)
            res = {}
            if f.ndim == 3:
                prob = jax.nn.sigmoid(f)
                # float32 comparison, mirroring predict()'s host threshold
                # exactly (bf16 -> float32 is value-preserving)
                res["pred"] = (prob.astype(jnp.float32)
                               > jnp.float32(cut)).astype(jnp.uint8)
            else:
                prob = jax.nn.softmax(f, axis=-1)[..., 1]
                res["pred"] = jnp.argmax(f, axis=-1).astype(jnp.uint8)
            if want_prob:
                res["prob_u8"] = to_u8(prob)
            if g is not None:
                sp = (jax.nn.sigmoid(g) if g.ndim == 3
                      else jax.nn.softmax(g, axis=-1)[..., 1])
                res["selection"] = (sp.astype(jnp.float32)
                                    > jnp.float32(s_cut)).astype(jnp.uint8)
                if want_prob:
                    res["selection_prob_u8"] = to_u8(sp)
            return res

        return jax.jit(fn)

    # -- whole-slide --------------------------------------------------------
    def predict_wsi(self, image: np.ndarray, tile=(512, 512),
                    batch_size: int = 8, mesh=None) -> Dict[str, np.ndarray]:
        """Exact seamless full-slide inference ((H, W, C) raw image, float
        [0, 1] or uint8 [0, 255] — uint8 slides transfer as bytes).

        ``mesh``: optional 1-D device mesh — window batches are sharded
        across its chips (data-parallel windows, zero cross-chip
        communication; see tools/tiled_inference.py). The jitted forward is
        cached per wrapper, so alternating mesh/no-mesh calls on one
        Predictor share the same wrapper and recompile only on shape or
        sharding change.

        With ``quantize='int8'`` and no prior calibration, a center crop of
        this slide (bounded to 1024x1024) calibrates the scales first.
        """
        from .tools.tiled_inference import wsi_mask

        if self._forward is None:  # int8 pending lazy calibration
            self.calibrate(_center_crop(np.asarray(image))[None])

        if self._tiled_apply is None:
            # one jit wrapper for the Predictor's lifetime: per-call closures
            # would recompile the forward for every image of a batch run
            variables = dict(self.variables)
            variables.setdefault("batch_stats", {})

            def apply_fn(batch):
                # windows arrive RAW (uint8 or [0, 1] float) so whole slides
                # transfer as bytes; normalize fuses into the forward
                out = self.model.apply(variables, normalize_raw(batch),
                                       train=False)
                return out if isinstance(out, tuple) else (out,)

            self._tiled_apply = jax.jit(apply_fn)
        return wsi_mask(self.model, None, image, selective=self.selective,
                        cut_off=self.cut_off, s_cut_off=self.s_cut_off,
                        tile=tile, batch_size=batch_size, mesh=mesh,
                        apply_fn=self._tiled_apply)

    # -- uncertainty ----------------------------------------------------------
    def predict_with_uncertainty(self, images: np.ndarray, n_iter: int = 32,
                                 seed: int = 0) -> Dict[str, np.ndarray]:
        from .tools.uncertainty import mc_uncertainty

        if self.quantize != "none":
            raise ValueError("MC-dropout uncertainty runs the bf16 folded "
                             "graph; build the Predictor with "
                             "quantize='none'")
        x = normalize_raw(device_ingest(images))
        out = mc_uncertainty(self.model, self.variables, x, n_iter=n_iter,
                             rng=jax.random.PRNGKey(seed), selective=self.selective)
        return {k: np.asarray(v) for k, v in out.items()}


def _center_crop(image: np.ndarray) -> np.ndarray:
    """(H, W, C) -> grid-aligned center crop bounded to _CALIB_MAX_DIM."""
    h, w = image.shape[:2]
    ch = min(_CALIB_MAX_DIM, h - h % _GRID)
    cw = min(_CALIB_MAX_DIM, w - w % _GRID)
    if ch <= 0 or cw <= 0:
        raise ValueError(f"image too small to calibrate on: {h}x{w} "
                         f"(needs >= {_GRID} in both dims)")
    y0 = (h - ch) // 2
    x0 = (w - cw) // 2
    return image[y0:y0 + ch, x0:x0 + cw]
