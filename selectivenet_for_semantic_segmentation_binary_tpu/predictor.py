"""Serving-side predictor: one object from checkpoint to predictions.

The reference has no serving story — inference lives in notebook cells
(u-net_testing.ipynb). This consolidates the deployment path:

* loads a native ``model_epoch{N}.ckpt`` or a reference torch ``.pth``
  (utils/checkpoint.py interchange);
* folds BatchNorm into the convs (ops/fold_bn.py) and jits a bf16 forward —
  the serving graph is pure conv+ReLU on the MXU;
* ``predict``: batched probability/mask inference with cut_off;
* ``predict_wsi``: exact seamless whole-slide masks with bounded memory
  (tools/tiled_inference.py);
* ``predict_with_uncertainty``: MC stochastic-forward variance/confidence
  (tools/uncertainty.py; requires a dropout_rate > 0 model).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models import build_model
from .ops.fold_bn import fold_batchnorm
from .utils.checkpoint import load_net_checkpoint


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
    ):
        self.selective = selective
        self.cut_off = cut_off
        self.s_cut_off = s_cut_off
        variables = load_net_checkpoint(checkpoint_path)

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
            lambda x: self.model.apply(self.variables, x, train=False)
        )
        self._tiled_apply = None  # built lazily on first predict_wsi

    # -- core ---------------------------------------------------------------
    def logits(self, images: np.ndarray):
        """(N, H, W, C) raw [0, 1] images -> model logits (normalization
        (x-0.5)/0.5 applied here, matching the training transform)."""
        x = (jnp.asarray(images, jnp.float32) - 0.5) / 0.5
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
            pred = (prob > self.cut_off).astype(np.uint8)
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
            result["selection"] = (sp > self.s_cut_off).astype(np.uint8)
        return result

    # -- whole-slide --------------------------------------------------------
    def predict_wsi(self, image: np.ndarray, tile=(512, 512),
                    batch_size: int = 8, mesh=None) -> Dict[str, np.ndarray]:
        """Exact seamless full-slide inference ((H, W, C) raw [0, 1] image).

        ``mesh``: optional 1-D device mesh — window batches are sharded
        across its chips (data-parallel windows, zero cross-chip
        communication; see tools/tiled_inference.py). The jitted forward is
        cached per wrapper, so alternating mesh/no-mesh calls on one
        Predictor share the same wrapper and recompile only on shape or
        sharding change.
        """
        from .tools.tiled_inference import wsi_mask

        if self._tiled_apply is None:
            # one jit wrapper for the Predictor's lifetime: per-call closures
            # would recompile the forward for every image of a batch run
            variables = dict(self.variables)
            variables.setdefault("batch_stats", {})

            def apply_fn(batch):
                out = self.model.apply(variables, batch, train=False)
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

        x = (jnp.asarray(images, jnp.float32) - 0.5) / 0.5
        out = mc_uncertainty(self.model, self.variables, x, n_iter=n_iter,
                             rng=jax.random.PRNGKey(seed), selective=self.selective)
        return {k: np.asarray(v) for k, v in out.items()}
