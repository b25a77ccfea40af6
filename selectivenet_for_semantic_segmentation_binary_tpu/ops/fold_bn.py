"""BatchNorm folding for the inference/serving path.

At eval time BatchNorm is a per-channel affine transform with frozen running
statistics; folding it into the preceding convolution's kernel and bias removes
one VPU pass + one HBM round-trip per CBR block (28 of them per UNet forward)
and shrinks the serving graph to pure conv+ReLU. Training is untouched — this
is a checkpoint-to-checkpoint transform applied when building an eval/serving
model.

Math: BN(conv(x, W) + b) = conv(x, W * s) + (b - mean) * s + beta
      with s = gamma / sqrt(var + eps), broadcast over the output channel.

The folded pytree drops the 'bn' scopes entirely and is consumed by the
``folded=True`` variant of the models (models/unet.py builds CBR blocks without
BatchNorm when given a folded tree) — equivalence is pinned by
tests/test_fold_bn.py against the unfolded eval-mode forward.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

BN_EPS = 1e-5  # must match models/unet.py CBR epsilon (torch default)


def _fold_one(conv: Dict[str, Any], bn_params: Dict[str, Any],
              bn_stats: Dict[str, Any]) -> Dict[str, Any]:
    # Computed in host numpy DELIBERATELY: params produced as device arrays by
    # jnp multiplies carry the producing op's layout, and feeding such kernels
    # to the jitted convs measured 2x slower end to end (126 vs 61.5 ms per
    # batch-128 forward on v5e) than fresh default-layout arrays. The caller
    # device_puts the numpy tree, restoring default layouts.
    kernel = np.asarray(conv["kernel"])          # (kh, kw, in, out)
    bias = np.asarray(conv["bias"])              # (out,)
    gamma = np.asarray(bn_params["scale"])
    beta = np.asarray(bn_params["bias"])
    mean = np.asarray(bn_stats["mean"])
    var = np.asarray(bn_stats["var"])

    s = gamma / np.sqrt(var + BN_EPS)
    return {
        "kernel": (kernel * s[None, None, None, :]).astype(kernel.dtype),
        "bias": ((bias - mean) * s + beta).astype(bias.dtype),
    }


def fold_batchnorm(variables: Dict[str, Any]) -> Dict[str, Any]:
    """{'params', 'batch_stats'} -> {'params'} with every CBR's BN folded in.

    Scopes without a 'bn' sibling (heads, transposed convs) pass through.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p: Dict[str, Any], s: Dict[str, Any]) -> Dict[str, Any]:
        if "conv" in p and "bn" in p:  # a CBR block
            return {"conv": _fold_one(p["conv"], p["bn"], s["bn"])}
        out = {}
        for k, v in p.items():
            if isinstance(v, dict) and any(isinstance(x, dict) for x in v.values()):
                out[k] = walk(v, s.get(k, {}))
            else:
                out[k] = v
        return out

    return {"params": walk(params, stats)}
