"""AOT export of the serving forward as a portable artifact (``snet-export``).

The reference's only deployment form is "load the .pth in a notebook and call
the module" (u-net_testing.ipynb cells 6-8); nothing runs without the full
framework + checkpoint machinery. This tool freezes the serving pipeline —
normalization (x-0.5)/0.5, the BN-folded bf16 UNet forward, and the output
activations — into one serialized StableHLO artifact via ``jax.export``:

* self-contained: weights are baked in as constants; the consumer needs jax
  (any frontend that can feed StableHLO works) but NOT this package;
* platform-checked: artifacts record the platforms they were lowered for
  (``--platforms cpu,tpu`` cross-lowers in one artifact);
* stable calling convention: ``jax.export.deserialize(blob).call(images)``
  with ``images`` float32 [0, 1] NHWC of exactly the exported shape, returns
  ``{"prob": float32 (N, H, W)[, "selection_prob": float32 (N, H, W)]}`` —
  post-activation probability maps, thresholds are the consumer's choice;
* a JSON sidecar (``{out}.json``) documents shape/dtype/arch/provenance so
  the artifact is self-describing at rest.

Static shapes are deliberate (TPU discipline): export one artifact per
serving shape; ``snet-serve`` covers the variable-shape online case.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from .tiled_inference import GRID


def make_serving_fn(model, variables, selective: bool):
    """Pure-jax serving pipeline: raw [0, 1] images -> probability maps.

    Mirrors ``Predictor.logits``/``predict`` (predictor.py) but stays
    traceable end to end (the Predictor thresholds in host numpy).
    """
    import jax
    import jax.numpy as jnp

    def serving_fn(images):
        x = (jnp.asarray(images, jnp.float32) - 0.5) / 0.5
        out = model.apply(variables, x, train=False)
        if selective:
            f, g, _ = out
        else:
            f, g = out, None
        if f.ndim == 3:  # UNet_B single-logit head
            prob = jax.nn.sigmoid(f.astype(jnp.float32))
        else:  # UNet CE head: tumor-class probability, like eval_lib
            prob = jax.nn.softmax(f.astype(jnp.float32), axis=-1)[..., 1]
        result = {"prob": prob}
        if g is not None:
            if g.ndim == 3:
                sp = jax.nn.sigmoid(g.astype(jnp.float32))
            else:
                sp = jax.nn.softmax(g.astype(jnp.float32), axis=-1)[..., 1]
            result["selection_prob"] = sp
        return result

    return serving_fn


def export_serving(predictor, batch: int, height: int, width: int,
                   channels: int,
                   platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the predictor's serving pipeline for one input shape.

    ``platforms=None`` lowers for the current default backend only;
    pass e.g. ``("cpu", "tpu")`` for one artifact that runs on both.
    """
    import jax
    from jax import export as jax_export

    if height % GRID or width % GRID:
        raise ValueError(f"height/width must be multiples of {GRID} "
                         f"(the trunk max-pools 3x), got {height}x{width}")
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")

    fn = make_serving_fn(predictor.model, predictor.variables,
                         predictor.selective)
    spec = jax.ShapeDtypeStruct((batch, height, width, channels), np.float32)
    exported = jax_export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None)(spec)
    return exported.serialize()


def load_exported(path: str):
    """Deserialize an artifact; ``.call(images)`` runs it."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


def write_artifact(blob: bytes, out_path: str, meta: Dict) -> List[str]:
    """Write the artifact + its JSON sidecar atomically; returns the paths."""
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, out_path)
    sidecar = out_path + ".json"
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
        f.write("\n")
    os.replace(tmp, sidecar)
    return [out_path, sidecar]


def main(argv=None) -> None:
    """CLI: python -m selectivenet_for_semantic_segmentation_binary_tpu.tools.export"""
    import argparse

    from ..config import parse_bool

    parser = argparse.ArgumentParser(
        description="freeze the BN-folded serving forward (weights baked in) "
                    "into a portable StableHLO artifact via jax.export")
    parser.add_argument("--out", required=True,
                        help="artifact path (a {out}.json sidecar is written "
                             "next to it)")
    parser.add_argument("--model_path", default=None,
                        help="one specific .ckpt/.pth checkpoint")
    parser.add_argument("--model_dir", default=None,
                        help="checkpoint dir: the digit-latest model_epoch{N} "
                             "file is used (reference resume convention)")
    parser.add_argument("--model_arch", default="UNet_B",
                        choices=["UNet", "UNet_B"])
    parser.add_argument("--n_cls", type=int, default=2)
    parser.add_argument("--selective", type=parse_bool, default=False)
    parser.add_argument("--input_type", default="RGB", choices=["RGB", "GH"],
                        help="sets the exported channel count (RGB: 3, GH: 2) "
                             "and is recorded in the sidecar")
    parser.add_argument("--compute_dtype", default="bfloat16")
    parser.add_argument("--fold_bn", type=parse_bool, default=True)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--height", type=int, default=256)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--platforms", default=None,
                        help="comma-separated lowering targets, e.g. "
                             "'cpu,tpu' (default: current backend only)")
    parser.add_argument("--check", type=parse_bool, default=True,
                        help="deserialize the written artifact and verify it "
                             "reproduces the live forward (skipped when the "
                             "current backend is not among --platforms)")
    a = parser.parse_args(argv)

    if a.height % GRID or a.width % GRID:
        parser.error(f"--height/--width must be multiples of {GRID}, "
                     f"got {a.height}x{a.width}")
    if a.batch < 1:
        parser.error(f"--batch must be >= 1, got {a.batch}")

    from ..utils.checkpoint import resolve_checkpoint

    try:
        ckpt = resolve_checkpoint(a.model_path, a.model_dir)
    except ValueError as e:
        parser.error(str(e))

    import jax

    from ..predictor import Predictor

    platforms = ([p.strip() for p in a.platforms.split(",") if p.strip()]
                 if a.platforms else None)
    channels = 2 if a.input_type == "GH" else 3
    predictor = Predictor(ckpt, model_arch=a.model_arch, n_cls=a.n_cls,
                          selective=a.selective, compute_dtype=a.compute_dtype,
                          fold_bn=a.fold_bn)
    print(f"exporting {a.model_arch} (selective={bool(a.selective)}, "
          f"{a.compute_dtype}, fold_bn={bool(a.fold_bn)}) at "
          f"({a.batch}, {a.height}, {a.width}, {channels}) "
          f"for platforms={platforms or [jax.default_backend()]}", flush=True)
    blob = export_serving(predictor, a.batch, a.height, a.width, channels,
                          platforms=platforms)

    outputs = ["prob"] + (["selection_prob"] if a.selective else [])
    meta = {
        "artifact": "jax.export StableHLO",
        "calling_convention":
            "jax.export.deserialize(blob).call(images)  # float32 [0,1] NHWC",
        "checkpoint": os.path.abspath(ckpt),
        "model_arch": a.model_arch,
        "n_cls": a.n_cls,
        "selective": bool(a.selective),
        "input_type": a.input_type,
        "compute_dtype": a.compute_dtype,
        "fold_bn": bool(a.fold_bn),
        "input_shape": [a.batch, a.height, a.width, channels],
        "input_dtype": "float32",
        "outputs": {k: [a.batch, a.height, a.width] for k in outputs},
        "platforms": platforms or [jax.default_backend()],
        "jax_version": jax.__version__,
        "size_bytes": len(blob),
    }
    paths = write_artifact(blob, a.out, meta)
    print(f"wrote {paths[0]} ({len(blob)/1e6:.1f} MB) + {paths[1]}",
          flush=True)

    if a.check:
        backend = jax.default_backend()
        if platforms and backend not in platforms:
            print(f"check skipped: current backend {backend!r} not in "
                  f"platforms {platforms}", flush=True)
            return
        exported = load_exported(a.out)
        rng = np.random.default_rng(0)
        x = rng.random((a.batch, a.height, a.width, channels),
                       np.float32).astype(np.float32)
        got = exported.call(x)
        want = jax.jit(make_serving_fn(predictor.model, predictor.variables,
                                       predictor.selective))(x)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]), atol=1e-5)
        print(f"check ok: artifact reproduces the live forward on {backend} "
              f"(outputs: {sorted(want)})", flush=True)


if __name__ == "__main__":
    main()
