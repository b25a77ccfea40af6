#!/usr/bin/env python3
"""Consume an ``snet-export`` artifact WITHOUT this package.

Demonstrates the deployment contract documented in docs/SERVING.md: the
StableHLO artifact produced by ``snet-export`` is self-contained (weights
baked in), so a consumer process needs only ``jax`` + ``numpy`` — none of
the framework's model/checkpoint machinery is imported here.

    snet-export --out /tmp/unet.shlo --model_path CKPT --selective 1 \
        --batch 2 --height 256 --width 256
    python examples/run_exported_artifact.py /tmp/unet.shlo image1.png image2.png

The sidecar (``{artifact}.json``) tells us the expected input shape and
which outputs the artifact produces; images are resized/letterboxed to the
exported shape here for simplicity (production consumers export one artifact
per serving shape instead — see docs/SERVING.md).
"""

import argparse
import json

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("artifact", help="path written by snet-export")
    p.add_argument("images", nargs="*",
                   help="image files to score (batch is zero-padded/truncated "
                        "to the exported batch size); omit to run on random "
                        "data as a smoke check")
    p.add_argument("--cut_off", type=float, default=0.5)
    args = p.parse_args()

    with open(args.artifact + ".json") as f:
        meta = json.load(f)
    n, h, w, c = meta["input_shape"]
    print(f"artifact: {meta['model_arch']} selective={meta['selective']} "
          f"input={meta['input_shape']} platforms={meta['platforms']}")

    # the whole deployment dependency surface: jax.export.deserialize + call
    from jax import export as jax_export

    with open(args.artifact, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))

    if args.images:
        from PIL import Image

        rows = []
        for path in args.images[:n]:
            img = Image.open(path).convert("RGB").resize((w, h))
            rows.append(np.asarray(img, np.float32) / 255.0)
        n_real = len(rows)
        while len(rows) < n:  # pad the fixed-shape batch
            rows.append(np.zeros((h, w, c), np.float32))
        batch = np.stack(rows)
    else:
        n_real = n
        batch = np.random.default_rng(0).random((n, h, w, c)).astype(np.float32)

    out = exported.call(batch)
    prob = np.asarray(out["prob"])[:n_real]
    names = (args.images[:n_real] if args.images
             else [f"random[{i}]" for i in range(n_real)])
    for i, name in enumerate(names):
        line = f"{name}: tumor_fraction={(prob[i] >= args.cut_off).mean():.4f}"
        if "selection_prob" in out:
            sel = np.asarray(out["selection_prob"])[i]
            line += f" coverage={(sel >= 0.5).mean():.4f}"
        print(line)


if __name__ == "__main__":
    main()
