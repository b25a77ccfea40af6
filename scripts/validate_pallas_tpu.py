#!/usr/bin/env python3
"""Scripted ON-TPU validation of every Pallas kernel (VERDICT round-2 #5).

CPU CI runs these kernels in interpret mode only, which skips Mosaic's
block/layout lowering checks — the round-2 multi-tile lowering crash (every
TPU eval over 64k pixels) reached the driver before any test saw it. This
script natively lowers and runs each kernel on the real chip across a sweep
of grid sizes / batch shapes / modes and asserts bit-equality (counts) or
tight allclose (conv) against the XLA oracle. Wire-in: the verify skill
(.claude/skills/verify/SKILL.md) runs it as part of every hardware drive.

Exit code 0 = all validated; any mismatch or lowering crash is fatal.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from selectivenet_for_semantic_segmentation_binary_tpu.data.loader import (  # noqa: E402
    PAD_LABEL,
)
from selectivenet_for_semantic_segmentation_binary_tpu.ops.confusion import (  # noqa: E402
    confusion_matrix_update,
)
from selectivenet_for_semantic_segmentation_binary_tpu.ops.fused_cbr import (  # noqa: E402
    fused_conv_stats,
)
from selectivenet_for_semantic_segmentation_binary_tpu.ops.pallas_metrics import (  # noqa: E402
    fused_eval_metrics,
)

FAILS = []


def check(name: str, ok: bool, detail: str = "") -> None:
    status = "ok" if ok else "FAIL"
    print(f"  {name}: {status} {detail}", flush=True)
    if not ok:
        FAILS.append(name)


def validate_eval_metrics() -> None:
    """fused_eval_metrics vs the XLA confusion/reject oracle.

    Shapes chosen to hit: one-tile, the >64k-pixel multi-tile regime that
    crashed in round 2, a padded (non-multiple) flatten, and the full
    flagship eval shape (128 x 256 x 256 = 8.4M pixels)."""
    print("fused_eval_metrics (native lowering):", flush=True)
    rng = np.random.default_rng(0)
    shapes = [
        (1, 64, 64),      # single tile
        (2, 128, 128),    # a few tiles
        (4, 256, 256),    # > 64k pixels: the round-2 crash regime
        (7, 96, 96),      # non-8/128-aligned pixel count -> padded flatten
        (128, 256, 256),  # flagship eval batch
    ]
    for shape in shapes:
        f = jnp.asarray(rng.standard_normal(shape) * 2, jnp.float32)
        g = jnp.asarray(rng.standard_normal(shape) * 2, jnp.float32)
        lab_np = (rng.random(shape) > 0.6).astype(np.int32)
        # sprinkle PAD_LABEL rows like the loader's final partial batch
        lab_np[0, :2] = PAD_LABEL
        lab = jnp.asarray(lab_np)

        for selective in (False, True):
            for apply_sigmoid in (True, False):
                res = fused_eval_metrics(
                    f, lab, g if selective else None,
                    apply_sigmoid=apply_sigmoid, selective=selective,
                )
                # XLA oracle (the eval_lib path)
                prob = jax.nn.sigmoid(f) if apply_sigmoid else f
                pred = (prob > 0.5).astype(jnp.int32)
                valid = ((lab >= 0) & (lab < 2)).astype(jnp.int32)
                sel_mask = None
                if selective:
                    s = jax.nn.sigmoid(g) if apply_sigmoid else g
                    sel_mask = (s > 0.5).astype(jnp.int32)
                cm = confusion_matrix_update(lab, pred, 2, sel_mask)
                ok = bool(jnp.all(res["cm"] == cm))
                detail = f"shape={shape} sel={selective} sig={apply_sigmoid}"
                if selective:
                    n_rej = int(jnp.sum(valid) - jnp.sum(sel_mask * valid))
                    ok = ok and int(res["n_reject"]) == n_rej
                check(f"metrics {detail}", ok)


def validate_fused_conv_stats() -> None:
    """fused_conv_stats (fwd + grads) vs the XLA conv/stats oracle across
    the UNet_B level shapes that are kernel-eligible."""
    print("fused_conv_stats (native lowering):", flush=True)
    rng = np.random.default_rng(1)
    # (N, H, W, Cin, Cout) — every distinct eligible trunk shape, small-N
    # variants plus one full-batch case
    shapes = [
        (8, 256, 256, 64, 64),
        (8, 128, 128, 128, 128),
        (8, 64, 64, 256, 256),
        (8, 32, 32, 512, 512),
        (8, 32, 32, 256, 512),
        (128, 32, 32, 512, 512),
    ]
    for (N, H, W, Cin, Cout) in shapes:
        x = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.bfloat16)
        a = jnp.asarray(rng.random(Cin) + 0.5, jnp.float32)
        b = jnp.asarray(rng.standard_normal(Cin) * 0.1, jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05,
                        jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)

        def oracle(x, a, b, w, bias):
            xn = jnp.maximum(
                x.astype(jnp.float32) * a + b, 0.0).astype(jnp.bfloat16)
            y = jax.lax.conv_general_dilated(
                xn, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(jnp.bfloat16)
            yf = y.astype(jnp.float32)
            stats = jnp.stack([jnp.sum(yf, axis=(0, 1, 2)),
                               jnp.sum(yf * yf, axis=(0, 1, 2))])
            return y, stats

        try:
            y_k, s_k = jax.jit(fused_conv_stats)(x, a, b, w, bias)
            y_o, s_o = jax.jit(oracle)(x, a, b, w, bias)
            y_ok = bool(jnp.max(jnp.abs(y_k.astype(jnp.float32)
                                        - y_o.astype(jnp.float32))) < 0.25)
            # stats are f32 sums of bf16 products over N*H*W elements;
            # tolerance scales with the reduction size
            n = N * H * W
            s_ok = bool(jnp.max(jnp.abs(s_k - s_o) / (jnp.abs(s_o) + n))
                        < 1e-2)
            check(f"conv_stats N{N} {H}x{W} {Cin}->{Cout}", y_ok and s_ok,
                  "" if (y_ok and s_ok) else f"y_ok={y_ok} s_ok={s_ok}")
        except Exception as e:  # Mosaic lowering crash = the bug class
            check(f"conv_stats N{N} {H}x{W} {Cin}->{Cout}", False,
                  f"{type(e).__name__}: {e}")


def main() -> None:
    print(f"devices: {jax.devices()}", flush=True)
    if jax.default_backend() != "tpu":
        print("NOT a TPU backend — native Mosaic lowering is not being "
              "validated; run this on the chip.", flush=True)
        sys.exit(2)
    validate_eval_metrics()
    validate_fused_conv_stats()
    if FAILS:
        print(f"FAILED: {len(FAILS)} checks: {FAILS}", flush=True)
        sys.exit(1)
    print("ALL PALLAS KERNELS VALIDATED ON TPU", flush=True)


if __name__ == "__main__":
    main()
