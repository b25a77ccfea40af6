"""Per-shape attribution of XLA's conv filter-gradient (dW) cost on the TPU.

docs/RESULTS.md round-1/2 profiling located the remaining backward gap
(bwd vs the 2x-forward ideal, +23%) "in XLA's conv filter-gradient
convolutions — the candidate for custom Pallas backward kernels in a later
round". Before building that kernel, this probe isolates per-UNet-conv-shape:

  fwd      one 3x3 SAME conv, bf16 NHWC (the shape's forward cost)
  dx       input gradient only (vjp wrt x, random cotangent)
  dw       filter gradient only (vjp wrt w, random cotangent)   <- the target
  ideal    FLOP count / 170 TF/s (the chip's measured sustained matmul rate)

Random cotangents through ``jax.vjp`` keep the measured graph honest (a
ones-cotangent would let XLA constant-fold dW into a plain reduction). With
only dx (resp. dw) as the jit output, the forward conv is dead code (conv is
bilinear), so each timing contains exactly one convolution.

Every UNet_B trunk 3x3 conv shape at the flagship batch (128, 256px) is
covered (reference model.py:29-66 channel schedule). Timing forces a scalar
D2H fetch per measurement (the axon tunnel's block_until_ready returns early
— CLAUDE.md).

Usage: python scripts/profile_dw.py [--steps 10] [--batch 128]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

# (name, H, Cin, Cout) at 256px input; W == H everywhere in the trunk
SHAPES = [
    ("enc1_1 3->64 @256", 256, 3, 64),
    ("lvl1 64->64 @256", 256, 64, 64),
    ("dec1_2 128->64 @256", 256, 128, 64),
    ("lvl2 128->128 @128", 128, 128, 128),
    ("enc2_1 64->128 @128", 128, 64, 128),
    ("dec2_2 256->128 @128", 128, 256, 128),
    ("lvl3 256->256 @64", 64, 256, 256),
    ("enc3_1 128->256 @64", 64, 128, 256),
    ("dec3_2 512->256 @64", 64, 512, 256),
    ("btl 512->512 @32", 32, 512, 512),
    ("btl 256->512 @32", 32, 256, 512),
]

SUSTAINED_TFLOPS = 170.0  # measured sustained bf16 matmul rate (RESULTS.md)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.jit
def _fwd(x, w):
    return conv(x, w)


@jax.jit
def _dx(x, w, g):
    _, vjp = jax.vjp(lambda x_: conv(x_, w), x)
    return vjp(g)[0]


@jax.jit
def _dw(x, w, g):
    _, vjp = jax.vjp(lambda w_: conv(x, w_), w)
    return vjp(g)[0]


def timed(fn, *args, steps):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])  # forced D2H: full sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    a = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    rows = []
    for i, (name, h, cin, cout) in enumerate(SHAPES):
        kx, kw, kg = jax.random.split(jax.random.fold_in(key, i), 3)
        x = jax.random.normal(kx, (a.batch, h, h, cin), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        g = jax.random.normal(kg, (a.batch, h, h, cout), jnp.bfloat16)

        flops = 2 * a.batch * h * h * 9 * cin * cout
        ideal_ms = flops / (SUSTAINED_TFLOPS * 1e12) * 1e3
        t_f = timed(_fwd, x, w, steps=a.steps) * 1e3
        t_dx = timed(_dx, x, w, g, steps=a.steps) * 1e3
        t_dw = timed(_dw, x, w, g, steps=a.steps) * 1e3
        rows.append((name, ideal_ms, t_f, t_dx, t_dw))
        print(f"{name:22s} ideal {ideal_ms:7.2f}  fwd {t_f:7.2f} "
              f"({ideal_ms / t_f * 100:5.1f}%)  dx {t_dx:7.2f} "
              f"({ideal_ms / t_dx * 100:5.1f}%)  dw {t_dw:7.2f} "
              f"({ideal_ms / t_dw * 100:5.1f}%)  [ms]", flush=True)

    tot = np.array([[r[1], r[2], r[3], r[4]] for r in rows]).sum(axis=0)
    print(f"{'TOTAL':22s} ideal {tot[0]:7.2f}  fwd {tot[1]:7.2f} "
          f"({tot[0] / tot[1] * 100:5.1f}%)  dx {tot[2]:7.2f} "
          f"({tot[0] / tot[2] * 100:5.1f}%)  dw {tot[3]:7.2f} "
          f"({tot[0] / tot[3] * 100:5.1f}%)  [ms]", flush=True)
    print(f"dw overhead vs fwd: {(tot[3] - tot[1]):+.2f} ms "
          f"({(tot[3] / tot[1] - 1) * 100:+.1f}%)  <- the Pallas-dW prize",
          flush=True)


if __name__ == "__main__":
    main()
