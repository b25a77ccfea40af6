"""Probe: what does XLA's own TPU conv do when fed the TRANSPOSED logical
layout directly via dimension_numbers=("HCWN", "HWIO", "HCWN")?

If XLA runs N-minor convs at or near its NHWC in-net rate, a transposed
Pallas trunk can keep its BACKWARD entirely in XLA (custom_vjp with HCWN
dimension numbers) with zero layout boundaries — the fused forward kernel
provides the BN fusion win and XLA provides mature backward convs.

Shapes: level-1 (64->64) and bottleneck (512->512) at batch 128, bf16.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def conv(dims):
    @jax.jit
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=(dims, "HWIO", dims))
    return f


def conv_grads(dims):
    def loss(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=(dims, "HWIO", dims))
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    @jax.jit
    def f(x, w):
        return jax.grad(loss, argnums=(0, 1))(x, w)
    return f


def bench_shape(name, N, H, W, Cin, Cout):
    rng = np.random.default_rng(0)
    flops = 2 * N * H * W * 9 * Cin * Cout
    x_nhwc = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.bfloat16)
    x_hcwn = jnp.asarray(jnp.transpose(x_nhwc, (1, 3, 2, 0)))
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.02, jnp.bfloat16)

    print(f"--- {name}: N={N} {H}x{W} {Cin}->{Cout} ({flops/1e9:.0f} GF fwd)")
    for dims, x in (("NHWC", x_nhwc), ("HCWN", x_hcwn)):
        t = timeit(conv(dims), x, w)
        print(f"  fwd  {dims}: {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s")
    for dims, x in (("NHWC", x_nhwc), ("HCWN", x_hcwn)):
        t = timeit(conv_grads(dims), x, w)
        print(f"  bwd  {dims}: {t*1e3:7.2f} ms  {2*flops/t/1e12:6.1f} TF/s "
              f"(dx+dw, 2x-fwd flops)")


if __name__ == "__main__":
    bench_shape("level1", 128, 256, 256, 64, 64)
    bench_shape("level3", 128, 64, 64, 256, 256)
    bench_shape("bottleneck", 128, 32, 32, 512, 512)
