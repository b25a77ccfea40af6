"""Probe: does an int8 conv hit the v5e int8 MXU path through XLA?

v5e peak is ~394 TOPS int8 vs ~197 TFLOP/s bf16. If
lax.conv_general_dilated on int8 operands with preferred_element_type=int32
lowers to the int8 systolic path, a post-training-quantized serving graph
could approach 2x the bf16 serving rate. If it measures <~1.3x the bf16
conv, quantized serving is not worth building on this stack.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


@jax.jit
def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.jit
def conv_int8(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


@jax.jit
def dot_bf16(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


@jax.jit
def dot_int8(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.int32)


def bench_conv(name, N, H, W, Cin, Cout):
    rng = np.random.default_rng(0)
    flops = 2 * N * H * W * 9 * Cin * Cout
    xf = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.bfloat16)
    wf = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (N, H, W, Cin)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 127, (3, 3, Cin, Cout)), jnp.int8)

    tb = timeit(conv_bf16, xf, wf)
    print(f"{name}: bf16 conv {tb*1e3:7.2f} ms {flops/tb/1e12:6.1f} TF/s")
    try:
        ti = timeit(conv_int8, xi, wi)
        print(f"{name}: int8 conv {ti*1e3:7.2f} ms {flops/ti/1e12:6.1f} TOP/s "
              f"({tb/ti:.2f}x vs bf16)")
    except Exception as e:
        print(f"{name}: int8 conv FAILED {type(e).__name__}: {str(e)[:120]}")


def bench_dot():
    rng = np.random.default_rng(0)
    M = K = Np = 4096
    flops = 2 * M * K * Np
    af = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    bf = jnp.asarray(rng.standard_normal((K, Np)), jnp.bfloat16)
    ai = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    bi = jnp.asarray(rng.integers(-127, 127, (K, Np)), jnp.int8)
    tb = timeit(dot_bf16, af, bf)
    print(f"dot 4096^3: bf16 {tb*1e3:7.2f} ms {flops/tb/1e12:6.1f} TF/s")
    try:
        ti = timeit(dot_int8, ai, bi)
        print(f"dot 4096^3: int8 {ti*1e3:7.2f} ms {flops/ti/1e12:6.1f} TOP/s "
              f"({tb/ti:.2f}x vs bf16)")
    except Exception as e:
        print(f"dot int8 FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    bench_dot()
    bench_conv("level1 64->64 256px b128", 128, 256, 256, 64, 64)
    bench_conv("bottleneck 512->512 32px b128", 128, 32, 32, 512, 512)
