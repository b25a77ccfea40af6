"""Round-3 XLA-level backward/BN levers, measured on the real TPU.

VERDICT round-2 #1: the round-2 conclusion "the remaining backward gap is
XLA-bound" was reached without exhausting the XLA-level levers. This script
measures each of them on the raw-lax UNet_B trunk substrate
(scripts/proto_hcwn_trunk.py — NHWC, bf16, batch 128, 256px; its fwd+bwd is
the proxy for the train step's compute):

  base        the round-2 reference point (fwd+bwd of the selective loss)
  remat_all   jax.checkpoint over the whole trunk (recompute fwd in bwd;
              trades FLOPs for the inter-pass HBM activation traffic)
  remat_lvl   jax.checkpoint per resolution level (smaller recompute spans)
  bf16_stats  BN statistics computed in bf16 instead of f32 — attacks the
              24.5% convert+reduce profile share (docs/RESULTS.md)
  chunk2/4    gradient accumulation over 2/4 microbatches via lax.scan
              (shrinks live activation footprint; per-chunk BN — a
              throughput-shape probe, not a parity formulation)
  b192/b256   larger per-chip batch with remat_all (round-2 found plain
              b160/192 regress from HBM pressure; explicit remat may place
              recomputes better than XLA's auto-spill)

Usage: python scripts/perf_round3.py [variant ...]   (default: all)
Each line prints immediately (flush) so a background run can be polled.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from scripts.proto_hcwn_trunk import (  # noqa: E402
    CH, UP, Layout, head, make_params, pool, upconv,
)

P = 256
LO = Layout("NHWC")


def cbr(x, p, dtype, stats_dtype=jnp.float32):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=(LO.spec, "HWIO", LO.spec))
    y = y + p["b"].astype(dtype).reshape(LO.cshape())
    yf = y.astype(stats_dtype)
    mean = jnp.mean(yf, axis=LO.stat_axes, keepdims=True)
    var = jnp.maximum(jnp.mean(yf * yf, axis=LO.stat_axes, keepdims=True)
                      - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    g = p["gamma"].astype(stats_dtype).reshape(LO.cshape())
    be = p["beta"].astype(stats_dtype).reshape(LO.cshape())
    yn = (yf - mean) * inv * g + be
    return jnp.maximum(yn, 0.0).astype(dtype)


def make_trunk(remat: str = "none", stats_dtype=jnp.float32):
    dtype = jnp.bfloat16
    block = partial(cbr, dtype=dtype, stats_dtype=stats_dtype)

    def level(x, params, names):
        for n in names:
            x = block(x, params[n])
        return x

    if remat == "lvl":
        level = jax.checkpoint(level, static_argnums=(2,))

    def trunk(params, x):
        e1 = level(x, params, ("enc1_1", "enc1_2"))
        e2 = level(pool(e1, LO), params, ("enc2_1", "enc2_2"))
        e3 = level(pool(e2, LO), params, ("enc3_1", "enc3_2"))
        bt = level(pool(e3, LO), params, ("dec4_2", "dec4_1"))
        u3 = upconv(bt, params["unpool3"], LO, dtype)
        d3 = level(jnp.concatenate([u3, e3], axis=-1), params, ("dec3_2", "dec3_1"))
        u2 = upconv(d3, params["unpool2"], LO, dtype)
        d2 = level(jnp.concatenate([u2, e2], axis=-1), params, ("dec2_2", "dec2_1"))
        u1 = upconv(d2, params["unpool1"], LO, dtype)
        d1 = level(jnp.concatenate([u1, e1], axis=-1), params, ("dec1_2", "dec1_1"))
        f = head(d1, params["head_f"], LO, dtype)
        g = head(d1, params["head_g"], LO, dtype)
        h = head(d1, params["head_h"], LO, dtype)
        return f, g, h

    if remat == "all":
        trunk = jax.checkpoint(trunk)
    return trunk


def selective_loss(f, g, h, label):
    f = f.astype(jnp.float32)
    g = g.astype(jnp.float32)
    h = h.astype(jnp.float32)
    bce = -(label * jax.nn.log_sigmoid(f) + (1 - label) * jax.nn.log_sigmoid(-f))
    sg = jax.nn.sigmoid(g)
    cov = jnp.mean(sg)
    risk = jnp.mean(bce * sg) / cov
    aux = jnp.mean(-(label * jax.nn.log_sigmoid(h)
                     + (1 - label) * jax.nn.log_sigmoid(-h)))
    return risk + 2.0 * jnp.maximum(0.8 - cov, 0.0) ** 2 + aux


def make_grad_fn(variant: str):
    remat = {"remat_all": "all", "remat_lvl": "lvl",
             "b192": "all", "b256": "all"}.get(variant, "none")
    stats_dtype = jnp.bfloat16 if variant == "bf16_stats" else jnp.float32
    trunk = make_trunk(remat, stats_dtype)

    def loss(params, x, label):
        f, g, h = trunk(params, x)
        if variant == "barrier":
            # scheduling probe (VERDICT #1b): fence the trunk outputs so XLA
            # cannot fuse head/loss math into the trunk's fusions — tests
            # whether the +23% filter-gradient overhead is a fusion-boundary
            # artifact the scheduler could be steered around
            f, g, h = jax.lax.optimization_barrier((f, g, h))
        return selective_loss(f, g, h, label)

    if variant in ("chunk2", "chunk4"):
        n_chunks = int(variant[-1])

        def grad_fn(params, x, label):
            xs = x.reshape(n_chunks, -1, *x.shape[1:])
            ls = label.reshape(n_chunks, -1, *label.shape[1:])

            def body(acc, xl):
                v, g = jax.value_and_grad(loss)(params, *xl)
                return jax.tree_util.tree_map(jnp.add, acc,
                                              (v / n_chunks, g)), None

            zero = (jnp.zeros(()),
                    jax.tree_util.tree_map(jnp.zeros_like, params))
            (v, g), _ = jax.lax.scan(body, zero, (xs, ls))
            return v, g

        return jax.jit(grad_fn)
    return jax.jit(jax.value_and_grad(loss))


def timeit(f, *args, n=10):
    out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    variants = sys.argv[1:] or [
        "base", "bf16_stats", "remat_all", "remat_lvl",
        "chunk2", "chunk4", "b192", "b256",
    ]
    rng = np.random.default_rng(0)
    params = make_params(rng)
    print(f"devices: {jax.devices()}", flush=True)

    for v in variants:
        B = {"b192": 192, "b256": 256}.get(v, 128)
        x = jnp.asarray(rng.standard_normal((B, P, P, 3)), jnp.bfloat16)
        lab = jnp.asarray((rng.random((B, P, P, 1)) > 0.7), jnp.float32)
        try:
            t0 = time.perf_counter()
            fn = make_grad_fn(v)
            t = timeit(fn, params, x, lab)
            compile_s = time.perf_counter() - t0 - 10 * t
            print(f"{v:12s} B={B:3d}: fwd+bwd {t*1e3:8.2f} ms | "
                  f"{B/t:6.1f} patches/s | (compile ~{compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{v:12s} B={B:3d}: FAILED {type(e).__name__}: {e}",
                  flush=True)
        finally:
            del x, lab


if __name__ == "__main__":
    main()
