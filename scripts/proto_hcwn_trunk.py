"""Full-trunk layout probe: the UNet_B conv/BN/relu/pool/convT/concat stack
(reference model.py:19-103 shapes) implemented twice with raw lax ops —
logical NHWC vs logical HCWN (H, C, W, N; batch minor -> lanes) — timing
train-mode forward and forward+backward at batch 128, 256x256, bf16.

Motivation (scripts/proto_hcwn_xla.py, measured): XLA's conv emitter runs the
level-1 shape (64->64, 256x256) at 56 vs 49 TF/s forward and 83 vs 69 TF/s
backward when given HCWN dimension numbers instead of NHWC; other levels are
within noise. If that isolated win survives in-net (where XLA re-assigns
layouts anyway), a logical-layout flip of the whole trunk is a zero-kernel
speedup of the train step.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, P = 128, 256
CH = [
    ("enc1_1", 3, 64), ("enc1_2", 64, 64),
    ("enc2_1", 64, 128), ("enc2_2", 128, 128),
    ("enc3_1", 128, 256), ("enc3_2", 256, 256),
    ("dec4_2", 256, 512), ("dec4_1", 512, 512),
    ("dec3_2", 512, 256), ("dec3_1", 256, 256),
    ("dec2_2", 256, 128), ("dec2_1", 128, 128),
    ("dec1_2", 128, 64), ("dec1_1", 64, 64),
]
UP = [("unpool3", 512, 256), ("unpool2", 256, 128), ("unpool1", 128, 64)]


def make_params(rng, dtype=jnp.float32):
    p = {}
    for name, cin, cout in CH:
        p[name] = {
            "w": jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dtype),
            "b": jnp.zeros((cout,), dtype),
            "gamma": jnp.ones((cout,), dtype),
            "beta": jnp.zeros((cout,), dtype),
        }
    for name, cin, cout in UP:
        p[name] = {
            "w": jnp.asarray(rng.standard_normal((2, 2, cin, cout)) * 0.05, dtype),
            "b": jnp.zeros((cout,), dtype),
        }
    for name in ("head_f", "head_g", "head_h"):
        p[name] = {
            "w": jnp.asarray(rng.standard_normal((1, 1, 64, 1)) * 0.05, dtype),
            "b": jnp.zeros((1,), dtype),
        }
    return p


class Layout:
    def __init__(self, spec):
        self.spec = spec                     # "NHWC" | "HCWN"
        self.c_axis = spec.index("C")
        self.n_axis = spec.index("N")
        self.h_axis = spec.index("H")
        self.w_axis = spec.index("W")
        self.stat_axes = tuple(i for i in range(4) if i != self.c_axis)

    def cshape(self):
        s = [1, 1, 1, 1]
        s[self.c_axis] = -1
        return tuple(s)

    def window(self):
        wnd = [1, 1, 1, 1]
        wnd[self.h_axis] = 2
        wnd[self.w_axis] = 2
        return tuple(wnd)


def cbr(x, p, lo: Layout, dtype):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=(lo.spec, "HWIO", lo.spec))
    y = y + p["b"].astype(dtype).reshape(lo.cshape())
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=lo.stat_axes, keepdims=True)
    var = jnp.maximum(jnp.mean(yf * yf, axis=lo.stat_axes, keepdims=True)
                      - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    g = p["gamma"].astype(jnp.float32).reshape(lo.cshape())
    be = p["beta"].astype(jnp.float32).reshape(lo.cshape())
    yn = (yf - mean) * inv * g + be
    return jnp.maximum(yn, 0.0).astype(dtype)


def pool(x, lo: Layout):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, lo.window(), lo.window(), "VALID")


def upconv(x, p, lo: Layout, dtype):
    return jax.lax.conv_transpose(
        x, p["w"].astype(dtype), (2, 2), "VALID",
        dimension_numbers=(lo.spec, "HWIO", lo.spec)) + \
        p["b"].astype(dtype).reshape(lo.cshape())


def head(x, p, lo: Layout, dtype):
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(dtype), (1, 1), "SAME",
        dimension_numbers=(lo.spec, "HWIO", lo.spec)) + \
        p["b"].astype(dtype).reshape(lo.cshape())


def trunk(params, x, lo: Layout, dtype=jnp.bfloat16):
    e11 = cbr(x, params["enc1_1"], lo, dtype)
    e12 = cbr(e11, params["enc1_2"], lo, dtype)
    p1 = pool(e12, lo)
    e21 = cbr(p1, params["enc2_1"], lo, dtype)
    e22 = cbr(e21, params["enc2_2"], lo, dtype)
    p2 = pool(e22, lo)
    e31 = cbr(p2, params["enc3_1"], lo, dtype)
    e32 = cbr(e31, params["enc3_2"], lo, dtype)
    p3 = pool(e32, lo)
    d42 = cbr(p3, params["dec4_2"], lo, dtype)
    d41 = cbr(d42, params["dec4_1"], lo, dtype)
    u3 = upconv(d41, params["unpool3"], lo, dtype)
    d32 = cbr(jnp.concatenate([u3, e32], axis=lo.c_axis), params["dec3_2"], lo, dtype)
    d31 = cbr(d32, params["dec3_1"], lo, dtype)
    u2 = upconv(d31, params["unpool2"], lo, dtype)
    d22 = cbr(jnp.concatenate([u2, e22], axis=lo.c_axis), params["dec2_2"], lo, dtype)
    d21 = cbr(d22, params["dec2_1"], lo, dtype)
    u1 = upconv(d21, params["unpool1"], lo, dtype)
    d12 = cbr(jnp.concatenate([u1, e12], axis=lo.c_axis), params["dec1_2"], lo, dtype)
    d11 = cbr(d12, params["dec1_1"], lo, dtype)
    f = head(d11, params["head_f"], lo, dtype)
    g = head(d11, params["head_g"], lo, dtype)
    h = head(d11, params["head_h"], lo, dtype)
    return f, g, h


def loss_fn(params, x, label, lo: Layout):
    f, g, h = trunk(params, x, lo)
    f = f.astype(jnp.float32)
    g = g.astype(jnp.float32)
    h = h.astype(jnp.float32)
    # BCE-with-logits-ish selective composite (shapes only; parity not needed)
    pf = jax.nn.log_sigmoid(f)
    nf = jax.nn.log_sigmoid(-f)
    bce = -(label * pf + (1 - label) * nf)
    sg = jax.nn.sigmoid(g)
    cov = jnp.mean(sg)
    risk = jnp.mean(bce * sg) / cov
    aux = jnp.mean(-(label * jax.nn.log_sigmoid(h)
                     + (1 - label) * jax.nn.log_sigmoid(-h)))
    return risk + 2.0 * jnp.maximum(0.8 - cov, 0.0) ** 2 + aux


def timeit(f, *args, n=10):
    out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    params = make_params(rng)
    x_nhwc = jnp.asarray(rng.standard_normal((B, P, P, 3)), jnp.bfloat16)
    lab_nhwc = jnp.asarray((rng.random((B, P, P, 1)) > 0.7), jnp.float32)

    for spec in ("NHWC", "HCWN"):
        lo = Layout(spec)
        if spec == "NHWC":
            x, lab = x_nhwc, lab_nhwc
        else:
            x = jnp.transpose(x_nhwc, (1, 3, 2, 0))
            lab = jnp.transpose(lab_nhwc, (1, 3, 2, 0))

        @jax.jit
        def fwd(p, xx, lo=lo):
            return trunk(p, xx, lo)

        @jax.jit
        def grad(p, xx, ll, lo=lo):
            return jax.value_and_grad(lambda pp: loss_fn(pp, xx, ll, lo))(p)

        t_fwd = timeit(fwd, params, x)
        t_bwd = timeit(grad, params, x, lab)
        print(f"{spec}: fwd {t_fwd*1e3:7.2f} ms | fwd+bwd {t_bwd*1e3:7.2f} ms "
              f"({B/t_bwd:.0f} patches/s step-equiv w/o optimizer)")


if __name__ == "__main__":
    main()
