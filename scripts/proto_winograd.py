"""Winograd conv3x3 prototype — the algorithmic lever the round-2/3 sweeps never tried.

Every prior campaign (docs/RESULTS.md) attacked XLA's direct-conv emitters at
constant arithmetic: Pallas kernels (layout-boundary losses), logical layouts
(no-op in-net), remat/scheduling/accumulation (negative), bf16 stats
(negative). The round-3 conclusion said closing the backward gap "requires
changes inside XLA's conv filter-gradient codegen". This prototype tests the
one reformulation that sidesteps that codegen entirely while staying 100%
inside XLA: Winograd F(2x2,3x3) / F(4x4,3x3).

  y = A^T [ (G w G^T) .* (B^T d B) ] A       (per tile, per channel pair)

* The element-wise tile products become 16 (F2) / 36 (F4) batched GEMMs
  [P, Cin] x [Cin, Cout] with P = N*ceil(H/m)*ceil(W/m) — pure MXU work at
  the measured 170 TF/s sustained rate, no conv emitter involved.
* Arithmetic drops 18/8 = 2.25x (F2) or 18/4.5 = 4x (F4) vs direct conv.
* jax.grad of this graph gives BOTH input- and filter-gradients as batched
  GEMMs too — the +23% filter-gradient overhead class disappears by
  construction.
* Cost: transform traffic (V and M are 4x/2.25x the activation size) and
  extra rounding (transform combos in bf16; F4's G has 1/6, 1/24 entries).

Run on CPU for correctness (tiny shapes), on the real TPU for timing:
    python scripts/proto_winograd.py check        # numerics vs lax.conv
    python scripts/proto_winograd.py layers       # per-UNet_B-layer fwd / fwd+bwd
    python scripts/proto_winograd.py trunk        # full UNet_B trunk fwd+bwd
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# transform matrices
# ---------------------------------------------------------------------------

# F(2x2, 3x3): tile 4x4, output 2x2
BT2 = np.array([
    [1, 0, -1, 0],
    [0, 1, 1, 0],
    [0, -1, 1, 0],
    [0, 1, 0, -1],
], np.float32)
G2 = np.array([
    [1, 0, 0],
    [0.5, 0.5, 0.5],
    [0.5, -0.5, 0.5],
    [0, 0, 1],
], np.float32)
AT2 = np.array([
    [1, 1, 1, 0],
    [0, 1, -1, -1],
], np.float32)

# F(4x4, 3x3): tile 6x6, output 4x4 (standard Lavin-Gray coefficients)
BT4 = np.array([
    [4, 0, -5, 0, 1, 0],
    [0, -4, -4, 1, 1, 0],
    [0, 4, -4, -1, 1, 0],
    [0, -2, -1, 2, 1, 0],
    [0, 2, -1, -2, 1, 0],
    [0, 4, 0, -5, 0, 1],
], np.float32)
G4 = np.array([
    [1 / 4, 0, 0],
    [-1 / 6, -1 / 6, -1 / 6],
    [-1 / 6, 1 / 6, -1 / 6],
    [1 / 24, 1 / 12, 1 / 6],
    [1 / 24, -1 / 12, 1 / 6],
    [0, 0, 1],
], np.float32)
AT4 = np.array([
    [1, 1, 1, 1, 1, 0],
    [0, 1, -1, 2, -2, 0],
    [0, 1, 1, 4, 4, 0],
    [0, 1, -1, 8, -8, 1],
], np.float32)

TILES = {2: (BT2, G2, AT2, 4), 4: (BT4, G4, AT4, 6)}


def _bt2(a):
    """B^T(F2) applied along a list-of-4 axis: 1-2 adds per output."""
    return [a[0] - a[2], a[1] + a[2], a[2] - a[1], a[1] - a[3]]


def _at2(a):
    """A^T(F2) applied along a list-of-4 axis."""
    return [a[0] + a[1] + a[2], a[1] - a[2] - a[3]]


def winograd_conv(x, w, m=2, gemm_dtype=jnp.bfloat16, impl="adds",
                  transform_dtype=None):
    """SAME, stride-1 3x3 conv via Winograd F(mxm, 3x3).

    x: [N, H, W, Cin] (H, W divisible by m), w: [3, 3, Cin, Cout].
    The tile GEMMs run in gemm_dtype with f32 accumulation (mirrors XLA's
    bf16-in/f32-acc conv behavior). impl='adds' expands the F2 data/output
    transforms as explicit fusable adds; 'einsum' uses the matrix form (only
    option for F4). transform_dtype defaults to gemm_dtype (doing the combos
    in bf16 directly skips a f32 upcast of the activations; error stays
    within ~2x of direct-bf16 conv rounding, see `check`).
    """
    BT, G, AT, t = TILES[m]
    N, H, W, Ci = x.shape
    Co = w.shape[-1]
    assert H % m == 0 and W % m == 0, (H, W, m)
    nH, nW = H // m, W // m
    tdt = transform_dtype or gemm_dtype
    xp = jnp.pad(x.astype(tdt), ((0, 0), (1, 1), (1, 1), (0, 0)))

    # t*t strided views: d[i][j] -> [N, nH, nW, Ci]
    d = [[xp[:, i:i + m * nH:m, j:j + m * nW:m, :] for j in range(t)]
         for i in range(t)]

    # weight transform U = G w G^T (tiny: [t,t,Ci,Co]) — always f32 combos
    U = jnp.einsum("ki,lj,ijco->klco", jnp.asarray(G), jnp.asarray(G),
                   w.astype(jnp.float32))

    if impl == "adds" and m == 2:
        cols = [_bt2([d[i][j] for i in range(t)]) for j in range(t)]  # [j][k]
        V = [[_bt2([cols[j][k] for j in range(t)])[l] for l in range(t)]
             for k in range(t)]
        Vg = jnp.stack([V[k][l] for k in range(t) for l in range(t)])
    else:
        D = jnp.stack([jnp.stack(r) for r in d])  # [t, t, N, nH, nW, Ci]
        BTj = jnp.asarray(BT, tdt)
        Vg = jnp.einsum("ki,lj,ijnhwc->klnhwc", BTj, BTj, D).reshape(
            t * t, N, nH, nW, Ci)

    # batched GEMM over the t*t tile positions
    Vg = Vg.astype(gemm_dtype).reshape(t * t, N * nH * nW, Ci)
    Ug = U.astype(gemm_dtype).reshape(t * t, Ci, Co)
    M = lax.dot_general(
        Vg, Ug, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(t, t, N, nH, nW, Co)

    if impl == "adds" and m == 2:
        Ml = [[M[k, l] for l in range(t)] for k in range(t)]
        rows_o = [_at2([Ml[k][l] for k in range(t)]) for l in range(t)]  # [l][a]
        Y = jnp.stack([
            jnp.stack([_at2([rows_o[l][a] for l in range(t)])[b]
                       for b in range(m)])
            for a in range(m)
        ])  # [a, b, N, nH, nW, Co]
        Y = Y.transpose(2, 3, 0, 4, 1, 5)
    else:
        ATj = jnp.asarray(AT, jnp.float32)
        Y = jnp.einsum("ak,bl,klnhwo->nhawbo", ATj, ATj, M)
    return Y.reshape(N, H, W, Co).astype(x.dtype)


def direct_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def _sync(x):
    # axon tunnel: block_until_ready returns early; a scalar fetch synchronizes
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out if isinstance(out, jax.Array) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out if isinstance(out, jax.Array) else out[0])
    return (time.perf_counter() - t0) / iters


def check():
    rng = np.random.default_rng(0)
    for m in (2, 4):
        for (H, Ci, Co) in ((8, 3, 8), (16, 8, 16), (32, 16, 8)):
            x = rng.standard_normal((2, H, H, Ci)).astype(np.float32)
            w = (rng.standard_normal((3, 3, Ci, Co)) * 0.1).astype(np.float32)
            ref = direct_conv(jnp.asarray(x), jnp.asarray(w))
            # the fair bf16 yardstick: XLA's own direct conv on bf16 operands
            d16 = direct_conv(jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16))
            yard = float(jnp.max(jnp.abs(d16.astype(jnp.float32) - ref))
                         / jnp.max(jnp.abs(ref)))
            # F(2) bf16 must stay within ~4x of direct-bf16 rounding; F(4)'s
            # 4/-5/8 transform coefficients blow bf16 up — report, don't assert
            for dt, tol in ((jnp.float32, 5e-5),
                            (jnp.bfloat16, max(4 * yard, 1e-2) if m == 2 else None)):
                for impl in ("adds", "einsum") if m == 2 else ("einsum",):
                    got = winograd_conv(jnp.asarray(x), jnp.asarray(w), m=m,
                                        gemm_dtype=dt, impl=impl)
                    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
                    rel = err / float(jnp.max(jnp.abs(ref)))
                    status = "OK" if tol is None or rel < tol else "FAIL"
                    print(f"F({m}) {impl:6s} H={H} Ci={Ci} Co={Co} {dt.__name__:9s} "
                          f"max_abs={err:.3e} rel={rel:.3e} (direct-bf16 yardstick "
                          f"{yard:.3e}) {status}")
                    assert tol is None or rel < tol, (m, H, Ci, Co, dt, impl)
    # gradient correctness (f32)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, 4, 6)) * 0.1).astype(np.float32))
    for m in (2, 4):
        g_ref = jax.grad(lambda w: jnp.sum(jnp.sin(direct_conv(x, w))))(w)
        g_win = jax.grad(lambda w: jnp.sum(jnp.sin(
            winograd_conv(x, w, m=m, gemm_dtype=jnp.float32))))(w)
        rel = float(jnp.max(jnp.abs(g_win - g_ref)) / jnp.max(jnp.abs(g_ref)))
        print(f"F({m}) filter-grad rel={rel:.3e} {'OK' if rel < 1e-4 else 'FAIL'}")
        assert rel < 1e-4
    print("ALL WINOGRAD CHECKS PASSED")


# UNet_B conv shapes at batch 128, 256px (docs/RESULTS.md layer naming)
LAYERS = [
    ("level1 64->64 @256", 128, 256, 64, 64),
    ("enc2_1 64->128 @128", 128, 128, 64, 128),
    ("level2 128->128 @128", 128, 128, 128, 128),
    ("enc3_1 128->256 @64", 128, 64, 128, 256),
    ("level3 256->256 @64", 128, 64, 256, 256),
    ("dec4_2 256->512 @32", 128, 32, 256, 512),
    ("bottleneck 512->512 @32", 128, 32, 512, 512),
]


def bench_layers(batch=None):
    rng = np.random.default_rng(0)
    print(f"{'layer':26s} {'direct':>9s} {'winoF2':>9s} {'winoF4':>9s}"
          f" {'F2 x':>6s} {'F4 x':>6s}   (fwd | fwd+bwd ms)")
    for name, N, H, Ci, Co in LAYERS:
        if batch:
            N = batch
        x = jnp.asarray(rng.standard_normal((N, H, H, Ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05, jnp.bfloat16)

        fns = {
            "direct": jax.jit(direct_conv),
            "winoF2": jax.jit(partial(winograd_conv, m=2)),
            "winoF4": jax.jit(partial(winograd_conv, m=4)),
        }
        fwd = {k: timeit(f, x, w) * 1e3 for k, f in fns.items()}

        def loss_of(f):
            return jax.jit(jax.grad(
                lambda x, w: jnp.sum(f(x, w).astype(jnp.float32)), argnums=(0, 1)))

        bwd = {k: timeit(loss_of(f), x, w) * 1e3 for k, f in fns.items()}
        print(f"{name:26s} {fwd['direct']:6.2f}|{bwd['direct']:6.2f} "
              f"{fwd['winoF2']:6.2f}|{bwd['winoF2']:6.2f} "
              f"{fwd['winoF4']:6.2f}|{bwd['winoF4']:6.2f} "
              f"{bwd['direct'] / bwd['winoF2']:6.2f} {bwd['direct'] / bwd['winoF4']:6.2f}")


def bench_trunk(batch=128, patch=256):
    """Full UNet_B substrate (scripts/proto_hcwn_trunk.py shapes) fwd+bwd:
    direct vs winograd-above-channel-threshold. Matches perf_round3's
    methodology so numbers are comparable with the round-3 lever table."""
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from scripts.proto_hcwn_trunk import CH, Layout, head, make_params, pool, upconv

    LO = Layout("NHWC")
    dtype = jnp.bfloat16

    def cbr(x, p, wino: bool, impl: str, remat: bool = False):
        if wino:
            conv = partial(winograd_conv, m=2, gemm_dtype=dtype, impl=impl)
            if remat:
                # don't save V (4x the activation size) for the backward;
                # recompute the cheap transform combos from x instead
                conv = jax.checkpoint(conv)
            y = conv(x, p["w"].astype(dtype))
        else:
            y = lax.conv_general_dilated(
                x, p["w"].astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + p["b"].astype(dtype).reshape(LO.cshape())
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=LO.stat_axes, keepdims=True)
        var = jnp.maximum(jnp.mean(yf * yf, axis=LO.stat_axes, keepdims=True)
                          - mean * mean, 0.0)
        inv = lax.rsqrt(var + 1e-5)
        g = p["gamma"].astype(jnp.float32).reshape(LO.cshape())
        be = p["beta"].astype(jnp.float32).reshape(LO.cshape())
        return jnp.maximum((yf - mean) * inv * g + be, 0.0).astype(dtype)

    chan = {name: (ci, co) for name, ci, co in CH}

    def make_loss(threshold: int, impl: str, remat: bool = False):
        def block(x, params, names):
            for n in names:
                ci, co = chan[n]
                x = cbr(x, params[n], wino=min(ci, co) >= threshold, impl=impl,
                        remat=remat)
            return x

        def trunk(params, x):
            e1 = block(x, params, ("enc1_1", "enc1_2"))
            e2 = block(pool(e1, LO), params, ("enc2_1", "enc2_2"))
            e3 = block(pool(e2, LO), params, ("enc3_1", "enc3_2"))
            bt = block(pool(e3, LO), params, ("dec4_2", "dec4_1"))
            u3 = upconv(bt, params["unpool3"], LO, dtype)
            d3 = block(jnp.concatenate([u3, e3], axis=-1), params, ("dec3_2", "dec3_1"))
            u2 = upconv(d3, params["unpool2"], LO, dtype)
            d2 = block(jnp.concatenate([u2, e2], axis=-1), params, ("dec2_2", "dec2_1"))
            u1 = upconv(d2, params["unpool1"], LO, dtype)
            d1 = block(jnp.concatenate([u1, e1], axis=-1), params, ("dec1_2", "dec1_1"))
            f = head(d1, params["head_f"], LO, dtype)
            g = head(d1, params["head_g"], LO, dtype)
            h = head(d1, params["head_h"], LO, dtype)
            return f, g, h

        def loss(params, x, label):
            f, g, h = trunk(params, x)
            f, g, h = (a.astype(jnp.float32).squeeze(-1) for a in (f, g, h))
            bce = -(label * jax.nn.log_sigmoid(f)
                    + (1 - label) * jax.nn.log_sigmoid(-f))
            sg = jax.nn.sigmoid(g)
            cov = jnp.mean(sg)
            risk = jnp.mean(bce * sg) / cov
            aux = jnp.mean(-(label * jax.nn.log_sigmoid(h)
                             + (1 - label) * jax.nn.log_sigmoid(-h)))
            return risk + 2.0 * jnp.maximum(0.8 - cov, 0.0) ** 2 + aux

        return loss

    rng = np.random.default_rng(0)
    params = make_params(rng, jnp.float32)
    x = jnp.asarray(rng.standard_normal((batch, patch, patch, 3)), dtype)
    label = jnp.asarray((rng.random((batch, patch, patch)) > 0.7), jnp.float32)

    variants = [("direct", 10_000, "adds", False),
                ("wino>=512", 512, "adds", False),
                ("wino>=256", 256, "adds", False),
                ("wino>=128", 128, "adds", False),
                ("wino>=64 (all)", 64, "adds", False),
                ("wino>=128 einsum", 128, "einsum", False),
                ("wino>=128 remat", 128, "adds", True),
                ("wino>=64 remat", 64, "adds", True)]
    results = {}
    for name, thr, impl, remat in variants:
        loss = make_loss(thr, impl, remat)
        fwd = jax.jit(loss)
        gfn = jax.jit(jax.grad(loss))
        try:
            tf = timeit(fwd, params, x, label, iters=8) * 1e3
            tg = timeit(lambda p, x, l: gfn(p, x, l)["enc1_1"]["w"],
                        params, x, label, iters=8) * 1e3
        except Exception as e:  # noqa: BLE001 — OOM etc: record and continue
            print(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        pps = batch / (tg / 1e3)
        results[name] = (tf, tg, pps)
        print(f"{name:18s} fwd {tf:7.2f} ms   fwd+bwd {tg:7.2f} ms "
              f"  -> {pps:7.1f} patches/s", flush=True)
    return results


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        jax.config.update("jax_platforms", "cpu")
        check()
    elif mode == "layers":
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else None
        bench_layers(batch)
    elif mode == "trunk":
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
        bench_trunk(batch)
    elif mode == "trunk_smoke":  # cheap CPU shape/graph validation
        jax.config.update("jax_platforms", "cpu")
        bench_trunk(batch=2, patch=32)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
