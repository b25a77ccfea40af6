"""Prototype: TRANSPOSED-LAYOUT fused CBR kernel (docs/ROADMAP.md #1 entry
condition).

Round-2 finding (docs/RESULTS.md): in-net XLA assigns batch-minor layouts to
conv activations (N packed into lanes with C when C=64), runs level-1 convs
at ~50 TF/s, and every pallas/XLA boundary pays transpose copies because
pallas_call only speaks default layouts. A winning Pallas trunk must
therefore (a) adopt the N-in-lanes layout LOGICALLY (so default row-major
layout == the good layout) and (b) beat 50 TF/s at the level-1 shape
(Cin=Cout=64) — otherwise a full-trunk rewrite is pointless.

This prototype stores activations as (H, Cin, W, N): minor dims (W, N) give
lanes = N = 128 (always full, any channel count) and W in sublanes. The
3x3 conv is computed per output row as THREE dx-dots with the dy taps
STACKED into the contraction:

    t_dx = W_dx^T (Cout, 3*Cin)  @  x[h-1:h+2] (3*Cin, (w_blk+2)*N)
    acc += t_dx[:, dx : dx+w_blk, :]        (output-side sublane shift)

so K = 3*Cin = 192 (vs 64 for per-tap dots) and the matmul N-dim is
(w_blk+2)*128 — full lanes regardless of channel count. The prologue
(previous BN affine + ReLU) and epilogue (this layer's BN sum/sumsq) ride in
the same pass, exactly like ops/fused_cbr.py.

Measured candidates on the level-1 shape (N=128, 256x256, 64->64, bf16):
  A. XLA conv alone, NHWC (isolated default-layout baseline)
  B. XLA conv + train BN stats + normalize + relu, NHWC (the unfused chain)
  C. transposed Pallas fused (this kernel), (H, C, W, N) layout
  D. in-net XLA reference rate: 50 TF/s (from the round-2 xplane profile)

Success gate: C's effective conv rate (618 GFLOP / time) >= ~50 TF/s.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, y_ref, stats_ref, xn_ref,
            *, rows: int, w_blk: int, Cin: int, Cout: int, N: int,
            apply_prologue: bool):
    """One (row-block, w-block) step.  The (W, N) dims are FLATTENED into one
    trailing dim so block shapes satisfy the (8, 128) divisibility rule.

    x_ref:    (rows+2, Cin, (w_blk+2)*N) input block incl. halo (pre-padded)
    a/b_ref:  (Cin, 1) prologue affine
    w_ref:    (3, Cout, 3*Cin) taps: w_ref[dx] = [W[0,dx]; W[1,dx]; W[2,dx]]^T
    bias_ref: (Cout, 1)
    y_ref:    (rows, Cout, w_blk*N)
    stats_ref:(2, Cout) f32 accumulated sum / sumsq
    xn_ref:   (rows+2, Cin, (w_blk+2)*N) scratch for the normalized input
    """
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    X = (w_blk + 2) * N
    if apply_prologue:
        x = x_ref[:]
        a = a_ref[:, 0].astype(jnp.float32).reshape(1, Cin, 1)
        b = b_ref[:, 0].astype(jnp.float32).reshape(1, Cin, 1)
        xn = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0)
        xn_ref[:] = xn.astype(x.dtype)
        # zero-pad ring: the raw array was zero-padded BEFORE the affine;
        # relu(b) must not leak into the halo
        zrow = jnp.zeros((1, Cin, X), x.dtype)
        zcol = jnp.zeros((rows + 2, Cin, N), x.dtype)

        @pl.when(pl.program_id(0) == 0)
        def _():
            xn_ref[0:1] = zrow

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            xn_ref[rows + 1:rows + 2] = zrow

        @pl.when(pl.program_id(1) == 0)
        def _():
            xn_ref[:, :, 0:N] = zcol

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            xn_ref[:, :, (w_blk + 1) * N:X] = zcol
    else:
        xn_ref[:] = x_ref[:]

    # stats accumulators stay 2D (1, Cout): 1D (Cout,) vector values crash
    # the Mosaic compiler (SIGABRT; bisected in scripts/bisect_transposed3.py)
    s0 = jnp.zeros((1, Cout), jnp.float32)
    s1 = jnp.zeros((1, Cout), jnp.float32)
    for r in range(rows):
        # (3, Cin, (w_blk+2)*N) -> (3*Cin, (w_blk+2)*N): contiguous reshape
        xr = xn_ref[r:r + 3].reshape(3 * Cin, X)
        acc = jnp.zeros((Cout, w_blk, N), jnp.float32)
        for dx in range(3):
            t = jnp.dot(w_ref[dx], xr, preferred_element_type=jnp.float32)
            t = t.reshape(Cout, w_blk + 2, N)
            acc = acc + t[:, dx:dx + w_blk, :]
        acc = acc + bias_ref[:, 0].astype(jnp.float32).reshape(Cout, 1, 1)
        yc = acc.astype(y_ref.dtype)
        y_ref[r] = yc.reshape(Cout, w_blk * N)
        yf = yc.astype(jnp.float32)
        s0 = s0 + jnp.sum(yf, axis=2).sum(axis=1).reshape(1, Cout)
        s1 = s1 + jnp.sum(yf * yf, axis=2).sum(axis=1).reshape(1, Cout)
    stats_ref[0:1, :] += s0
    stats_ref[1:2, :] += s1


@functools.partial(jax.jit, static_argnames=("rows", "w_blk", "apply_prologue",
                                             "interpret"))
def transposed_fused_cbr(x, a, b, w, bias, rows=4, w_blk=32,
                         apply_prologue=True, interpret=False):
    """x: (H, Cin, W, N).  w: (3, 3, Cin, Cout) HWIO.  Returns
    (y (H, Cout, W, N), stats (2, Cout) f32)."""
    H, Cin, W, N = x.shape
    Cout = w.shape[-1]
    assert H % rows == 0 and W % w_blk == 0

    xp = jnp.pad(x, ((1, 1), (0, 0), (1, 1), (0, 0)))
    xp = xp.reshape(H + 2, Cin, (W + 2) * N)  # flatten (W, N): free, row-major
    # w_ref[dx] = concat_dy(W[dy, dx])^T : (Cout, 3*Cin)
    wt = jnp.transpose(w.astype(x.dtype), (1, 0, 2, 3))  # (dx, dy, Cin, Cout)
    wt = wt.reshape(3, 3 * Cin, Cout)
    wt = jnp.transpose(wt, (0, 2, 1))  # (3, Cout, 3*Cin)

    kernel = functools.partial(_kernel, rows=rows, w_blk=w_blk, Cin=Cin,
                               Cout=Cout, N=N, apply_prologue=apply_prologue)
    y, stats = pl.pallas_call(
        kernel,
        grid=(H // rows, W // w_blk),
        in_specs=[
            pl.BlockSpec((pl.Element(rows + 2), pl.Element(Cin),
                          pl.Element((w_blk + 2) * N)),
                         lambda i, j: (i * rows, 0, j * w_blk * N),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Cout, 3 * Cin), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, Cout, w_blk * N), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, Cout, W * N), x.dtype),
            jax.ShapeDtypeStruct((2, Cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((rows + 2, Cin, (w_blk + 2) * N), x.dtype)],
        interpret=interpret,
    )(xp, a.astype(jnp.float32)[:, None], b.astype(jnp.float32)[:, None], wt,
      bias.astype(jnp.float32)[:, None])
    return y.reshape(H, Cout, W, N), stats


# ---------------------------------------------------------------------------
# v2: stacked-M dot (one (3*Cout, 3*Cin) @ (3*Cin, X) dot per output row),
# no scratch (normalized block held as a value), and NO in-kernel zero ring:
# the caller pre-fills the pad ring with v_c = (-1 - b_c)/a_c, which the
# prologue maps exactly to relu(v*a + b) = relu(-1) = 0.
# ---------------------------------------------------------------------------

def _kernel2(x_ref, a_ref, b_ref, w_ref, bias_ref, y_ref, stats_ref, *,
             rows: int, w_blk: int, Cin: int, Cout: int, N: int,
             apply_prologue: bool):
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(step == 0)
    def _():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    X = (w_blk + 2) * N
    if apply_prologue:
        a = a_ref[:, 0].astype(jnp.float32).reshape(1, Cin, 1)
        b = b_ref[:, 0].astype(jnp.float32).reshape(1, Cin, 1)
        xn = jnp.maximum(x_ref[:].astype(jnp.float32) * a + b, 0.0
                         ).astype(x_ref.dtype)
    else:
        xn = x_ref[:]

    s0 = jnp.zeros((1, Cout), jnp.float32)
    s1 = jnp.zeros((1, Cout), jnp.float32)
    for r in range(rows):
        xr = jax.lax.slice_in_dim(xn, r, r + 3, axis=0).reshape(3 * Cin, X)
        t = jnp.dot(w_ref[:], xr, preferred_element_type=jnp.float32)
        t = t.reshape(3, Cout, w_blk + 2, N)
        acc = (t[0, :, 0:w_blk, :] + t[1, :, 1:w_blk + 1, :]
               + t[2, :, 2:w_blk + 2, :])
        acc = acc + bias_ref[:, 0].astype(jnp.float32).reshape(Cout, 1, 1)
        yc = acc.astype(y_ref.dtype)
        y_ref[r] = yc.reshape(Cout, w_blk * N)
        yf = yc.astype(jnp.float32)
        s0 = s0 + jnp.sum(yf, axis=2).sum(axis=1).reshape(1, Cout)
        s1 = s1 + jnp.sum(yf * yf, axis=2).sum(axis=1).reshape(1, Cout)
    stats_ref[0:1, :] += s0
    stats_ref[1:2, :] += s1


@functools.partial(jax.jit, static_argnames=("rows", "w_blk", "apply_prologue",
                                             "interpret", "vmem_mb"))
def transposed_fused_cbr_v2(x, a, b, w, bias, rows=4, w_blk=16,
                            apply_prologue=True, interpret=False,
                            vmem_mb=None):
    """x: (H, Cin, W, N).  w: (3, 3, Cin, Cout) HWIO.  Returns
    (y (H, Cout, W, N), stats (2, Cout) f32)."""
    H, Cin, W, N = x.shape
    Cout = w.shape[-1]
    assert H % rows == 0 and W % w_blk == 0

    if apply_prologue:
        # pad value the prologue maps exactly to 0 (relu(v*a+b) = relu(-1))
        af = a.astype(jnp.float32)
        v = jnp.where(jnp.abs(af) > 1e-12, (-1.0 - b.astype(jnp.float32))
                      / jnp.where(jnp.abs(af) > 1e-12, af, 1.0), 0.0)
        ring = jnp.broadcast_to(v.astype(x.dtype).reshape(1, Cin, 1, 1),
                                (1, Cin, W + 2, N))
        xp = jnp.pad(x, ((1, 1), (0, 0), (1, 1), (0, 0)))
        colv = jnp.broadcast_to(v.astype(x.dtype).reshape(1, Cin, 1, 1),
                                (H + 2, Cin, 1, N))
        xp = xp.at[0:1].set(ring).at[H + 1:H + 2].set(ring)
        xp = xp.at[:, :, 0:1, :].set(colv).at[:, :, W + 1:W + 2, :].set(colv)
    else:
        xp = jnp.pad(x, ((1, 1), (0, 0), (1, 1), (0, 0)))
    xp = xp.reshape(H + 2, Cin, (W + 2) * N)

    # w_ref row (dx*Cout + co) = concat_dy(W[dy, dx, :, co]) : (3*Cout, 3*Cin)
    wt = jnp.transpose(w.astype(x.dtype), (1, 3, 0, 2))  # (dx, Cout, dy, Cin)
    wt = wt.reshape(3 * Cout, 3 * Cin)

    params = None
    if vmem_mb is not None:
        params = pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)

    kernel = functools.partial(_kernel2, rows=rows, w_blk=w_blk, Cin=Cin,
                               Cout=Cout, N=N, apply_prologue=apply_prologue)
    y, stats = pl.pallas_call(
        kernel,
        grid=(H // rows, W // w_blk),
        in_specs=[
            pl.BlockSpec((pl.Element(rows + 2), pl.Element(Cin),
                          pl.Element((w_blk + 2) * N)),
                         lambda i, j: (i * rows, 0, j * w_blk * N),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cin, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * Cout, 3 * Cin), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Cout, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, Cout, w_blk * N), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, Cout, W * N), x.dtype),
            jax.ShapeDtypeStruct((2, Cout), jnp.float32),
        ],
        compiler_params=params,
        interpret=interpret,
    )(xp, a.astype(jnp.float32)[:, None], b.astype(jnp.float32)[:, None], wt,
      bias.astype(jnp.float32)[:, None])
    return y.reshape(H, Cout, W, N), stats


# ---------------------------------------------------------------------------
# baselines + checks
# ---------------------------------------------------------------------------

@jax.jit
def xla_conv_only(xn, w, bias):
    y = jax.lax.conv_general_dilated(
        xn, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


@jax.jit
def xla_chain(x, a, b, w, bias):
    xn = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xn, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias
    yf = y.astype(jnp.float32)
    stats = jnp.stack([jnp.sum(yf, axis=(0, 1, 2)),
                       jnp.sum(yf * yf, axis=(0, 1, 2))])
    return y, stats


def timeit(fn, *args, iters=20):
    out = fn(*args)
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    float(jnp.sum(leaf.astype(jnp.float32)))  # tunnel-safe sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[-1]
    float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def check_numerics(N=8, H=32, W=32, Cin=64, Cout=64, interpret=True):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N, H, W, Cin)).astype(np.float32) * 0.5
    a = rng.standard_normal(Cin).astype(np.float32) * 0.1 + 1.0
    b = rng.standard_normal(Cin).astype(np.float32) * 0.1
    w = (rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32) * 0.05)
    bias = rng.standard_normal(Cout).astype(np.float32) * 0.1

    y_ref, s_ref = xla_chain(jnp.asarray(x), jnp.asarray(a), jnp.asarray(b),
                             jnp.asarray(w), jnp.asarray(bias))
    xt = jnp.transpose(jnp.asarray(x), (1, 3, 2, 0))  # (H, C, W, N)
    for tag, fn in (("v1", transposed_fused_cbr), ("v2", transposed_fused_cbr_v2)):
        y_t, s_t = fn(xt, jnp.asarray(a), jnp.asarray(b),
                      jnp.asarray(w), jnp.asarray(bias),
                      rows=4, w_blk=16, interpret=interpret)
        y_t2 = jnp.transpose(y_t, (3, 0, 2, 1))  # back to NHWC
        err = float(jnp.max(jnp.abs(y_t2.astype(jnp.float32) - y_ref.astype(jnp.float32))))
        serr = float(jnp.max(jnp.abs(s_t - s_ref)))
        print(f"numerics {tag}: max|dy|={err:.3e} max|dstats|={serr:.3e}")
        assert err < 1e-3 and serr < 0.5, f"numerics mismatch ({tag})"


def bench(N=128, H=256, W=256, Cin=64, Cout=64, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    flops = 2 * N * H * W * 9 * Cin * Cout
    x = jnp.asarray(rng.standard_normal((N, H, W, Cin)), dtype)
    a = jnp.asarray(rng.standard_normal(Cin), jnp.float32) * 0.1 + 1.0
    b = jnp.asarray(rng.standard_normal(Cin), jnp.float32) * 0.1
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05, dtype)
    bias = jnp.asarray(rng.standard_normal(Cout), jnp.float32) * 0.1
    xn = jnp.maximum(x.astype(jnp.float32) * a + b, 0).astype(dtype)
    xt = jnp.asarray(jnp.transpose(x, (1, 3, 2, 0)))  # (H, C, W, N)

    tA = timeit(xla_conv_only, xn, w, bias.astype(dtype))
    print(f"A xla conv only (NHWC, isolated): {tA*1e3:7.2f} ms  "
          f"{flops/tA/1e12:6.1f} TF/s")
    tB = timeit(xla_chain, x, a, b, w, bias)
    print(f"B xla chain conv+BNstats+relu   : {tB*1e3:7.2f} ms  "
          f"{flops/tB/1e12:6.1f} TF/s-eff")
    t = timeit(functools.partial(transposed_fused_cbr, rows=4, w_blk=16),
               xt, a, b, w, bias)
    print(f"C v1 rows=4 w_blk=16: {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s-eff")
    for rows, w_blk, vmem in ((4, 16, None), (8, 16, None), (4, 32, None),
                              (8, 16, 64), (4, 32, 64), (8, 32, 96),
                              (16, 32, 110), (4, 64, 96)):
        try:
            t = timeit(functools.partial(transposed_fused_cbr_v2, rows=rows,
                                         w_blk=w_blk, vmem_mb=vmem),
                       xt, a, b, w, bias)
            print(f"C v2 rows={rows:3d} w_blk={w_blk:3d} vmem={vmem}: "
                  f"{t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s-eff")
        except Exception as e:
            print(f"C v2 rows={rows} w_blk={w_blk} vmem={vmem}: FAILED "
                  f"{type(e).__name__}: {str(e)[:110]}")
    print("D in-net XLA reference rate: ~50 TF/s (round-2 xplane profile)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("check", "all"):
        check_numerics()
    if which in ("bench", "all"):
        bench()
