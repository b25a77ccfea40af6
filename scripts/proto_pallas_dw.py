"""Prototype: Pallas conv3x3 filter-gradient (dW) kernel, the deferred lever.

docs/RESULTS.md round-1 attribution flagged "XLA's conv filter-gradient
convolutions — the candidate for custom Pallas backward kernels in a later
round"; scripts/profile_dw.py (round 3) then measured isolated dW ~= isolated
fwd per shape, so this kernel is the direct test of whether ANY dW headroom
exists that XLA's emitter leaves on the table.

Design (informed by the fused-CBR end-to-end autopsy, ops/fused_cbr.py):

* Operands are logical [H, W, N, C] — physically identical to the
  batch-minor layouts XLA assigns to in-net conv activations
  ({3,0,2,1} of NHWC), so an in-net integration needs no transposes.
* X3/G3 factorized stack: per (row-band, col-band) tile, stack the 3 ky-row
  shifts of x into X3 [P, 3Ci] and the 3 kx-col shifts of g into G3
  [P, 3Co] (P = TH*TW*N), then ONE dot_general contracting P yields the
  full [3Ci, 3Co] tap matrix per tile:
      dW[ky,kx,ci,co] = sum_{h,w,n} x[h+ky-1, w+kx-1, n, ci] g[h, w, n, co]
                      = sum_{w'}    x[h+ky-1, w',       ci] g[h, w'-kx+1, co]
  (x is zero outside [0,H) rows — H-pad by 1; g zero outside [0,W) cols —
  W-pad by 1; restricting w' to [0,W) is exact because x's W edge terms
  vanish.) For C >= 128 both output dims are multiples of 128: full MXU
  tile occupancy, which a 9-tap [9Ci, Co] im2col form cannot reach at
  Co=64/128.
* Both operands live in ANY/HBM; each grid step double-buffer-DMAs its
  x tile [TH+2, TW, N, Ci] and g tile [TH, TW+2, N, Co] (halos come from
  the pads, so every DMA is in-bounds — no masks).
* f32 accumulator in the [3Ci, 3Co] VMEM output block across the
  sequential (HB, WB) grid; rearranged to [3, 3, Ci, Co] by XLA outside.

Check:  python scripts/proto_pallas_dw.py check [--cpu]     (oracle parity)
Bench:  python scripts/proto_pallas_dw.py bench [shapes...] (vs XLA's dw)

The bench scan-stacks S cotangents inside ONE jit so the axon tunnel's
~8-9 ms per-dispatch floor (measured, scripts/profile_dw.py) amortizes, and
times XLA's own dw in both NHWC (its standalone-best) and HWNC (the in-net
layout) as baselines, plus the pads' cost separately.
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- kernel --

def _dw_kernel(x_hbm, g_hbm, out_ref, xbuf0, xbuf1, gbuf0, gbuf1, sems,
               *, TH, TW, VARIANT):
    xbufs, gbufs = (xbuf0, xbuf1), (gbuf0, gbuf1)
    # Double buffering with STATIC buffer pairs under pl.when: Mosaic rejects
    # a dynamic leading-index slice of a [2, ...] scratch whose lane dim is
    # < 128 ("Slice shape along dimension 3 must be aligned to tiling"), so
    # the slot never appears as a memref index — only as a predicate.
    hb, wb = pl.program_id(0), pl.program_id(1)
    nh, nw = pl.num_programs(0), pl.num_programs(1)
    step = hb * nw + wb
    nsteps = nh * nw

    def copies(slot, h_idx, w_idx):
        return (
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(h_idx * TH, TH + 2), pl.ds(w_idx * TW, TW)],
                xbufs[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                g_hbm.at[pl.ds(h_idx * TH, TH), pl.ds(w_idx * TW, TW + 2)],
                gbufs[slot], sems.at[slot, 1]),
        )

    slot = jax.lax.rem(step, 2)
    nslot = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        for c in copies(0, hb, wb):
            c.start()

    nstep = step + 1
    nhb, nwb = nstep // nw, jax.lax.rem(nstep, nw)
    for s in (0, 1):
        @pl.when(jnp.logical_and(nstep < nsteps, nslot == s))
        def _(s=s):
            for c in copies(s, nhb, nwb):
                c.start()

        @pl.when(slot == s)
        def _(s=s):
            for c in copies(s, hb, wb):
                c.wait()

    Ci = xbufs[0].shape[-1]
    Co = gbufs[0].shape[-1]
    P = TH * TW * xbufs[0].shape[2]
    dims = (((0,), (0,)), ((), ()))

    if VARIANT == "x3g3":
        def tap_matrix(s):
            x = xbufs[s][:]  # [TH+2, TW, N, Ci]
            g = gbufs[s][:]  # [TH, TW+2, N, Co]
            X3 = jnp.concatenate([x[ky:ky + TH] for ky in range(3)], axis=-1)
            G3 = jnp.concatenate(
                [g[:, 2 - kx:2 - kx + TW] for kx in range(3)], axis=-1)
            return jax.lax.dot_general(
                X3.reshape(P, -1), G3.reshape(P, -1), dims,
                preferred_element_type=jnp.float32)

        out_ref[:] += jax.lax.cond(
            slot == 0, lambda: tap_matrix(0), lambda: tap_matrix(1))
    else:  # taps9: no concats; x slices are contiguous views, g copied 3x
        def taps(s):
            x, g = xbufs[s], gbufs[s]
            for kx in range(3):
                Gk = g[:, 2 - kx:2 - kx + TW].reshape(P, Co)
                for ky in range(3):
                    Xk = x[ky:ky + TH].reshape(P, Ci)
                    out_ref[ky * Ci:(ky + 1) * Ci,
                            kx * Co:(kx + 1) * Co] += jax.lax.dot_general(
                        Xk, Gk, dims, preferred_element_type=jnp.float32)

        @pl.when(slot == 0)
        def _():
            taps(0)

        @pl.when(slot == 1)
        def _():
            taps(1)


@functools.partial(jax.jit, static_argnames=("TH", "TW", "variant", "interpret"))
def dw_pallas(x, g, TH=8, TW=8, variant="taps9", interpret=False):
    """x: [H, W, N, Ci], g: [H, W, N, Co] -> dW [3, 3, Ci, Co] f32.

    3x3 SAME stride-1 conv filter gradient (NHWC semantics with the batch
    moved inside: dW = vjp of conv wrt its HWIO filter, cotangent g).
    """
    H, W, N, Ci = x.shape
    Co = g.shape[-1]
    assert H % TH == 0 and W % TW == 0, (H, W, TH, TW)
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_dw_kernel, TH=TH, TW=TW, VARIANT=variant),
        grid=(H // TH, W // TW),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * Ci, 3 * Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, TW, N, Ci), x.dtype),
            pltpu.VMEM((TH + 2, TW, N, Ci), x.dtype),
            pltpu.VMEM((TH, TW + 2, N, Co), g.dtype),
            pltpu.VMEM((TH, TW + 2, N, Co), g.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, gp)
    # [3Ci, 3Co] -> [3, Ci, 3, Co] -> [3, 3, Ci, Co] (tiny, XLA-side)
    return out.reshape(3, Ci, 3, Co).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------- oracle --

def conv_hwnc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("HWNC", "HWIO", "HWNC"))


def conv_nhwc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dw_xla(x, g, conv=conv_hwnc):
    """XLA's filter gradient; f32 output like the in-net grads."""
    ci, co = x.shape[-1], g.shape[-1]
    w0 = jnp.zeros((3, 3, ci, co), jnp.float32)
    _, vjp = jax.vjp(lambda w: conv(x, w.astype(x.dtype)), w0)
    return vjp(g)[0]


def check(cpu: bool):
    print(f"variant={VARIANT}", flush=True)
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    interpret = jax.devices()[0].platform != "tpu"
    rng = np.random.default_rng(0)
    for (h, w, n, ci, co, th, tw) in [
        (16, 16, 8, 64, 64, 8, 8),
        (16, 24, 8, 128, 64, 8, 8),
        (8, 8, 16, 64, 128, 4, 4),
        (32, 16, 4, 128, 128, 8, 16),
    ]:
        x = jnp.asarray(rng.standard_normal((h, w, n, ci)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((h, w, n, co)), jnp.float32)
        want = np.asarray(dw_xla(x, g))
        got = np.asarray(dw_pallas(x, g, TH=th, TW=tw, variant=VARIANT,
                                   interpret=interpret))
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        status = "ok" if err < 2e-6 else "FAIL"
        print(f"f32 {h}x{w} N{n} {ci}->{co} T({th},{tw}): rel {err:.2e} "
              f"{status}", flush=True)
        assert err < 2e-6, (h, w, n, ci, co)
        # bf16 operands, f32 accumulation on both sides
        xb, gb = x.astype(jnp.bfloat16), g.astype(jnp.bfloat16)
        want = np.asarray(dw_xla(xb, gb))
        got = np.asarray(dw_pallas(xb, gb, TH=th, TW=tw, variant=VARIANT,
                                   interpret=interpret))
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        status = "ok" if err < 2e-2 else "FAIL"
        print(f"bf16 {h}x{w} N{n} {ci}->{co} T({th},{tw}): rel {err:.2e} "
              f"{status}", flush=True)
        assert err < 2e-2
    print("ALL DW CHECKS PASSED", flush=True)


# ----------------------------------------------------------------- bench --

SUSTAINED_TFLOPS = 170.0
VARIANT, TH_OVR, TW_OVR = "taps9", 0, 0
# (key, H(=W), Ci, Co, TH, TW, S): batch fixed at 128 to match the flagship
SHAPES = {
    "lvl1": (256, 64, 64, 8, 8, 4),
    "dec1_2": (256, 128, 64, 8, 8, 4),
    "lvl2": (128, 128, 128, 4, 4, 4),
    "lvl2w": (128, 128, 128, 4, 8, 4),
    "dec2_2": (128, 256, 128, 4, 4, 4),
    "lvl3": (64, 256, 256, 4, 4, 6),
    "dec3_2": (64, 512, 256, 2, 4, 6),
    "btl": (32, 512, 512, 2, 4, 6),
}
N = 128


def _time(fn, *args, steps=6):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / steps


def bench(keys):
    print(f"variant={VARIANT} th_ovr={TH_OVR} tw_ovr={TW_OVR}", flush=True)
    print(f"devices: {jax.devices()}", flush=True)
    for key in keys:
        h, ci, co, th, tw, s = SHAPES[key]
        th, tw = TH_OVR or th, TW_OVR or tw
        rng = np.random.default_rng(1)
        x_hwnc = jnp.asarray(
            rng.standard_normal((h, h, N, ci)), jnp.bfloat16)
        gs_hwnc = jnp.asarray(
            rng.standard_normal((s, h, h, N, co)), jnp.bfloat16)
        x_nhwc = jnp.transpose(x_hwnc, (2, 0, 1, 3))
        gs_nhwc = jnp.transpose(gs_hwnc, (0, 3, 1, 2, 4))

        flops = 2 * N * h * h * 9 * ci * co
        ideal = flops / (SUSTAINED_TFLOPS * 1e12) * 1e3

        def scan_over(dw_fn, x, gs):
            def body(acc, g):
                return acc + dw_fn(x, g), None
            return jax.lax.scan(body, jnp.zeros((3, 3, ci, co)), gs)[0]

        f_pallas = jax.jit(functools.partial(
            scan_over,
            lambda x, g: dw_pallas(x, g, TH=th, TW=tw, variant=VARIANT)))
        f_hwnc = jax.jit(functools.partial(
            scan_over, lambda x, g: dw_xla(x, g, conv_hwnc)))
        f_nhwc = jax.jit(functools.partial(
            scan_over, lambda x, g: dw_xla(x, g, conv_nhwc)))

        t_p = _time(f_pallas, x_hwnc, gs_hwnc) / s * 1e3
        t_h = _time(f_hwnc, x_hwnc, gs_hwnc) / s * 1e3
        t_n = _time(f_nhwc, x_nhwc, gs_nhwc) / s * 1e3
        print(f"{key:8s} {ci:3d}->{co:3d} @{h:3d} T({th},{tw}) S{s} "
              f"ideal {ideal:6.2f}  pallas {t_p:6.2f} ({ideal/t_p*100:5.1f}%)"
              f"  xla-hwnc {t_h:6.2f} ({ideal/t_h*100:5.1f}%)"
              f"  xla-nhwc {t_n:6.2f} ({ideal/t_n*100:5.1f}%)"
              f"  speedup {t_h/t_p:4.2f}x/{t_n/t_p:4.2f}x  [ms/iter]",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["check", "bench"])
    ap.add_argument("shapes", nargs="*", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variant", default="taps9", choices=["taps9", "x3g3"])
    ap.add_argument("--th", type=int, default=0)
    ap.add_argument("--tw", type=int, default=0)
    a = ap.parse_args()
    globals()["VARIANT"], globals()["TH_OVR"], globals()["TW_OVR"] = a.variant, a.th, a.tw
    if a.mode == "check":
        check(a.cpu)
    else:
        bench(a.shapes or list(SHAPES))
