"""U-Net / U-Net_B with optional SelectiveNet heads, NHWC, TPU-first.

Capability parity with reference model.py:
  * ``CBR`` block = Conv3x3(s1, p1, bias) -> BatchNorm -> ReLU (model.py:9-15)
  * channel schedule 64-64 / 128-128 / 256-256 encoder, 512-512 bottleneck,
    ConvTranspose(k=2, s=2) upsampling with skip concatenation
    (model.py:19-66), cat order = (upsampled, skip) on the channel axis
    (model.py:83, 87, 91)
  * ``UNetB``: 1x1 head -> 1 channel squeezed to (N, H, W) logits; selective
    mode adds ``conv_select`` / ``conv_aux`` 1-channel 1x1 heads
    (model.py:62-66, 96-103)
  * ``UNet``: n_cls-channel head; selective heads are 2- and n_cls-channel
    (model.py:150-154, 184-191); outputs NHWC (reference emits NCHW — layout
    is the only deliberate difference, because NHWC is the TPU-native layout
    XLA tiles onto the MXU without transposes)
  * input channels: 3 for RGB-like input types, 2 for GH (model.py:24-27)

Design notes (TPU):
  * Fully convolutional and shape-polymorphic: the same params run 256x256
    patches and arbitrary-size tiles (reference u-net_testing.ipynb cells
    64-74) as long as H, W are multiples of 8.
  * ``compute_dtype=bfloat16`` keeps conv math on the MXU at bf16 rate while
    params and BatchNorm statistics stay float32.
  * BatchNorm: under ``jax.jit`` over a batch-sharded array the batch means
    are *global-batch* statistics (XLA all-reduces across the mesh). torch
    DataParallel instead uses per-replica statistics (train.py:132-134);
    global-batch BN is the cleaner, mesh-size-independent semantics and is
    the default (see SURVEY.md §7 risk 2). ``bn_mode='per_replica'``
    (GroupedBatchNorm) opts into the faithful DataParallel emulation,
    lockstep-pinned against a 2-replica torch oracle (test_lockstep.py).
  * Optional ``dropout_rate`` (off by default; the reference model has no
    dropout) enables the MC stochastic-forward uncertainty path whose
    aggregation math is specified in reference check_MC_dropout.ipynb.
  * Initialization mirrors torch's conv defaults: kaiming-uniform(a=sqrt(5))
    == variance_scaling(1/3, fan_in, uniform); bias ~ U(+-1/sqrt(fan_in)).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch nn.Conv2d default weight init: kaiming_uniform(a=sqrt(5)) which has
# variance 1/(3 * fan_in) -> variance_scaling(scale=1/3, fan_in, uniform).
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _uniform_init(bound: float):
    """U(-bound, bound) initializer."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int):
    """torch conv bias default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return _uniform_init(1.0 / fan_in ** 0.5)


class LowPrecStatsBN(nn.Module):
    """BatchNorm whose BATCH statistics are computed in ``stats_dtype``
    (bf16) instead of flax's always-float32 — the documented-deviation
    numeric experiment of the round-3 lever sweep. Measured outcome
    (docs/RESULTS.md): the one-pass E[x²]-E[x]² prototype's +6%
    (scripts/perf_round3.py) was a strawman vs a substrate that normalized in
    f32, AND is numerically disqualified (bf16 cancellation zeroes the
    variance once |mean|/std >= ~16); this module ships the SAFE two-pass
    centered variance, whose extra activation pass measured NEGATIVE end to
    end (438.67 vs 474 p/s on the real step) — which is why ``float32``
    stays the default and this stays an option.

    Parameter/batch_stats tree (names, shapes, f32 storage) is IDENTICAL to
    ``nn.BatchNorm`` so checkpoints interchange freely; eval mode (running
    stats) is numerically identical to the flax path. Train-mode deviation is
    the reduction dtype only (TPU reduces accumulate in f32 internally; the
    rounding is on the 2^-8-relative order — characterized in
    tests/test_model.py and the lockstep drift run).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16        # normalization math dtype (flax `dtype`)
    stats_dtype: Dtype = jnp.bfloat16  # batch mean/var reduction dtype

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        feats = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feats,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feats,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feats,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feats,))
        d = self.dtype
        if use_running_average:
            mean = ra_mean.value.astype(d)
            var = ra_var.value.astype(d)
        else:
            xs = x.astype(self.stats_dtype)
            bmean = jnp.mean(xs, axis=(0, 1, 2))
            # TWO-PASS variance: the one-pass E[x^2]-E[x]^2 form is
            # catastrophic in bf16 (measured: returns exactly 0 once
            # |mean|/std >= ~16, i.e. 2^8 cancellation — rsqrt would then
            # explode); centering first keeps the relative error < 1e-2 at
            # every realistic activation statistic (see tests/test_model.py)
            diff = xs - bmean
            bvar = jnp.mean(jnp.square(diff), axis=(0, 1, 2))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (m * ra_mean.value
                                 + (1.0 - m) * bmean.astype(jnp.float32))
                ra_var.value = (m * ra_var.value
                                + (1.0 - m) * bvar.astype(jnp.float32))
            mean, var = bmean.astype(d), bvar.astype(d)
        mul = scale.astype(d) * jax.lax.rsqrt(var + jnp.asarray(self.epsilon, d))
        return (x.astype(d) - mean) * mul + bias.astype(d)


class GroupedBatchNorm(nn.Module):
    """Per-replica BatchNorm emulating torch ``DataParallel`` training
    semantics (the reference wraps its net in ``nn.DataParallel`` over
    ``len(local_rank)`` GPUs, train.py:132-134, so BN sees batch_size/replicas
    examples — SURVEY.md §7 risk 2, the one semantic deviation of the default
    global-batch BN):

    * the batch is split into ``groups`` equal CONTIGUOUS sub-batches (the
      dim-0 scatter DataParallel performs) and each sub-batch is normalized
      with its OWN biased batch statistics — the reference's actual training
      dynamics;
    * running statistics are updated from sub-batch 0 ONLY, with torch's
      UNBIASED variance: DataParallel replicas are destroyed after every
      forward and only the device[0] replica shares buffer storage with the
      base module, so only its updates persist (torch DataParallel docs;
      torch BatchNorm2d normalizes with the biased variance but accumulates
      the unbiased one).

    The parameter/batch_stats tree (names, shapes, float32 storage) is
    identical to ``nn.BatchNorm``, so checkpoints interchange freely with the
    global-BN path and eval mode (running stats) is numerically identical.
    Under a dp-sharded jit with ``groups == dp``, group boundaries coincide
    with the physical shards and XLA computes every group's statistics
    shard-locally — per-replica BN also removes the BN all-reduces.
    Pinned against a real 2-replica torch DataParallel-semantics oracle in
    tests/test_lockstep.py.
    """

    groups: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        feats = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feats,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feats,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feats,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feats,))
        d = self.dtype
        eps = jnp.asarray(self.epsilon, d)

        if use_running_average:
            mul = scale.astype(d) * jax.lax.rsqrt(ra_var.value.astype(d) + eps)
            return (x.astype(d) - ra_mean.value.astype(d)) * mul + bias.astype(d)

        n = x.shape[0]
        # during init the sample batch (size 1) need not divide into groups;
        # no stats are accumulated then, so a single group is equivalent
        g = 1 if self.is_initializing() else self.groups
        if n % g:
            raise ValueError(
                f"per-replica BatchNorm needs the batch size ({n}) divisible "
                f"by the replica count ({g}) — DataParallel scatters equal "
                "sub-batches (reference train.py:132-134)")
        xg = x.astype(jnp.float32).reshape((g, n // g) + x.shape[1:])
        gmean = jnp.mean(xg, axis=(1, 2, 3))                        # (G, C)
        gvar = jnp.mean(
            jnp.square(xg - gmean[:, None, None, None, :]), axis=(1, 2, 3))
        if not self.is_initializing():
            m = self.momentum
            count = (n // g) * x.shape[1] * x.shape[2]  # elements per channel
            unbias = count / max(count - 1, 1)          # torch running_var
            ra_mean.value = m * ra_mean.value + (1.0 - m) * gmean[0]
            ra_var.value = m * ra_var.value + (1.0 - m) * (gvar[0] * unbias)
        mul = (scale[None, :].astype(d)
               * jax.lax.rsqrt(gvar.astype(d) + eps))               # (G, C)
        xn = ((xg.astype(d) - gmean.astype(d)[:, None, None, None, :])
              * mul[:, None, None, None, :] + bias.astype(d))
        return xn.reshape(x.shape)


class _QuantConvParams(nn.Module):
    """int8 conv params under the same ``conv`` scope the folded CBR uses —
    the tree is produced offline by ops/quant.py::quantize_folded, never by
    ``.init`` (the zero/one initializers below only pin shapes/dtypes)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        shape = (3, 3, in_features, self.features)
        kq = self.param("kernel_q", nn.initializers.zeros, shape, jnp.int8)
        ks = self.param("kernel_scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        a = self.param("act_scale", nn.initializers.ones, (), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        return kq, ks, a, b


def _qat_fwd_math(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Dynamic W8A8 int8 conv: per-tensor activation absmax scale x
    per-output-channel kernel absmax scale, int8 x int8 -> int32 MXU
    accumulation, float32 dequant. Scales are recomputed on-device every
    step (weights move during training, unlike the static-scale serving
    trunk in ops/quant.py)."""
    xf = x.astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf * (1.0 / a)), -127.0, 127.0).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    ks = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)),
                     1e-8) * (1.0 / 127.0)
    kq = jnp.clip(jnp.round(kf * (1.0 / ks[None, None, None, :])),
                  -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, kq, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (a * ks)


@jax.custom_vjp
def int8_ste_conv(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """QAT trunk conv (``--train_quant int8``): int8 W8A8 forward, bf16
    straight-through backward.

    Forward runs :func:`_qat_fwd_math` (int8 MXU at 2x the bf16 rate, int8
    activation reads at 1/2 the bf16 bytes); backward treats the op as the
    FLOAT conv it approximates — dX and dW are the standard bilinear conv
    gradients evaluated in bf16 from the saved float residuals (the
    straight-through estimator; quantization's round/clip contribute zero
    gradient). An opt-in documented numerics deviation in the ``--bn_stats``
    mold: parameters stay the plain float ``conv/{kernel,bias}`` tree, so
    checkpoints interchange with every other path."""
    return _qat_fwd_math(x, kernel)


def _int8_ste_fwd(x, kernel):
    return _qat_fwd_math(x, kernel), (x, kernel)


def _int8_ste_bwd(res, g):
    x, kernel = res

    def conv_f(xb, kb):
        return jax.lax.conv_general_dilated(
            xb, kb, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # the unused primal output of this vjp is dead code XLA eliminates; only
    # the two backward convs (dX, dW) are materialized, both in bf16
    _, vjp = jax.vjp(conv_f, x.astype(jnp.bfloat16),
                     kernel.astype(jnp.bfloat16))
    dx, dk = vjp(g.astype(jnp.bfloat16))
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


int8_ste_conv.defvjp(_int8_ste_fwd, _int8_ste_bwd)


class CBR(nn.Module):
    """Conv3x3 -> BatchNorm -> ReLU (reference model.py:9-15).

    ``folded=True`` builds the BN-folded serving variant (Conv -> ReLU, BN
    affine pre-multiplied into the kernel/bias by ops/fold_bn.py).
    ``bn_stats='bfloat16'`` swaps in LowPrecStatsBN (same tree, bf16 batch
    statistics). ``bn_mode='per_replica'`` swaps in GroupedBatchNorm
    (``bn_groups`` emulated DataParallel replicas; same tree).

    ``calibrate=True`` (folded graph) additionally sows this block's input
    absmax into the ``quant_calib`` collection — the activation-scale
    calibration pass of the int8 serving path (ops/quant.py).
    ``quantize=True`` builds the W8A8 variant instead: static-scale int8
    activations x per-output-channel int8 weights on the MXU with int32
    accumulation, dequant + bias + ReLU fused into the epilogue — the
    measured-1.27x serving pipeline of scripts/proto_int8.py."""

    features: int
    dtype: Dtype = jnp.float32
    folded: bool = False
    bn_stats: str = "float32"
    bn_mode: str = "global"
    bn_groups: int = 1
    quantize: bool = False
    calibrate: bool = False
    train_quant: str = "none"  # 'int8': QAT forward (int8_ste_conv) in train

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.calibrate:
            self.sow("quant_calib", "in_absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     init_fn=lambda: jnp.zeros((), jnp.float32),
                     reduce_fn=jnp.maximum)
        if self.quantize:
            kq, ks, a, b = _QuantConvParams(self.features, name="conv")(
                x.shape[-1])
            # zero-point-free symmetric quantization: SAME-padding zeros are
            # exact in the quantized domain too
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / a)),
                          -127.0, 127.0).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kq, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (a * ks) + b
            return jnp.maximum(y, 0.0).astype(self.dtype)
        if self.train_quant == "int8":
            # QAT (--train_quant int8): same conv/{kernel,bias} float params
            # (checkpoints interchange), int8 forward in train mode only —
            # valid/eval forwards run the plain float conv so metrics report
            # the deployable graph
            kernel, cbias = _ConvParams(self.features, name="conv")(
                x.shape[-1])
            if train and not self.is_initializing():
                y = int8_ste_conv(x, kernel)
            else:
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
                    "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = (y + cbias).astype(self.dtype)
        else:
            fan_in = x.shape[-1] * 9
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                strides=(1, 1),
                padding=1,
                use_bias=True,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=conv_kernel_init,
                bias_init=torch_bias_init(fan_in),
                name="conv",
            )(x)
        if not self.folded:
            if self.bn_mode == "per_replica":
                x = GroupedBatchNorm(
                    groups=self.bn_groups,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name="bn",
                )(x, use_running_average=not train)
            elif self.bn_stats != "float32":
                x = LowPrecStatsBN(
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    stats_dtype=jnp.dtype(self.bn_stats),
                    name="bn",
                )(x, use_running_average=not train)
            else:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,    # torch BatchNorm2d momentum=0.1 <=> flax 0.9
                    epsilon=1e-5,    # torch default
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name="bn",
                )(x)
        return nn.relu(x)


class UpConv(nn.Module):
    """ConvTranspose(k=2, s=2, bias) upsampler (reference model.py:44-58).

    Negative result worth keeping (docs/RESULTS.md): reformulating this as an
    einsum + reshape (k == s makes it a pure per-pixel contraction) measured
    SLOWER end to end (449 vs 473 patches/s) — the reshape interleaving the
    upsampled rows fights XLA's tiled layouts and forces full-tensor copies
    that cost more than the conv-transpose backward's `reverse` ops save.
    Same for 2x2 max-pool via reshape+max (437 patches/s). XLA's native
    lowerings win; don't re-attempt without profiling evidence.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # torch computes the transposed conv's fan_in as out_ch * k * k (the
        # weight is (in, out, kh, kw) and _calculate_fan_in uses dim 1), so
        # both the kaiming-uniform kernel bound and the bias bound use it;
        # flax's fan_in would be in_ch * k * k, giving sqrt(in/out)-off scales
        fan_in = self.features * 4
        return nn.ConvTranspose(
            self.features,
            kernel_size=(2, 2),
            strides=(2, 2),
            padding="VALID",
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=_uniform_init(1.0 / fan_in ** 0.5),
            bias_init=torch_bias_init(fan_in),
            name="convt",
        )(x)


class Head(nn.Module):
    """1x1 conv head (reference model.py:62-66, 150-154)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        return nn.Conv(
            self.features,
            kernel_size=(1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=conv_kernel_init,
            bias_init=torch_bias_init(fan_in),
            name="conv",
        )(x)


class _ConvParams(nn.Module):
    """Declares conv params under the same scope/names/initializers as
    ``nn.Conv`` inside CBR, without running the conv — the fused kernel
    consumes the raw values. Identical scope path => identical init RNG =>
    bit-identical initialization to the classic trunk."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, in_features: int):
        k = self.kernel_size
        kernel = self.param("kernel", conv_kernel_init,
                            (k, k, in_features, self.features), jnp.float32)
        bias = self.param("bias", torch_bias_init(in_features * k * k),
                          (self.features,), jnp.float32)
        return kernel, bias


class _BNParams(nn.Module):
    """BatchNorm params + running stats with flax BatchNorm's exact names,
    shapes, inits and collections."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones_init(), (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class FusedCBR(nn.Module):
    """CBR with the conv/BN/ReLU pipeline RESTRUCTURED for fusion: emits the
    RAW conv output + this layer's BN affine so the next conv can apply
    normalize+relu as its Pallas prologue (ops/fused_cbr.py), eliminating the
    separate BN-statistics and normalize+relu HBM passes.

    Same parameter/batch_stats tree as ``CBR`` (checkpoints interchange
    untouched). ``use_pallas`` selects the Pallas kernel for shapes where it
    measured >= parity (ops.fused_cbr.eligible); everything else runs the
    same restructured dataflow with XLA ops (numerics equivalent to CBR).
    """

    features: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = True
    interpret: bool = False
    momentum: float = 0.9   # torch BatchNorm2d momentum=0.1 <=> flax 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, prologue=None,
                 materialize: bool = True):
        from ..ops.fused_cbr import (
            bn_affine,
            eligible,
            fused_conv_stats,
            moments_from_stats,
        )

        cin = x.shape[-1]
        kernel, cbias = _ConvParams(self.features, name="conv")(cin)
        scale, bbias, ra_mean, ra_var = _BNParams(name="bn")(self.features)

        N, H, W = x.shape[0], x.shape[1], x.shape[2]
        use_pallas = (
            self.use_pallas
            and eligible(H, W, cin, self.features, self.dtype)
            and not self.is_initializing()
        )
        need_stats = train

        if prologue is not None:
            a_in, b_in = prologue
        else:
            a_in = jnp.ones((cin,), jnp.float32)
            b_in = jnp.zeros((cin,), jnp.float32)

        if use_pallas:
            y, stats = fused_conv_stats(
                x.astype(self.dtype), a_in, b_in, kernel.astype(self.dtype),
                cbias, prologue is not None, self.interpret,
            )
        else:
            if prologue is not None:
                xn = jnp.maximum(x.astype(jnp.float32) * a_in + b_in, 0.0)
                xn = xn.astype(self.dtype)
            else:
                xn = x.astype(self.dtype)
            # native-dtype conv (a preferred_element_type=f32 here would make
            # the autodiff backward mix f32 cotangents with bf16 weights)
            y = jax.lax.conv_general_dilated(
                xn, kernel.astype(self.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32) + cbias
            y = y.astype(self.dtype)
            if need_stats:
                yf = y.astype(jnp.float32)
                stats = jnp.stack([jnp.sum(yf, (0, 1, 2)),
                                   jnp.sum(yf * yf, (0, 1, 2))])

        if need_stats:
            mean, var = moments_from_stats(stats, N * H * W)
            if not self.is_initializing():  # flax BatchNorm semantics
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        a, b = bn_affine(scale, bbias, mean, var, self.epsilon)
        if materialize:
            xn_out = jnp.maximum(y.astype(jnp.float32) * a + b, 0.0)
            return xn_out.astype(self.dtype), None
        return y, (a, b)


class _UNetTrunkFused(nn.Module):
    """The UNet trunk on the fused-CBR dataflow: within each CBR pair the
    first conv emits raw output + BN affine and the second applies
    normalize+relu as its (Pallas) prologue; activations materialize only at
    level boundaries (pool / skip-concat / heads). Identical parameter tree,
    layer names and math to ``_UNetTrunk``."""

    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.0
    use_pallas: bool = True
    interpret: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, mc_dropout: bool = False) -> jax.Array:
        d = self.dtype
        cbr = partial(FusedCBR, dtype=d, use_pallas=self.use_pallas,
                      interpret=self.interpret)

        def pair(n1: str, n2: str, feats: int, xin, train):
            y, ab = cbr(feats, name=n1)(xin, train, prologue=None,
                                        materialize=False)
            out, _ = cbr(feats, name=n2)(y, train, prologue=ab,
                                         materialize=True)
            return out

        enc1 = pair("enc1_1", "enc1_2", 64, x, train)
        p1 = nn.max_pool(enc1, (2, 2), strides=(2, 2))
        enc2 = pair("enc2_1", "enc2_2", 128, p1, train)
        p2 = nn.max_pool(enc2, (2, 2), strides=(2, 2))
        enc3 = pair("enc3_1", "enc3_2", 256, p2, train)
        p3 = nn.max_pool(enc3, (2, 2), strides=(2, 2))

        bottom = pair("dec4_2", "dec4_1", 512, p3, train)

        drop = self.dropout_rate
        use_drop = drop > 0.0 and (train or mc_dropout)
        if drop > 0.0:
            bottom = nn.Dropout(drop, deterministic=not use_drop, name="drop_bottom")(bottom)

        u3 = jnp.concatenate([UpConv(256, dtype=d, name="unpool3")(bottom), enc3], axis=-1)
        dec3 = pair("dec3_2", "dec3_1", 256, u3, train)
        if drop > 0.0:
            dec3 = nn.Dropout(drop, deterministic=not use_drop, name="drop3")(dec3)

        u2 = jnp.concatenate([UpConv(128, dtype=d, name="unpool2")(dec3), enc2], axis=-1)
        dec2 = pair("dec2_2", "dec2_1", 128, u2, train)

        u1 = jnp.concatenate([UpConv(64, dtype=d, name="unpool1")(dec2), enc1], axis=-1)
        dec1 = pair("dec1_2", "dec1_1", 64, u1, train)
        return dec1


class _UNetTrunk(nn.Module):
    """Shared encoder/decoder trunk of UNet and UNet_B (model.py:29-61)."""

    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.0
    folded: bool = False
    bn_stats: str = "float32"
    bn_mode: str = "global"
    bn_groups: int = 1
    quantize: bool = False
    calibrate: bool = False
    train_quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool, mc_dropout: bool = False) -> jax.Array:
        d = self.dtype
        cbr = partial(CBR, dtype=d, folded=self.folded, bn_stats=self.bn_stats,
                      bn_mode=self.bn_mode, bn_groups=self.bn_groups,
                      quantize=self.quantize, calibrate=self.calibrate,
                      train_quant=self.train_quant)

        enc1 = cbr(64, name="enc1_1")(x, train)
        enc1 = cbr(64, name="enc1_2")(enc1, train)
        p1 = nn.max_pool(enc1, (2, 2), strides=(2, 2))

        enc2 = cbr(128, name="enc2_1")(p1, train)
        enc2 = cbr(128, name="enc2_2")(enc2, train)
        p2 = nn.max_pool(enc2, (2, 2), strides=(2, 2))

        enc3 = cbr(256, name="enc3_1")(p2, train)
        enc3 = cbr(256, name="enc3_2")(enc3, train)
        p3 = nn.max_pool(enc3, (2, 2), strides=(2, 2))

        bottom = cbr(512, name="dec4_2")(p3, train)
        bottom = cbr(512, name="dec4_1")(bottom, train)

        drop = self.dropout_rate
        use_drop = drop > 0.0 and (train or mc_dropout)
        if drop > 0.0:
            bottom = nn.Dropout(drop, deterministic=not use_drop, name="drop_bottom")(bottom)

        u3 = jnp.concatenate([UpConv(256, dtype=d, name="unpool3")(bottom), enc3], axis=-1)
        dec3 = cbr(256, name="dec3_2")(u3, train)
        dec3 = cbr(256, name="dec3_1")(dec3, train)
        if drop > 0.0:
            dec3 = nn.Dropout(drop, deterministic=not use_drop, name="drop3")(dec3)

        u2 = jnp.concatenate([UpConv(128, dtype=d, name="unpool2")(dec3), enc2], axis=-1)
        dec2 = cbr(128, name="dec2_2")(u2, train)
        dec2 = cbr(128, name="dec2_1")(dec2, train)

        u1 = jnp.concatenate([UpConv(64, dtype=d, name="unpool1")(dec2), enc1], axis=-1)
        dec1 = cbr(64, name="dec1_2")(u1, train)
        dec1 = cbr(64, name="dec1_1")(dec1, train)
        return dec1


class UNetB(nn.Module):
    """Binary-head U-Net for BCE-with-logits training (reference model.py:18-103).

    __call__(x NHWC, train) ->
        non-selective: (N, H, W) float32 logits
        selective:     tuple (output, select, aux), each (N, H, W) float32
    """

    selective: bool = False
    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.0
    folded: bool = False
    fused: bool = False          # fused-CBR dataflow (Pallas on TPU)
    fused_interpret: bool = False  # run the Pallas kernels interpreted (tests)
    bn_stats: str = "float32"    # batch-statistics dtype (LowPrecStatsBN)
    bn_mode: str = "global"      # 'global' | 'per_replica' (GroupedBatchNorm)
    bn_groups: int = 1           # emulated DataParallel replica count
    quantize: bool = False       # W8A8 int8 trunk (serving; ops/quant.py)
    calibrate: bool = False      # sow per-CBR input absmax (quant calibration)
    train_quant: str = "none"    # 'int8': QAT train-mode trunk (int8_ste_conv)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, mc_dropout: bool = False):
        if self.fused:
            feat = _UNetTrunkFused(dtype=self.dtype,
                                   dropout_rate=self.dropout_rate,
                                   interpret=self.fused_interpret,
                                   name="trunk")(x, train, mc_dropout)
        else:
            feat = _UNetTrunk(dtype=self.dtype, dropout_rate=self.dropout_rate,
                              folded=self.folded, bn_stats=self.bn_stats,
                              bn_mode=self.bn_mode, bn_groups=self.bn_groups,
                              quantize=self.quantize, calibrate=self.calibrate,
                              train_quant=self.train_quant,
                              name="trunk")(x, train, mc_dropout)
        out = Head(1, dtype=self.dtype, name="conv1x1")(feat)
        out = jnp.squeeze(out, -1).astype(jnp.float32)
        if not self.selective:
            return out
        select = jnp.squeeze(Head(1, dtype=self.dtype, name="conv_select")(feat), -1)
        aux = jnp.squeeze(Head(1, dtype=self.dtype, name="conv_aux")(feat), -1)
        return out, select.astype(jnp.float32), aux.astype(jnp.float32)


class UNet(nn.Module):
    """n_cls-head U-Net for CE training (reference model.py:106-191).

    __call__(x NHWC, train) ->
        non-selective: (N, H, W, n_cls) float32 logits
        selective:     (output (N,H,W,n_cls), select (N,H,W,2), aux (N,H,W,n_cls))
    """

    n_cls: int = 2
    selective: bool = False
    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.0
    folded: bool = False
    fused: bool = False
    fused_interpret: bool = False
    bn_stats: str = "float32"
    bn_mode: str = "global"
    bn_groups: int = 1
    quantize: bool = False
    calibrate: bool = False
    train_quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, mc_dropout: bool = False):
        if self.fused:
            feat = _UNetTrunkFused(dtype=self.dtype,
                                   dropout_rate=self.dropout_rate,
                                   interpret=self.fused_interpret,
                                   name="trunk")(x, train, mc_dropout)
        else:
            feat = _UNetTrunk(dtype=self.dtype, dropout_rate=self.dropout_rate,
                              folded=self.folded, bn_stats=self.bn_stats,
                              bn_mode=self.bn_mode, bn_groups=self.bn_groups,
                              quantize=self.quantize, calibrate=self.calibrate,
                              train_quant=self.train_quant,
                              name="trunk")(x, train, mc_dropout)
        out = Head(self.n_cls, dtype=self.dtype, name="conv1x1")(feat).astype(jnp.float32)
        if not self.selective:
            return out
        select = Head(2, dtype=self.dtype, name="conv_select")(feat).astype(jnp.float32)
        aux = Head(self.n_cls, dtype=self.dtype, name="conv_aux")(feat).astype(jnp.float32)
        return out, select, aux


def build_model(
    model_arch: str,
    n_cls: int = 2,
    selective: bool = False,
    compute_dtype: str = "float32",
    dropout_rate: float = 0.0,
    folded: bool = False,
    fused: bool = False,
    fused_interpret: bool = False,
    bn_stats: str = "float32",
    bn_mode: str = "global",
    bn_groups: int = 1,
    quantize: str = "none",
    quant_calibrate: bool = False,
    train_quant: str = "none",
) -> nn.Module:
    """Factory matching the reference's arch selection (train.py:71-74).

    ``folded=True`` builds the BN-folded serving variant consuming params
    produced by ops.fold_bn.fold_batchnorm. ``fused=True`` selects the
    fused-CBR trunk (Pallas kernels on TPU; identical parameter tree);
    ``fused_interpret`` runs those kernels interpreted (CPU tests).
    ``bn_stats`` selects the batch-statistics reduction dtype (LowPrecStatsBN;
    'float32' keeps flax nn.BatchNorm exactly). ``bn_mode='per_replica'``
    swaps in GroupedBatchNorm over ``bn_groups`` emulated DataParallel
    replicas (the reference's faithful BN semantics, train.py:132-134).

    ``quantize='int8'`` builds the W8A8 serving trunk consuming params from
    ops.quant.quantize_folded (requires ``folded=True``);
    ``quant_calibrate=True`` builds the folded float graph that sows each
    CBR input's absmax into the ``quant_calib`` collection (the calibration
    pass those params are derived from).

    ``train_quant='int8'`` (QAT, ``--train_quant int8``): trunk convs run the
    dynamic-scale int8 W8A8 forward in TRAIN mode with a bf16
    straight-through backward (int8_ste_conv); params stay the plain float
    tree, valid/eval forwards run the float conv."""
    dtype = jnp.dtype(compute_dtype)
    if folded and fused:
        raise ValueError("folded serving graph and fused training trunk are exclusive")
    if quantize not in ("none", "int8"):
        raise ValueError(f"unknown quantize {quantize!r} "
                         "(expected 'none' or 'int8')")
    if quantize == "int8" or quant_calibrate:
        # the int8 trunk and its calibration pass exist only on the BN-folded
        # serving graph — refuse combinations that would silently run
        # something other than what the flags claim (same policy as the
        # bn_stats/fused guards below)
        if not folded:
            raise ValueError("quantize/quant_calibrate require the BN-folded "
                             "serving graph (folded=True, ops/fold_bn.py)")
        if dropout_rate > 0:
            raise ValueError("quantize/quant_calibrate and dropout_rate > 0 "
                             "are exclusive (MC-dropout uncertainty runs the "
                             "bf16 folded graph)")
    if quantize == "int8" and quant_calibrate:
        raise ValueError("quantize='int8' and quant_calibrate are exclusive "
                         "(calibration runs the float folded graph)")
    if fused and bn_stats != "float32":
        # the fused trunk has no LowPrecStatsBN path; silently training
        # f32-stats while the flag says bfloat16 would corrupt experiment
        # conclusions, so refuse the combination outright
        raise ValueError("bn_stats is not implemented by the fused trunk; "
                         "use bn_stats='float32' or fused=False")
    if train_quant not in ("none", "int8"):
        raise ValueError(f"unknown train_quant {train_quant!r} "
                         "(expected 'none' or 'int8')")
    if train_quant == "int8":
        # same silent-no-op policy as the other numeric-variant guards:
        # refuse combinations that would run something else than claimed
        if folded or quantize == "int8" or quant_calibrate:
            raise ValueError("train_quant='int8' is a TRAINING-trunk variant; "
                             "it is exclusive with the folded/serving graphs "
                             "(folded/quantize/quant_calibrate)")
        if fused:
            raise ValueError("train_quant='int8' is not implemented by the "
                             "fused trunk; use the default trunk (fused=False)")
    if bn_mode not in ("global", "per_replica"):
        raise ValueError(f"unknown bn_mode {bn_mode!r} "
                         "(expected 'global' or 'per_replica')")
    if bn_mode == "per_replica":
        # same silent-no-op guard as above: refuse combinations that would
        # train something other than what the flags claim
        if fused:
            raise ValueError("bn_mode='per_replica' is not implemented by the "
                             "fused trunk; use the default trunk (fused=False)")
        if bn_stats != "float32":
            raise ValueError("bn_mode='per_replica' and bn_stats != 'float32' "
                             "are exclusive (GroupedBatchNorm reduces in f32)")
        if bn_groups < 1:
            raise ValueError(f"bn_groups must be >= 1, got {bn_groups}")
    if model_arch == "UNet_B":
        return UNetB(selective=selective, dtype=dtype, dropout_rate=dropout_rate,
                     folded=folded, fused=fused, fused_interpret=fused_interpret,
                     bn_stats=bn_stats, bn_mode=bn_mode, bn_groups=bn_groups,
                     quantize=quantize == "int8", calibrate=quant_calibrate,
                     train_quant=train_quant)
    if model_arch == "UNet":
        return UNet(n_cls=n_cls, selective=selective, dtype=dtype,
                    dropout_rate=dropout_rate, folded=folded, fused=fused,
                    fused_interpret=fused_interpret, bn_stats=bn_stats,
                    bn_mode=bn_mode, bn_groups=bn_groups,
                    quantize=quantize == "int8", calibrate=quant_calibrate,
                    train_quant=train_quant)
    raise ValueError(f"unknown model_arch {model_arch!r} (expected 'UNet' or 'UNet_B')")


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
