"""Model architecture tests: shapes, head counts, parameter parity, op parity.

Parameter counts are checked against the layer dimensions of reference
model.py:19-66 (hand-computable); conv / transposed-conv / pool semantics are
checked numerically against torch's functional ops (torch-cpu is the oracle,
never a code source).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.models import (
    UNet,
    UNetB,
    build_model,
    count_params,
)


def _conv_params(cin, cout, k=3):
    return cin * cout * k * k + cout


def _bn_params(c):
    return 2 * c  # scale + bias (learnable); running stats live in batch_stats


def _cbr(cin, cout):
    return _conv_params(cin, cout, 3) + _bn_params(cout)


def expected_trunk_params(input_ch):
    """Layer schedule of reference model.py:29-61."""
    total = 0
    total += _cbr(input_ch, 64) + _cbr(64, 64)        # enc1
    total += _cbr(64, 128) + _cbr(128, 128)           # enc2
    total += _cbr(128, 256) + _cbr(256, 256)          # enc3
    total += _cbr(256, 512) + _cbr(512, 512)          # bottleneck
    total += 512 * 256 * 4 + 256                      # unpool3 convT k2
    total += _cbr(512, 256) + _cbr(256, 256)          # dec3
    total += 256 * 128 * 4 + 128                      # unpool2
    total += _cbr(256, 128) + _cbr(128, 128)          # dec2
    total += 128 * 64 * 4 + 64                        # unpool1
    total += _cbr(128, 64) + _cbr(64, 64)             # dec1
    return total


def init_model(model, input_ch=3, size=32):
    x = jnp.zeros((1, size, size, input_ch), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x, train=False)


class TestUNetB:
    def test_forward_shape_plain(self):
        model = UNetB(selective=False)
        variables = init_model(model)
        x = jnp.ones((2, 32, 32, 3))
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 32, 32)

    def test_forward_shape_selective(self):
        model = UNetB(selective=True)
        variables = init_model(model)
        x = jnp.ones((2, 32, 32, 3))
        out, select, aux = model.apply(variables, x, train=False)
        assert out.shape == select.shape == aux.shape == (2, 32, 32)

    def test_param_count_plain_rgb(self):
        model = UNetB(selective=False)
        variables = init_model(model, input_ch=3)
        expected = expected_trunk_params(3) + (64 * 1 + 1)  # + conv1x1 head
        assert count_params(variables["params"]) == expected

    def test_param_count_selective_rgb(self):
        model = UNetB(selective=True)
        variables = init_model(model, input_ch=3)
        expected = expected_trunk_params(3) + 3 * (64 * 1 + 1)  # f, g, h heads
        assert count_params(variables["params"]) == expected
        # ~7.70 M params per SURVEY.md §2.1
        assert 7.6e6 < count_params(variables["params"]) < 7.8e6

    def test_gh_input_two_channels(self):
        model = UNetB(selective=False)
        variables = init_model(model, input_ch=2)
        x = jnp.ones((1, 32, 32, 2))
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 32, 32)

    def test_arbitrary_size_inference(self):
        """Reference u-net_testing.ipynb cells 64-74: the FCN accepts larger inputs."""
        model = UNetB(selective=False)
        variables = init_model(model, size=32)
        x = jnp.ones((1, 64, 64, 3))
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 64, 64)

    def test_train_mode_updates_batch_stats(self):
        model = UNetB(selective=False)
        variables = init_model(model)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
        before = variables["batch_stats"]["trunk"]["enc1_1"]["bn"]["mean"]
        after = mutated["batch_stats"]["trunk"]["enc1_1"]["bn"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestUNet:
    def test_forward_shapes(self):
        model = UNet(n_cls=2, selective=True)
        variables = init_model(model)
        x = jnp.ones((2, 32, 32, 3))
        out, select, aux = model.apply(variables, x, train=False)
        assert out.shape == (2, 32, 32, 2)
        assert select.shape == (2, 32, 32, 2)
        assert aux.shape == (2, 32, 32, 2)

    def test_param_count(self):
        model = UNet(n_cls=2, selective=True)
        variables = init_model(model)
        expected = expected_trunk_params(3) + (64 * 2 + 2) * 2 + (64 * 2 + 2)
        assert count_params(variables["params"]) == expected


class TestBuildModel:
    def test_factory(self):
        assert isinstance(build_model("UNet_B"), UNetB)
        assert isinstance(build_model("UNet", n_cls=3), UNet)
        with pytest.raises(ValueError):
            build_model("ResNet")

    def test_incompatible_trunk_combinations_raise(self):
        with pytest.raises(ValueError, match="exclusive"):
            build_model("UNet_B", folded=True, fused=True)
        # the fused trunk has no LowPrecStatsBN path — silently training
        # f32 stats under a bfloat16 flag would corrupt experiment results
        with pytest.raises(ValueError, match="bn_stats"):
            build_model("UNet_B", fused=True, bn_stats="bfloat16")

    def test_bfloat16_compute_keeps_fp32_output(self):
        model = build_model("UNet_B", compute_dtype="bfloat16")
        variables = init_model(model)
        out = model.apply(variables, jnp.ones((1, 32, 32, 3)), train=False)
        assert out.dtype == jnp.float32


class TestTorchOpParity:
    """Numerical parity of the building-block ops against torch (the oracle)."""

    def test_conv3x3_same_padding(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
        w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)  # HWIO
        b = rng.standard_normal((6,)).astype(np.float32)

        y_jax = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
        yt = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), padding=1)
        np.testing.assert_allclose(
            np.asarray(y_jax), yt.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
        )

    def test_conv_transpose_k2s2(self, rng):
        """flax ConvTranspose(k2, s2, VALID) must equal torch ConvTranspose2d(k2, s2)."""
        torch = pytest.importorskip("torch")
        from flax import linen as nn

        x = rng.standard_normal((1, 4, 4, 8)).astype(np.float32)
        layer = nn.ConvTranspose(4, kernel_size=(2, 2), strides=(2, 2), padding="VALID")
        variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y_jax = layer.apply(variables, jnp.asarray(x))
        assert y_jax.shape == (1, 8, 8, 4)

        w = np.asarray(variables["params"]["kernel"])  # (kh, kw, in, out)
        b = np.asarray(variables["params"]["bias"])
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        # flax's ConvTranspose kernel equals torch's ConvTranspose2d weight
        # (in, out, kh, kw) with the spatial taps flipped (verified empirically;
        # utils/checkpoint.py relies on this mapping when importing .pth files).
        wt = torch.from_numpy(w[::-1, ::-1].transpose(2, 3, 0, 1).copy())
        yt = torch.nn.functional.conv_transpose2d(xt, wt, torch.from_numpy(b), stride=2)
        np.testing.assert_allclose(
            np.asarray(y_jax), yt.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
        )

    def test_max_pool(self, rng):
        torch = pytest.importorskip("torch")
        from flax import linen as nn

        x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
        y_jax = nn.max_pool(jnp.asarray(x), (2, 2), strides=(2, 2))
        yt = torch.nn.functional.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2)
        np.testing.assert_allclose(np.asarray(y_jax), yt.numpy().transpose(0, 2, 3, 1))

    def test_batchnorm_train_and_eval(self, rng):
        torch = pytest.importorskip("torch")
        from flax import linen as nn

        x = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
        bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y_jax, mutated = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])

        bnt = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
        bnt.train()
        yt = bnt(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(y_jax), yt.detach().numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            bnt.running_mean.numpy(), rtol=1e-4, atol=1e-5,
        )


class TestLowPrecStatsBN:
    """bn_stats='bfloat16' (models.unet.LowPrecStatsBN): identical tree and
    eval path to nn.BatchNorm, bounded train-mode deviation, and the two-pass
    variance regression (one-pass E[x^2]-E[x]^2 in bf16 returns exactly 0
    once |mean|/std >= ~16 — a silent training disaster)."""

    def _models(self):
        m32 = build_model("UNet_B", selective=True, compute_dtype="bfloat16")
        mbf = build_model("UNet_B", selective=True, compute_dtype="bfloat16",
                          bn_stats="bfloat16")
        return m32, mbf

    def test_init_tree_and_values_identical(self):
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        m32, mbf = self._models()
        v32 = m32.init(jax.random.PRNGKey(3), x, train=False)
        vbf = mbf.init(jax.random.PRNGKey(3), x, train=False)
        assert (jax.tree_util.tree_structure(v32)
                == jax.tree_util.tree_structure(vbf))
        for a, b in zip(jax.tree_util.tree_leaves(v32),
                        jax.tree_util.tree_leaves(vbf)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_eval_mode_bit_identical(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
        m32, mbf = self._models()
        v = m32.init(jax.random.PRNGKey(3), x, train=False)
        for a, b in zip(m32.apply(v, x, train=False),
                        mbf.apply(v, x, train=False)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_mode_deviation_bounded(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3), jnp.float32)
        m32, mbf = self._models()
        v = m32.init(jax.random.PRNGKey(3), x, train=False)
        o32, mut32 = m32.apply(v, x, train=True, mutable=["batch_stats"])
        obf, mutbf = mbf.apply(v, x, train=True, mutable=["batch_stats"])
        for a, b in zip(o32, obf):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32), atol=0.1)
        for a, b in zip(jax.tree_util.tree_leaves(mut32["batch_stats"]),
                        jax.tree_util.tree_leaves(mutbf["batch_stats"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)

    def test_two_pass_variance_survives_large_mean(self):
        from selectivenet_for_semantic_segmentation_binary_tpu.models.unet import (
            LowPrecStatsBN,
        )

        rng = np.random.default_rng(0)
        # |mean|/std = 30: one-pass bf16 variance collapses to 0 here
        x = jnp.asarray(rng.standard_normal((4, 16, 16, 8)) * 1.0 + 30.0,
                        jnp.float32)
        bn = LowPrecStatsBN(dtype=jnp.bfloat16, stats_dtype=jnp.bfloat16)
        v = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
        y, mut = bn.apply(v, x, use_running_average=False,
                          mutable=["batch_stats"])
        # updated running var = 0.9*1 + 0.1*batch_var; batch_var must be ~1.0
        batch_var = (np.asarray(mut["batch_stats"]["var"]) - 0.9) / 0.1
        # +-10% here is bf16 INPUT quantization (ulp=0.125 at magnitude 30,
        # shared with the f32-stats path whose input is the same bf16 conv
        # output), not reduction error; one-pass returned exactly 0.0
        np.testing.assert_allclose(batch_var, 1.0, rtol=0.15)
        # and the normalized output must be ~N(0,1), not exploded by rsqrt(0)
        assert float(jnp.max(jnp.abs(y.astype(jnp.float32)))) < 10.0


class TestGroupedBatchNorm:
    """bn_mode='per_replica' (models.unet.GroupedBatchNorm): torch
    DataParallel BN emulation — per-sub-batch statistics, running stats from
    sub-batch 0 only with torch's unbiased variance (reference
    train.py:132-134). Tree-identical to nn.BatchNorm; the full train-loop
    composition is pinned against a real 2-replica DataParallel-semantics
    torch oracle in test_lockstep.py."""

    def test_grouped_normalization_and_running_update(self):
        from selectivenet_for_semantic_segmentation_binary_tpu.models.unet import (
            GroupedBatchNorm,
        )

        rng = np.random.default_rng(0)
        x = rng.standard_normal((4, 6, 6, 3)).astype(np.float32) * 2 + 1.5
        m = GroupedBatchNorm(groups=2, dtype=jnp.float32)
        v0 = m.init(jax.random.PRNGKey(0), jnp.asarray(x),
                    use_running_average=True)
        y, mut = m.apply(v0, jnp.asarray(x), use_running_average=False,
                         mutable=["batch_stats"])
        y = np.asarray(y)

        ref = np.empty_like(x)
        for g in range(2):
            sub = x[g * 2:(g + 1) * 2]
            mu, var = sub.mean((0, 1, 2)), sub.var((0, 1, 2))
            ref[g * 2:(g + 1) * 2] = (sub - mu) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(y, ref, atol=1e-5)

        # running stats: group 0 only, torch's unbiased variance
        sub0 = x[:2]
        count = 2 * 6 * 6
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]),
            0.1 * sub0.mean((0, 1, 2)), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["var"]),
            0.9 + 0.1 * sub0.var((0, 1, 2)) * count / (count - 1), atol=1e-6)

    def test_groups_must_divide_batch(self):
        from selectivenet_for_semantic_segmentation_binary_tpu.models.unet import (
            GroupedBatchNorm,
        )

        m = GroupedBatchNorm(groups=3, dtype=jnp.float32)
        x = jnp.zeros((4, 4, 4, 2), jnp.float32)
        v0 = m.init(jax.random.PRNGKey(0), x, use_running_average=True)
        with pytest.raises(ValueError, match="divisible"):
            m.apply(v0, x, use_running_average=False, mutable=["batch_stats"])

    def test_tree_identical_and_single_group_matches_global(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3), jnp.float32)
        mg = build_model("UNet_B", selective=True, compute_dtype="float32")
        mp = build_model("UNet_B", selective=True, compute_dtype="float32",
                         bn_mode="per_replica", bn_groups=1)
        vg = mg.init(jax.random.PRNGKey(3), x, train=False)
        vp = mp.init(jax.random.PRNGKey(3), x, train=False)
        assert (jax.tree_util.tree_structure(vg)
                == jax.tree_util.tree_structure(vp))
        # train-mode forward with ONE group == global-batch BN (the modes
        # only diverge through the sub-batch split)
        og, _ = mg.apply(vg, x, train=True, mutable=["batch_stats"])
        op, _ = mp.apply(vp, x, train=True, mutable=["batch_stats"])
        for a, b in zip(og, op):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_eval_mode_matches_global(self):
        """Eval uses running stats: a per_replica-trained checkpoint serves
        identically through the default global-BN model."""
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32)
        mp = build_model("UNet_B", selective=True, compute_dtype="float32",
                         bn_mode="per_replica", bn_groups=2)
        v = mp.init(jax.random.PRNGKey(3), x, train=False)
        _, mut = mp.apply(v, x, train=True, mutable=["batch_stats"])
        v2 = {"params": v["params"], "batch_stats": mut["batch_stats"]}
        mg = build_model("UNet_B", selective=True, compute_dtype="float32")
        for a, b in zip(mp.apply(v2, x, train=False),
                        mg.apply(v2, x, train=False)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

    def test_invalid_combinations_rejected(self):
        with pytest.raises(ValueError, match="per_replica"):
            build_model("UNet_B", bn_mode="per_replica", fused=True)
        with pytest.raises(ValueError, match="per_replica"):
            build_model("UNet_B", bn_mode="per_replica", bn_stats="bfloat16")
        with pytest.raises(ValueError, match="bn_groups"):
            build_model("UNet_B", bn_mode="per_replica", bn_groups=0)
        with pytest.raises(ValueError, match="bn_mode"):
            build_model("UNet_B", bn_mode="sync")
