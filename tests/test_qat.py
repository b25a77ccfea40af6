"""QAT int8 training (--train_quant int8): the reduced-precision TRAINING
variant (models/unet.py int8_ste_conv).

The reference has no quantized-training analog — this is the opt-in
non-parity throughput lever of the round-5 plan (the one lever class with no
recorded number before it, docs/ROADMAP.md). Contract pinned here:

* parameter tree, names AND init values identical to the plain trunk —
  checkpoints interchange with every other path;
* eval/valid forwards (train=False) are exactly the float graph;
* train-mode forward is the dynamic-scale int8 conv: close to the float
  forward (quantization noise), not equal;
* gradients are straight-through: finite, nonzero, and directionally
  aligned with the float model's gradients;
* full train() drives it end to end (mesh, BN, checkpointing, resume);
* build_model refuses incoherent combinations (folded/fused/serving-int8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.models.unet import (
    int8_ste_conv,
)


@pytest.fixture(scope="module")
def models():
    m_q = build_model("UNet_B", selective=True, compute_dtype="float32",
                      train_quant="int8")
    m_f = build_model("UNet_B", selective=True, compute_dtype="float32")
    variables = m_f.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                         train=False)
    return m_q, m_f, variables


class TestSTEConv:
    def test_forward_tracks_float_conv(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * 0.1, jnp.float32)
        y_q = int8_ste_conv(x, k)
        y_f = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # 8-bit symmetric quantization of both operands: relative error on
        # the order of 1/127 per operand
        err = float(jnp.max(jnp.abs(y_q - y_f)))
        scale = float(jnp.max(jnp.abs(y_f)))
        assert err <= 0.05 * max(scale, 1.0), (err, scale)
        assert err > 0.0  # it IS quantized, not silently float

    def test_gradients_are_float_conv_gradients(self, rng):
        """STE backward == the float conv's gradients (evaluated in bf16)."""
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * 0.1, jnp.float32)

        def f_q(x, k):
            return jnp.sum(int8_ste_conv(x, k) ** 2) * 0.0 + jnp.sum(
                int8_ste_conv(x, k))

        def f_f(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y)

        gq_x, gq_k = jax.grad(f_q, argnums=(0, 1))(x, k)
        gf_x, gf_k = jax.grad(f_f, argnums=(0, 1))(x, k)
        # sum-cotangent of ones: STE grads equal float grads up to bf16
        np.testing.assert_allclose(gq_x, gf_x, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(gq_k, gf_k, rtol=2e-2, atol=1e-1)


class TestQATModel:
    def test_param_tree_and_init_identical(self, models):
        m_q, m_f, variables = models
        v_q = m_q.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                       train=False)
        flat_f = jax.tree_util.tree_leaves_with_path(variables)
        flat_q = jax.tree_util.tree_leaves_with_path(v_q)
        assert [p for p, _ in flat_f] == [p for p, _ in flat_q]
        for (p, a), (_, b) in zip(flat_f, flat_q):
            np.testing.assert_array_equal(a, b, err_msg=str(p))

    def test_eval_forward_is_exactly_float(self, models, rng):
        m_q, m_f, variables = models
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
        out_q = m_q.apply(variables, x, train=False)
        out_f = m_f.apply(variables, x, train=False)
        for a, b in zip(out_q, out_f):
            np.testing.assert_array_equal(a, b)

    def test_train_forward_quantized_but_close(self, models, rng):
        m_q, m_f, variables = models
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
        (f_q, *_), _ = m_q.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
        (f_f, *_), _ = m_f.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
        d = float(jnp.max(jnp.abs(f_q - f_f)))
        assert 0.0 < d < 1.0, d  # quantization noise, not divergence

    def test_gradients_aligned_with_float_model(self, models, rng):
        m_q, m_f, variables = models
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
        y = jnp.asarray(rng.random((2, 16, 16)) > 0.5, jnp.float32)

        def loss(m):
            def inner(params):
                (f, g, h), _ = m.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                import optax
                return jnp.mean(optax.sigmoid_binary_cross_entropy(f, y))
            return inner

        g_q = jax.grad(loss(m_q))(variables["params"])
        g_f = jax.grad(loss(m_f))(variables["params"])
        dot = sum(float(jnp.vdot(a, b)) for a, b in zip(
            jax.tree_util.tree_leaves(g_q), jax.tree_util.tree_leaves(g_f)))
        nq = sum(float(jnp.vdot(a, a)) for a in jax.tree_util.tree_leaves(g_q))
        nf = sum(float(jnp.vdot(a, a)) for a in jax.tree_util.tree_leaves(g_f))
        cos = dot / (nq ** 0.5 * nf ** 0.5)
        # the quantized forward perturbs every BN statistic downstream, so
        # grads can't match exactly — but they must point the float way
        # (measured ~0.92 at random init on the full 23-conv trunk)
        assert cos > 0.8, cos

    def test_build_model_guards(self):
        with pytest.raises(ValueError, match="train_quant"):
            build_model("UNet_B", train_quant="fp8")
        with pytest.raises(ValueError, match="exclusive"):
            build_model("UNet_B", folded=True, train_quant="int8")
        with pytest.raises(ValueError, match="fused"):
            build_model("UNet_B", fused=True, train_quant="int8")
        with pytest.raises(ValueError):
            build_model("UNet_B", folded=True, quantize="int8",
                        train_quant="int8")


class TestQATTrain:
    def test_train_end_to_end_and_ckpt_interchange(self, tmp_path):
        """train() with --train_quant int8 on the virtual mesh: finite
        losses, learning signal, and the checkpoint loads into the plain
        float model (tree interchange)."""
        from selectivenet_for_semantic_segmentation_binary_tpu.config import (
            TrainConfig,
        )
        from selectivenet_for_semantic_segmentation_binary_tpu.data import (
            write_synthetic_patch_tree,
        )
        from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
            train,
        )
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
            load_net_checkpoint,
        )

        d = tmp_path / "data"
        write_synthetic_patch_tree(str(d), n_slides=2, patches_per_slide=15,
                                   patch_size=32)
        cfg = TrainConfig(
            data_dir=str(d), model_dir=str(tmp_path / "model"), fold=1,
            patch_size=32, batch_size=8, n_epoch=3, model_arch="UNet_B",
            loss="BCElogit", selective=True, s_lamb=2.0,
            compute_dtype="float32", num_workers=2, local_rank=[0, 1],
            train_quant="int8",
        )
        result = train(cfg, verbose=False)
        assert np.isfinite(result["train"].loss)
        assert np.isfinite(result["valid"].loss)
        assert result["train"].acc > 0.6  # separable synthetic: learns

        ckpt = str(tmp_path / "model" / "1-fold" / "checkpoint" /
                   "model_epoch3.ckpt")
        variables = load_net_checkpoint(ckpt)
        m_f = build_model("UNet_B", selective=True, compute_dtype="float32")
        out = m_f.apply({"params": variables["params"],
                         "batch_stats": variables["batch_stats"]},
                        jnp.zeros((1, 32, 32, 3)), train=False)
        assert out[0].shape == (1, 32, 32)
