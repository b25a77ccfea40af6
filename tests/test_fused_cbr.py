"""Fused-CBR kernel + fused trunk parity tests (ops/fused_cbr.py,
models/unet.py::_UNetTrunkFused).

All Pallas kernels run in interpret mode on the CPU mesh; numerics are pinned
against the unfused XLA chain and the classic trunk. The fused trunk must be
a drop-in: identical parameter/batch_stats tree, identical init values
(same scope paths => same param RNGs), equivalent forward/grads/stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.ops.fused_cbr import (
    bn_affine,
    eligible,
    fused_conv_stats,
    moments_from_stats,
)


def _xla_chain(x, a, b, w, bias, apply_prologue=True):
    if apply_prologue:
        xn = jnp.maximum(x.astype(jnp.float32) * a + b, 0.0).astype(x.dtype)
    else:
        xn = x
    y = jax.lax.conv_general_dilated(
        xn, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias
    y = y.astype(x.dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.stack([jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))])


@pytest.fixture
def op_inputs(rng):
    N, H, W, Cin, Cout = 2, 8, 8, 128, 128
    x = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.float32)
    a = jnp.asarray(rng.standard_normal(Cin) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Cin) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(Cout) * 0.1, jnp.float32)
    return x, a, b, w, bias


class TestFusedConvStats:
    def test_forward_matches_xla_chain(self, op_inputs):
        x, a, b, w, bias = op_inputs
        y_ref, s_ref = _xla_chain(x, a, b, w, bias)
        y, s = fused_conv_stats(x, a, b, w, bias, True, True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                                   rtol=1e-4, atol=1e-3)

    def test_forward_no_prologue(self, op_inputs):
        x, a, b, w, bias = op_inputs
        y_ref, s_ref = _xla_chain(x, a, b, w, bias, apply_prologue=False)
        y, s = fused_conv_stats(x, a, b, w, bias, False, True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_halo_rows_match(self, rng):
        """Row-blocked (Element-indexed) path: H big enough that rows < H."""
        N, H, W, Cin, Cout = 1, 16, 8, 128, 128
        x = jnp.asarray(rng.standard_normal((N, H, W, Cin)), jnp.float32)
        a = jnp.ones((Cin,), jnp.float32)
        b = jnp.full((Cin,), 0.2, jnp.float32)  # nonzero: halo must stay 0
        w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05, jnp.float32)
        bias = jnp.zeros((Cout,), jnp.float32)
        y_ref, _ = _xla_chain(x, a, b, w, bias)
        y, _ = fused_conv_stats(x, a, b, w, bias, True, True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_xla_chain(self, op_inputs):
        """Full VJP parity incl. the stats cotangent path."""
        x, a, b, w, bias = op_inputs

        def loss_fused(x, a, b, w, bias):
            y, s = fused_conv_stats(x, a, b, w, bias, True, True)
            mean, var = moments_from_stats(s, y.size)
            return jnp.sum(y * y) * 1e-3 + jnp.sum(mean) + jnp.sum(var)

        def loss_ref(x, a, b, w, bias):
            y, s = _xla_chain(x, a, b, w, bias)
            mean, var = moments_from_stats(s, y.size)
            return jnp.sum(y * y) * 1e-3 + jnp.sum(mean) + jnp.sum(var)

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, a, b, w, bias)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, a, b, w, bias)
        for gf, gr, name in zip(g_f, g_r, "xabwB"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4,
                err_msg=f"grad mismatch for {name}")

    def test_eligibility_gate(self):
        assert eligible(32, 32, 512, 512, jnp.bfloat16)
        assert eligible(128, 128, 128, 128, jnp.bfloat16)
        assert not eligible(256, 256, 64, 64, jnp.bfloat16)    # level-1: loses
        assert not eligible(128, 128, 64, 128, jnp.bfloat16)   # K=64
        assert not eligible(256, 256, 128, 64, jnp.bfloat16)   # Cout=64

    def test_bn_affine_roundtrip(self, rng):
        g = jnp.asarray(rng.standard_normal(8), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(8), jnp.float32)
        mean = jnp.asarray(rng.standard_normal(8), jnp.float32)
        var = jnp.asarray(rng.random(8) + 0.5, jnp.float32)
        a, b = bn_affine(g, beta, mean, var)
        x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
        expected = (x - mean) * jax.lax.rsqrt(var + 1e-5) * g + beta
        np.testing.assert_allclose(np.asarray(x * a + b), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)


class TestFusedTrunk:
    @pytest.fixture(scope="class")
    def models(self):
        classic = build_model("UNet_B", selective=True, compute_dtype="float32")
        fused = build_model("UNet_B", selective=True, compute_dtype="float32",
                            fused=True, fused_interpret=True)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        v_classic = classic.init(jax.random.PRNGKey(0), x, train=False)
        v_fused = fused.init(jax.random.PRNGKey(0), x, train=False)
        return classic, fused, v_classic, v_fused

    def test_identical_param_tree_and_init(self, models):
        classic, fused, vc, vf = models
        pc = jax.tree_util.tree_leaves_with_path(vc)
        pf = jax.tree_util.tree_leaves_with_path(vf)
        assert [p for p, _ in pc] == [p for p, _ in pf]
        for (path, lc), (_, lf) in zip(pc, pf):
            np.testing.assert_array_equal(
                np.asarray(lc), np.asarray(lf),
                err_msg=f"init differs at {jax.tree_util.keystr(path)}")

    def test_eval_forward_matches_classic(self, models, rng):
        classic, fused, vc, _ = models
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        out_c = classic.apply(vc, x, train=False)
        out_f = fused.apply(vc, x, train=False)  # same variables: same tree
        for c, f in zip(out_c, out_f):
            np.testing.assert_allclose(np.asarray(f), np.asarray(c),
                                       rtol=2e-4, atol=2e-4)

    def test_train_forward_and_stats_match_classic(self, models, rng):
        classic, fused, vc, _ = models
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        out_c, mut_c = classic.apply(vc, x, train=True, mutable=["batch_stats"])
        out_f, mut_f = fused.apply(vc, x, train=True, mutable=["batch_stats"])
        for c, f in zip(out_c, out_f):
            np.testing.assert_allclose(np.asarray(f), np.asarray(c),
                                       rtol=5e-4, atol=5e-4)
        sc = jax.tree_util.tree_leaves_with_path(mut_c["batch_stats"])
        sf = jax.tree_util.tree_leaves_with_path(mut_f["batch_stats"])
        assert [p for p, _ in sc] == [p for p, _ in sf]
        for (path, lc), (_, lf) in zip(sc, sf):
            np.testing.assert_allclose(
                np.asarray(lf), np.asarray(lc), rtol=5e-4, atol=5e-4,
                err_msg=f"batch_stats differ at {jax.tree_util.keystr(path)}")

    def test_train_gradients_match_classic(self, models, rng):
        classic, fused, vc, _ = models
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        yb = jnp.asarray((rng.random((2, 32, 32)) > 0.5), jnp.float32)

        def loss(model, params):
            (out, sel, aux), _ = model.apply(
                {"params": params, "batch_stats": vc["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            p = jax.nn.log_sigmoid(out)
            q = jax.nn.log_sigmoid(-out)
            return -jnp.mean(yb * p + (1 - yb) * q) + 0.1 * jnp.mean(
                jax.nn.sigmoid(sel)) + 0.1 * jnp.mean(aux)

        gc = jax.grad(lambda p: loss(classic, p))(vc["params"])
        gf = jax.grad(lambda p: loss(fused, p))(vc["params"])
        lc = jax.tree_util.tree_leaves_with_path(gc)
        lf = jax.tree_util.tree_leaves_with_path(gf)
        for (path, c), (_, f) in zip(lc, lf):
            np.testing.assert_allclose(
                np.asarray(f), np.asarray(c), rtol=3e-3, atol=1e-3,
                err_msg=f"grad differs at {jax.tree_util.keystr(path)}")
