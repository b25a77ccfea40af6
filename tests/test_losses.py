"""Loss-layer golden-value tests.

The reference validates its losses by hand-expanded sigmoid/log-softmax formulas
on toy tensors (jupyters/chcek_losses.ipynb cells 4-5, 9-13) and trusts torch for
the rest. Here every loss is checked (a) against an independent numpy
hand-expansion and (b) against torch functional ops where available.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.ops import (
    bce_with_logits,
    make_one_hot,
    selective_risk_b,
    selective_risk_ce,
    softmax_cross_entropy,
)


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x.astype(np.float64)))


class TestBCE:
    def test_golden_hand_formula(self, rng):
        x = rng.standard_normal((2, 3, 3)).astype(np.float32)
        y = (rng.random((2, 3, 3)) > 0.5).astype(np.float32)
        p = _np_sigmoid(x)
        expected = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
        got = float(bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
        assert got == pytest.approx(expected, rel=1e-5)

    def test_torch_parity(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.standard_normal((4, 8, 8)).astype(np.float32) * 5
        y = (rng.random((4, 8, 8)) > 0.3).astype(np.float32)
        expected = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(x), torch.from_numpy(y)
        ).item()
        got = float(bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
        assert got == pytest.approx(expected, rel=1e-5)


class TestCE:
    def test_golden_hand_formula(self, rng):
        logits = rng.standard_normal((1, 3, 3, 2)).astype(np.float32)
        labels = rng.integers(0, 2, (1, 3, 3))
        # hand expansion as in chcek_losses.ipynb cell 13
        e = np.exp(logits.astype(np.float64))
        logp = np.log(e / e.sum(-1, keepdims=True))
        expected = -np.mean(np.take_along_axis(logp, labels[..., None], -1))
        got = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        assert got == pytest.approx(expected, rel=1e-5)

    def test_torch_parity_nchw(self, rng):
        torch = pytest.importorskip("torch")
        logits = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
        labels = rng.integers(0, 3, (2, 4, 4))
        expected = torch.nn.functional.cross_entropy(
            torch.from_numpy(logits.transpose(0, 3, 1, 2)), torch.from_numpy(labels)
        ).item()
        got = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        assert got == pytest.approx(expected, rel=1e-5)


class TestOneHot:
    def test_matches_scatter_semantics(self, rng):
        labels = rng.integers(0, 4, (2, 3, 3))
        oh = np.asarray(make_one_hot(jnp.asarray(labels), 4))
        assert oh.shape == (2, 3, 3, 4)
        assert np.all(oh.sum(-1) == 1)
        assert np.all(np.argmax(oh, -1) == labels)


class TestSelectiveRiskB:
    """calc_selective_risk_image_b (reference selective_loss.py:58-85)."""

    def _numpy_reference(self, out, sel, y, tc=0.8, lamb=8.0):
        g = _np_sigmoid(sel)
        coverage = g.mean()
        p = _np_sigmoid(out)
        risk = -np.mean((y * np.log(p) + (1 - y) * np.log(1 - p)) * g) / coverage
        constraint = max(tc - coverage, 0.0) ** 2
        return risk + lamb * constraint, coverage

    def test_golden(self, rng):
        out = rng.standard_normal((2, 4, 4)).astype(np.float32)
        sel = rng.standard_normal((2, 4, 4)).astype(np.float32)
        y = (rng.random((2, 4, 4)) > 0.5).astype(np.float32)
        exp_loss, exp_cov = self._numpy_reference(out, sel, y)
        loss, cov = selective_risk_b(jnp.asarray(out), jnp.asarray(sel), jnp.asarray(y))
        assert float(loss) == pytest.approx(exp_loss, rel=1e-4)
        assert float(cov) == pytest.approx(exp_cov, rel=1e-5)

    def test_lambda_and_target_coverage(self, rng):
        out = rng.standard_normal((1, 4, 4)).astype(np.float32)
        sel = -3.0 * np.ones((1, 4, 4), np.float32)  # low coverage -> active constraint
        y = np.ones((1, 4, 4), np.float32)
        exp_loss, _ = self._numpy_reference(out, sel, y, tc=0.9, lamb=2.0)
        loss, _ = selective_risk_b(
            jnp.asarray(out), jnp.asarray(sel), jnp.asarray(y),
            target_coverage=0.9, lamb=2.0,
        )
        assert float(loss) == pytest.approx(exp_loss, rel=1e-4)

    def test_constraint_inactive_above_target(self):
        out = jnp.zeros((1, 4, 4))
        sel = 10.0 * jnp.ones((1, 4, 4))  # coverage ~1 > 0.8
        y = jnp.ones((1, 4, 4))
        loss_l8, _ = selective_risk_b(out, sel, y, lamb=8.0)
        loss_l0, _ = selective_risk_b(out, sel, y, lamb=0.0)
        assert float(loss_l8) == pytest.approx(float(loss_l0), rel=1e-6)

    def test_hard_selection_detached_and_binary(self, rng):
        out = rng.standard_normal((1, 4, 4)).astype(np.float32)
        sel = rng.standard_normal((1, 4, 4)).astype(np.float32)
        y = np.ones((1, 4, 4), np.float32)

        def loss_wrt_sel(s):
            loss, _ = selective_risk_b(jnp.asarray(out), s, jnp.asarray(y), hard_selection=True)
            return loss

        grad = jax.grad(loss_wrt_sel)(jnp.asarray(sel))
        np.testing.assert_allclose(np.asarray(grad), 0.0)

    def test_grad_flows_through_selection(self, rng):
        out = rng.standard_normal((1, 4, 4)).astype(np.float32)
        sel = rng.standard_normal((1, 4, 4)).astype(np.float32)
        y = np.ones((1, 4, 4), np.float32)
        grad = jax.grad(lambda s: selective_risk_b(jnp.asarray(out), s, jnp.asarray(y))[0])(
            jnp.asarray(sel)
        )
        assert np.abs(np.asarray(grad)).max() > 0

    def test_numerically_stable_extreme_logits(self):
        """The reference's naive log(sigmoid(x)) produces -inf at |x| ~ 100."""
        out = jnp.asarray([[[-100.0, 100.0], [50.0, -50.0]]])
        sel = jnp.zeros((1, 2, 2))
        y = jnp.asarray([[[0.0, 1.0], [1.0, 0.0]]])
        loss, _ = selective_risk_b(out, sel, y)
        assert np.isfinite(float(loss))


class TestSelectiveRiskCE:
    """calc_selective_risk_image (reference selective_loss.py:24-56)."""

    def _numpy_reference(self, out, sel, y, tc=0.8, lamb=8.0):
        e = np.exp(sel.astype(np.float64))
        g = (e / e.sum(-1, keepdims=True))[..., 1]
        coverage = g.mean()
        eo = np.exp(out.astype(np.float64))
        logp = np.log(eo / eo.sum(-1, keepdims=True))
        onehot = np.eye(out.shape[-1])[y]
        risk = -np.mean(np.sum(logp * onehot, -1) * g) / coverage
        constraint = max(tc - coverage, 0.0) ** 2
        return risk + lamb * constraint, coverage

    def test_golden(self, rng):
        out = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
        sel = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
        y = rng.integers(0, 2, (2, 4, 4))
        exp_loss, exp_cov = self._numpy_reference(out, sel, y)
        loss, cov = selective_risk_ce(jnp.asarray(out), jnp.asarray(sel), jnp.asarray(y))
        assert float(loss) == pytest.approx(exp_loss, rel=1e-4)
        assert float(cov) == pytest.approx(exp_cov, rel=1e-5)

    def test_accepts_onehot_target(self, rng):
        out = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
        sel = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
        y = rng.integers(0, 3, (1, 4, 4))
        loss_int, _ = selective_risk_ce(jnp.asarray(out), jnp.asarray(sel), jnp.asarray(y))
        onehot = jnp.asarray(np.eye(3, dtype=np.float32)[y])
        loss_oh, _ = selective_risk_ce(jnp.asarray(out), jnp.asarray(sel), onehot)
        assert float(loss_int) == pytest.approx(float(loss_oh), rel=1e-6)


class TestMaskedLosses:
    """Padded pixels (static-shape final batches, label=PAD_LABEL) must not
    contaminate losses — regression for a bug caught driving train.py live:
    valid select_loss went negative because (1-y) = -254 on padded pixels."""

    def test_bce_mask_equals_unpadded(self, rng):
        x = rng.standard_normal((2, 4, 4)).astype(np.float32)
        y = (rng.random((2, 4, 4)) > 0.5).astype(np.float32)
        ref = float(bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
        xp = np.concatenate([x, rng.standard_normal((1, 4, 4)).astype(np.float32)])
        yp = np.concatenate([y, np.full((1, 4, 4), 255.0, np.float32)])
        mask = np.concatenate([np.ones((2, 4, 4), bool), np.zeros((1, 4, 4), bool)])
        got = float(bce_with_logits(jnp.asarray(xp), jnp.asarray(yp), mask=jnp.asarray(mask)))
        assert got == pytest.approx(ref, rel=1e-5)

    def test_ce_mask_equals_unpadded(self, rng):
        x = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
        y = rng.integers(0, 2, (2, 4, 4))
        ref = float(softmax_cross_entropy(jnp.asarray(x), jnp.asarray(y)))
        xp = np.concatenate([x, rng.standard_normal((1, 4, 4, 2)).astype(np.float32)])
        yp = np.concatenate([y, np.full((1, 4, 4), 255, np.int64)])
        mask = np.concatenate([np.ones((2, 4, 4), bool), np.zeros((1, 4, 4), bool)])
        got = float(
            softmax_cross_entropy(jnp.asarray(xp), jnp.asarray(yp), mask=jnp.asarray(mask))
        )
        assert got == pytest.approx(ref, rel=1e-5)

    def test_selective_b_mask_equals_unpadded(self, rng):
        out = rng.standard_normal((2, 4, 4)).astype(np.float32)
        sel = rng.standard_normal((2, 4, 4)).astype(np.float32)
        y = (rng.random((2, 4, 4)) > 0.5).astype(np.float32)
        ref_loss, ref_cov = selective_risk_b(jnp.asarray(out), jnp.asarray(sel), jnp.asarray(y))

        pad = lambda a, v: np.concatenate([a, np.full((1, 4, 4), v, a.dtype)])
        mask = np.concatenate([np.ones((2, 4, 4), bool), np.zeros((1, 4, 4), bool)])
        loss, cov = selective_risk_b(
            jnp.asarray(pad(out, 0.0)), jnp.asarray(pad(sel, 9.0)),
            jnp.asarray(pad(y, 255.0)), mask=jnp.asarray(mask),
        )
        assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)
        assert float(cov) == pytest.approx(float(ref_cov), rel=1e-5)
        assert float(loss) >= 0.0  # the observed bug produced negative losses

    def test_selective_ce_mask_equals_unpadded(self, rng):
        out = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
        sel = rng.standard_normal((2, 4, 4, 2)).astype(np.float32)
        y = rng.integers(0, 2, (2, 4, 4))
        ref_loss, _ = selective_risk_ce(jnp.asarray(out), jnp.asarray(sel), jnp.asarray(y))
        pad4 = lambda a: np.concatenate([a, np.zeros((1, 4, 4, 2), np.float32)])
        yp = np.concatenate([y, np.full((1, 4, 4), 255, np.int64)])
        mask = np.concatenate([np.ones((2, 4, 4), bool), np.zeros((1, 4, 4), bool)])
        loss, _ = selective_risk_ce(
            jnp.asarray(pad4(out)), jnp.asarray(pad4(sel)), jnp.asarray(yp),
            mask=jnp.asarray(mask),
        )
        assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)


class TestRandomizedTorchParity:
    """Seeded fuzz sweep: every loss vs a torch oracle across random shapes,
    logit scales (incl. saturated +-30), degenerate labels (all-0 / all-1)
    and random (target_coverage, lambda) — the reference's losses ARE torch
    ops (train.py:77-86, selective_loss.py:24-85), so torch is the spec;
    fixed-shape goldens above cannot see scale- or shape-dependent drift."""

    # (seed, N, H, W, n_cls, logit_scale, label_kind)
    CASES = [
        (0, 1, 3, 5, 2, 0.5, "rand"),
        (1, 2, 7, 7, 3, 1.0, "rand"),
        (2, 3, 4, 9, 2, 5.0, "rand"),
        (3, 1, 16, 16, 5, 1.0, "rand"),
        (4, 2, 5, 5, 2, 30.0, "rand"),   # saturated logits
        (5, 2, 6, 6, 2, 1.0, "zeros"),   # all-background labels
        (6, 2, 6, 6, 2, 1.0, "ones"),    # all-tumor labels
        (7, 4, 8, 3, 4, 2.0, "rand"),
        (8, 1, 2, 2, 2, 0.1, "rand"),    # tiny map, near-zero logits
        (9, 5, 11, 13, 3, 3.0, "rand"),
    ]

    @staticmethod
    def _labels(rng, kind, shape, n_cls):
        if kind == "zeros":
            return np.zeros(shape, np.int64)
        if kind == "ones":
            return np.ones(shape, np.int64)
        return rng.integers(0, n_cls, shape).astype(np.int64)

    @pytest.mark.parametrize("seed,n,h,w,n_cls,scale,kind",
                             CASES, ids=[f"case{c[0]}" for c in CASES])
    def test_bce_and_selective_b(self, seed, n, h, w, n_cls, scale, kind):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(100 + seed)
        out = (rng.standard_normal((n, h, w)) * scale).astype(np.float32)
        sel = (rng.standard_normal((n, h, w)) * scale).astype(np.float32)
        y = self._labels(rng, kind, (n, h, w), 2).astype(np.float32)
        tc = float(rng.uniform(0.5, 0.95))
        lamb = float(rng.uniform(0.5, 16.0))

        t_out, t_sel, t_y = (torch.from_numpy(a) for a in (out, sel, y))
        exp_bce = F.binary_cross_entropy_with_logits(t_out, t_y).item()
        got_bce = float(bce_with_logits(jnp.asarray(out), jnp.asarray(y)))
        assert got_bce == pytest.approx(exp_bce, rel=1e-5, abs=1e-6)

        # reference selective_loss.py:58-85 in torch (log-sigmoid form: the
        # same stable-identity deviation ops/losses.py documents)
        g = torch.sigmoid(t_sel)
        cov = g.mean()
        log_lik = t_y * F.logsigmoid(t_out) + (1 - t_y) * F.logsigmoid(-t_out)
        exp_loss = (-(log_lik * g).mean() / cov
                    + lamb * torch.clamp(tc - cov, min=0.0) ** 2).item()
        loss, coverage = selective_risk_b(
            jnp.asarray(out), jnp.asarray(sel), jnp.asarray(y),
            target_coverage=tc, lamb=lamb,
        )
        assert float(coverage) == pytest.approx(cov.item(), rel=1e-5)
        assert float(loss) == pytest.approx(exp_loss, rel=1e-4, abs=1e-5)

    @pytest.mark.parametrize("seed,n,h,w,n_cls,scale,kind",
                             CASES, ids=[f"case{c[0]}" for c in CASES])
    def test_ce_and_selective_ce(self, seed, n, h, w, n_cls, scale, kind):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(200 + seed)
        out = (rng.standard_normal((n, h, w, n_cls)) * scale).astype(np.float32)
        sel = (rng.standard_normal((n, h, w, 2)) * scale).astype(np.float32)
        y = self._labels(rng, kind, (n, h, w), n_cls)
        tc = float(rng.uniform(0.5, 0.95))
        lamb = float(rng.uniform(0.5, 16.0))

        t_out = torch.from_numpy(out.transpose(0, 3, 1, 2))  # torch wants NCHW
        t_sel = torch.from_numpy(sel.transpose(0, 3, 1, 2))
        t_y = torch.from_numpy(y)
        exp_ce = F.cross_entropy(t_out, t_y).item()
        got_ce = float(softmax_cross_entropy(jnp.asarray(out), jnp.asarray(y)))
        assert got_ce == pytest.approx(exp_ce, rel=1e-5, abs=1e-6)

        # reference selective_loss.py:24-56 in torch
        g = F.softmax(t_sel, dim=1)[:, 1]
        cov = g.mean()
        onehot = F.one_hot(t_y, n_cls).permute(0, 3, 1, 2).float()
        logp = F.log_softmax(t_out, dim=1)
        exp_loss = (-((logp * onehot).sum(1) * g).mean() / cov
                    + lamb * torch.clamp(tc - cov, min=0.0) ** 2).item()
        loss, coverage = selective_risk_ce(
            jnp.asarray(out), jnp.asarray(sel), jnp.asarray(y),
            target_coverage=tc, lamb=lamb,
        )
        assert float(coverage) == pytest.approx(cov.item(), rel=1e-5)
        assert float(loss) == pytest.approx(exp_loss, rel=1e-4, abs=1e-5)


class TestCompositeObjective:
    """Reference train.py:193-201: loss = aux_loss + select_loss."""

    def test_composite_is_sum(self, rng):
        out = rng.standard_normal((1, 4, 4)).astype(np.float32)
        sel = rng.standard_normal((1, 4, 4)).astype(np.float32)
        aux = rng.standard_normal((1, 4, 4)).astype(np.float32)
        y = (rng.random((1, 4, 4)) > 0.5).astype(np.float32)
        aux_loss = bce_with_logits(jnp.asarray(aux), jnp.asarray(y))
        sel_loss, _ = selective_risk_b(jnp.asarray(out), jnp.asarray(sel), jnp.asarray(y), lamb=2.0)
        total = float(aux_loss + sel_loss)
        assert total == pytest.approx(float(aux_loss) + float(sel_loss), rel=1e-6)


class TestTrainStepPadMask:
    def test_drop_last_false_losses_are_clean(self, rng):
        """--drop_last 0 pads the final train batch with label=255; the train
        step must mask those pixels out of the losses (regression: (1-y) with
        y=255 produced hugely negative selective losses)."""
        import jax
        from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
        from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
        from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
        from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
            create_state,
            make_train_step,
        )

        cfg = TrainConfig(model_arch="UNet_B", selective=True, loss="BCElogit",
                          batch_size=4, patch_size=16, compute_dtype="float32",
                          drop_last=False)
        model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
        tx = build_optimizer(cfg)
        state = create_state(cfg, model, tx, jax.random.PRNGKey(0))
        step = make_train_step(model, cfg, tx)

        x = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
        y = (x[..., 0] > 0).astype(np.int32)
        y[2:] = 255  # two padded samples
        x[2:] = 0.0
        _, metrics = step(state, {"input": jnp.asarray(x), "label": jnp.asarray(y)},
                          1e-3, jax.random.PRNGKey(1))
        assert float(metrics["sel_loss"]) >= 0.0
        assert np.isfinite(float(metrics["loss"]))

        # and the masked loss equals the unpadded-batch loss
        cfg2 = TrainConfig(model_arch="UNet_B", selective=True, loss="BCElogit",
                           batch_size=2, patch_size=16, compute_dtype="float32")
        model2 = build_model(cfg2.model_arch, cfg2.n_cls, cfg2.selective, cfg2.compute_dtype)
        state2 = create_state(cfg2, model2, tx, jax.random.PRNGKey(0))
        step2 = make_train_step(model2, cfg2, tx)
        _, m2 = step2(state2, {"input": jnp.asarray(x[:2]), "label": jnp.asarray(y[:2])},
                      1e-3, jax.random.PRNGKey(1))
        # Not exactly equal: train-mode BatchNorm statistics still see the
        # padded zero samples (static shapes), slightly shifting the forward —
        # the analog of the reference's BN seeing a smaller ragged final batch.
        # The loss itself is masked, so the values agree closely instead of
        # being wrecked by (1-y) = -254 terms.
        assert float(metrics["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-2)
