"""Optimizer and LR-scheduler tests against torch semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
from selectivenet_for_semantic_segmentation_binary_tpu.optim import (
    ConstantLR,
    CosineAnnealingLR,
    ReduceLROnPlateau,
    StepLR,
    build_optimizer,
    build_scheduler,
)


def _run_optax_steps(cfg, grads_seq, p0, lr):
    tx = build_optimizer(cfg)
    p = jnp.asarray(p0)
    opt_state = tx.init(p)
    for g in grads_seq:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, p)
        p = p + jax.tree_util.tree_map(lambda u: -lr * u, updates)
    return np.asarray(p)


class TestOptimizers:
    @pytest.mark.parametrize("w_decay", [0.0, 5e-4])
    def test_adam_matches_torch(self, rng, w_decay):
        torch = pytest.importorskip("torch")
        p0 = rng.standard_normal(5).astype(np.float32)
        grads = [rng.standard_normal(5).astype(np.float32) for _ in range(4)]

        pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.Adam([pt], lr=1e-2, weight_decay=w_decay)
        for g in grads:
            opt.zero_grad()
            pt.grad = torch.from_numpy(g.copy())
            opt.step()

        cfg = TrainConfig(optim="Adam", w_decay=w_decay)
        ours = _run_optax_steps(cfg, grads, p0, 1e-2)
        np.testing.assert_allclose(ours, pt.detach().numpy(), rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("momentum", [0.0, 0.9])
    def test_sgd_matches_torch(self, rng, momentum):
        torch = pytest.importorskip("torch")
        p0 = rng.standard_normal(5).astype(np.float32)
        grads = [rng.standard_normal(5).astype(np.float32) for _ in range(4)]

        pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        opt = torch.optim.SGD([pt], lr=1e-2, momentum=momentum, weight_decay=5e-4)
        for g in grads:
            opt.zero_grad()
            pt.grad = torch.from_numpy(g.copy())
            opt.step()

        cfg = TrainConfig(optim="SGD", momentum=momentum, w_decay=5e-4)
        ours = _run_optax_steps(cfg, grads, p0, 1e-2)
        np.testing.assert_allclose(ours, pt.detach().numpy(), rtol=1e-5, atol=1e-6)


class TestSchedulers:
    def test_step_lr_matches_torch(self):
        torch = pytest.importorskip("torch")
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1e-3)
        tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.5)
        ours = StepLR(1e-3, step_size=3, gamma=0.5)
        for _ in range(10):
            assert ours.lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-9)
            opt.step()
            tsched.step()
            ours.step()

    def test_cosine_matches_torch(self):
        torch = pytest.importorskip("torch")
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1e-3)
        tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10, eta_min=1e-5)
        ours = CosineAnnealingLR(1e-3, T_max=10, eta_min=1e-5)
        for _ in range(10):
            assert ours.lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-6)
            opt.step()
            tsched.step()
            ours.step()

    def test_reduce_on_plateau_matches_torch(self):
        torch = pytest.importorskip("torch")
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1e-3)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", patience=2, factor=0.5
        )
        ours = ReduceLROnPlateau(1e-3, patience=2, factor=0.5)
        losses = [1.0, 0.9, 0.91, 0.92, 0.93, 0.94, 0.5, 0.6, 0.6, 0.6, 0.6, 0.6]
        for loss in losses:
            tsched.step(loss)
            ours.step(loss)
            assert ours.lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-9), loss

    def test_factory(self):
        assert isinstance(build_scheduler(TrainConfig(lr_sche=None)), ConstantLR)
        assert isinstance(build_scheduler(TrainConfig(lr_sche="StepLR")), StepLR)
        assert isinstance(build_scheduler(TrainConfig(lr_sche="ReduceLR")), ReduceLROnPlateau)
        assert isinstance(
            build_scheduler(TrainConfig(lr_sche="CosineAnnealingLR")), CosineAnnealingLR
        )

    def test_state_dict_roundtrip(self):
        s = ReduceLROnPlateau(1e-3, patience=1, factor=0.1)
        s.step(1.0)
        s.step(2.0)
        s.step(2.0)
        d = s.state_dict()
        s2 = ReduceLROnPlateau(1e-3, patience=1, factor=0.1)
        s2.load_state_dict(d)
        assert s2.lr == s.lr and s2.num_bad_epochs == s.num_bad_epochs
