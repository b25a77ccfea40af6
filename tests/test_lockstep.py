"""Torch-oracle LOCKSTEP training equivalence.

The strongest attainable proxy for the reference's unmatchable real-data
headline row (README.md:85, in-coverage mIoU 0.9612): export this framework's
init as a reference-named .pth, train the reference objective for N steps in
torch (CPU) and in this framework on IDENTICAL batches, and assert the
per-step loss / coverage / aux-loss trajectories agree within fp32 tolerance.
Forward/loss/optimizer parity are each pinned elsewhere in isolation; this
test pins their COMPOSITION — the full train loop semantics of reference
train.py:183-241 (selective UNet_B, BCElogit, Adam) including training-mode
BatchNorm statistics and the composite aux+selective objective
(selective_loss.py:58-85, train.py:193-201).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
    create_state,
    make_train_step,
)
from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
    export_torch_checkpoint,
)

N_STEPS = 4
BATCH, SIZE = 4, 32
LR = 1e-3
S_LAMB = 2.0
TARGET_COVERAGE = 0.8


def _build_torch_unetb(torch, n_cls=None):
    """UNet_B (n_cls=None) or UNet (n_cls heads, model.py:106-191) as a torch
    module with the reference's layer names, so the exported .pth loads
    directly. Oracle implementation written from the topology spec, not
    copied."""
    import torch.nn as nn

    def cbr(cin, cout):
        return nn.Sequential(
            nn.Conv2d(cin, cout, kernel_size=3, stride=1, padding=1),
            nn.BatchNorm2d(cout),
            nn.ReLU(),
        )

    class TorchUNetB(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_layer_1_1 = cbr(3, 64)
            self.encoder_layer_1_2 = cbr(64, 64)
            self.encoder_layer_2_1 = cbr(64, 128)
            self.encoder_layer_2_2 = cbr(128, 128)
            self.encoder_layer_3_1 = cbr(128, 256)
            self.encoder_layer_3_2 = cbr(256, 256)
            self.decoder_layer_4_2 = cbr(256, 512)
            self.decoder_layer_4_1 = cbr(512, 512)
            self.unpool3 = nn.ConvTranspose2d(512, 256, kernel_size=2, stride=2)
            self.decoder_layer_3_2 = cbr(512, 256)
            self.decoder_layer_3_1 = cbr(256, 256)
            self.unpool2 = nn.ConvTranspose2d(256, 128, kernel_size=2, stride=2)
            self.decoder_layer_2_2 = cbr(256, 128)
            self.decoder_layer_2_1 = cbr(128, 128)
            self.unpool1 = nn.ConvTranspose2d(128, 64, kernel_size=2, stride=2)
            self.decoder_layer_1_2 = cbr(128, 64)
            self.decoder_layer_1_1 = cbr(64, 64)
            out_ch = 1 if n_cls is None else n_cls
            sel_ch = 1 if n_cls is None else 2
            self.conv1x1 = nn.Conv2d(64, out_ch, kernel_size=1)
            self.conv_select = nn.Conv2d(64, sel_ch, kernel_size=1)
            self.conv_aux = nn.Conv2d(64, out_ch, kernel_size=1)
            self.pool = nn.MaxPool2d(2)

        def forward(self, x):
            e1 = self.encoder_layer_1_2(self.encoder_layer_1_1(x))
            e2 = self.encoder_layer_2_2(self.encoder_layer_2_1(self.pool(e1)))
            e3 = self.encoder_layer_3_2(self.encoder_layer_3_1(self.pool(e2)))
            b = self.decoder_layer_4_1(self.decoder_layer_4_2(self.pool(e3)))
            d3 = self.decoder_layer_3_1(
                self.decoder_layer_3_2(torch.cat([self.unpool3(b), e3], dim=1))
            )
            d2 = self.decoder_layer_2_1(
                self.decoder_layer_2_2(torch.cat([self.unpool2(d3), e2], dim=1))
            )
            d1 = self.decoder_layer_1_1(
                self.decoder_layer_1_2(torch.cat([self.unpool1(d2), e1], dim=1))
            )
            if n_cls is None:
                return (
                    self.conv1x1(d1).squeeze(1),
                    self.conv_select(d1).squeeze(1),
                    self.conv_aux(d1).squeeze(1),
                )
            return self.conv1x1(d1), self.conv_select(d1), self.conv_aux(d1)

    return TorchUNetB()


def _torch_selective_objective(torch, out, sel, aux, y):
    """aux BCEWithLogits + selective risk (selective_loss.py:58-85,
    train.py:193-201), in torch. log-sigmoid form is used for p/log(1-p) —
    mathematically identical to the reference's log(sigmoid(x)), stable in
    fp32 (the same documented deviation ops/losses.py makes)."""
    import torch.nn.functional as F

    aux_loss = F.binary_cross_entropy_with_logits(aux, y)
    g = torch.sigmoid(sel)
    coverage = g.mean()
    log_lik = y * F.logsigmoid(out) + (1.0 - y) * F.logsigmoid(-out)
    risk = -(log_lik * g).mean() / coverage
    constraint = torch.clamp(TARGET_COVERAGE - coverage, min=0.0) ** 2
    sel_loss = risk + S_LAMB * constraint
    return aux_loss + sel_loss, aux_loss, sel_loss, coverage


def _make_batches(n_steps):
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(n_steps):
        x = rng.standard_normal((BATCH, SIZE, SIZE, 3)).astype(np.float32) * 0.5
        y = (rng.random((BATCH, SIZE, SIZE)) > 0.6).astype(np.int32)
        batches.append((x, y))
    return batches


@pytest.mark.slow
def test_lockstep_selective_training_equivalence(tmp_path):
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    torch.set_num_threads(2)

    cfg = TrainConfig(
        model_arch="UNet_B", selective=True, loss="BCElogit", s_lamb=S_LAMB,
        target_coverage=TARGET_COVERAGE, optim="Adam", lr=LR,
        compute_dtype="float32", batch_size=BATCH, patch_size=SIZE,
        drop_last=True, log_img=False,
    )
    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
    tx = build_optimizer(cfg)
    state = create_state(cfg, model, tx, jax.random.PRNGKey(3))
    step = make_train_step(model, cfg, tx)

    # export the JAX init through the .pth interchange and load it in torch
    ckpt = str(tmp_path / "init.pth")
    export_torch_checkpoint(
        {"params": state.params, "batch_stats": state.batch_stats}, ckpt
    )
    net = _build_torch_unetb(torch)
    net.load_state_dict(torch.load(ckpt, weights_only=False)["net"])
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=LR)

    batches = _make_batches(N_STEPS)
    jax_traj, torch_traj = [], []
    for i, (x, y) in enumerate(batches):
        # torch step (reference train.py:183-209 semantics)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        yt = torch.from_numpy(y.astype(np.float32))
        out, sel, aux = net(xt)
        loss, aux_loss, sel_loss, coverage = _torch_selective_objective(
            torch, out, sel, aux, yt
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_traj.append(
            tuple(float(t.detach()) for t in (loss, aux_loss, sel_loss, coverage))
        )

        # jax step on the identical batch
        batch = {"input": jnp.asarray(x), "label": jnp.asarray(y)}
        state, metrics = step(state, batch, LR, jax.random.PRNGKey(100 + i))
        jax_traj.append(
            (
                float(metrics["loss"]), float(metrics["aux_loss"]),
                float(metrics["sel_loss"]), float(metrics["coverage"]),
            )
        )

    jax_traj = np.asarray(jax_traj)
    torch_traj = np.asarray(torch_traj)
    # fp32 end-to-end: per-step losses agree to ~1e-4 relative even after the
    # optimizer/BN state has evolved for several steps
    np.testing.assert_allclose(jax_traj, torch_traj, rtol=1e-3, atol=1e-4)

    # and the trajectories must actually move (guard against trivially-equal
    # constants masking a broken step)
    assert abs(jax_traj[0, 0] - jax_traj[-1, 0]) > 1e-3


@pytest.mark.slow
def test_lockstep_ce_sgd_training_equivalence(tmp_path):
    """Same lockstep proof for the OTHER objective family: UNet (n_cls
    heads), CrossEntropy + selective CE risk (selective_loss.py:24-56), SGD
    with momentum and weight decay (reference train.py:91-95)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    torch.manual_seed(0)
    torch.set_num_threads(2)
    MOMENTUM, WDECAY = 0.9, 1e-4

    cfg = TrainConfig(
        model_arch="UNet", n_cls=2, selective=True, loss="CE", s_lamb=S_LAMB,
        target_coverage=TARGET_COVERAGE, optim="SGD", momentum=MOMENTUM,
        w_decay=WDECAY, lr=LR, compute_dtype="float32", batch_size=BATCH,
        patch_size=SIZE, drop_last=True, log_img=False,
    )
    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
    tx = build_optimizer(cfg)
    state = create_state(cfg, model, tx, jax.random.PRNGKey(5))
    step = make_train_step(model, cfg, tx)

    ckpt = str(tmp_path / "init_ce.pth")
    export_torch_checkpoint(
        {"params": state.params, "batch_stats": state.batch_stats}, ckpt
    )
    net = _build_torch_unetb(torch, n_cls=2)
    net.load_state_dict(torch.load(ckpt, weights_only=False)["net"])
    net.train()
    opt = torch.optim.SGD(net.parameters(), lr=LR, momentum=MOMENTUM,
                          weight_decay=WDECAY)

    jax_traj, torch_traj = [], []
    for i, (x, y) in enumerate(_make_batches(N_STEPS)):
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        yt = torch.from_numpy(y.astype(np.int64))
        out, sel, aux = net(xt)
        aux_loss = F.cross_entropy(aux, yt)
        g = torch.softmax(sel, dim=1)[:, 1]
        coverage = g.mean()
        picked = F.log_softmax(out, dim=1).gather(1, yt.unsqueeze(1)).squeeze(1)
        risk = -(picked * g).mean() / coverage
        sel_loss = risk + S_LAMB * torch.clamp(
            TARGET_COVERAGE - coverage, min=0.0) ** 2
        loss = aux_loss + sel_loss
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_traj.append(tuple(float(t.detach()) for t in (loss, coverage)))

        batch = {"input": jnp.asarray(x), "label": jnp.asarray(y)}
        state, metrics = step(state, batch, LR, jax.random.PRNGKey(200 + i))
        jax_traj.append((float(metrics["loss"]), float(metrics["coverage"])))

    np.testing.assert_allclose(np.asarray(jax_traj), np.asarray(torch_traj),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_lockstep_long_horizon_with_scheduler(tmp_path):
    """24-step lockstep with a stepping LR scheduler (VERDICT round-2 #3):
    6 'epochs' x 4 steps, StepLR halving every 2 epochs — pins long-horizon
    accumulation (BN momentum-0.9 running stats + Adam moments over 24
    updates) AND the host-side scheduler feeding the traced lr, against the
    torch oracle (reference train.py:96-101, 164-250)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    torch.set_num_threads(2)
    from selectivenet_for_semantic_segmentation_binary_tpu.optim import (
        build_scheduler,
    )

    N_EPOCHS, STEPS_PER_EPOCH = 6, 4
    cfg = TrainConfig(
        model_arch="UNet_B", selective=True, loss="BCElogit", s_lamb=S_LAMB,
        target_coverage=TARGET_COVERAGE, optim="Adam", lr=LR,
        lr_sche="StepLR", patience=2, factor=0.5,
        compute_dtype="float32", batch_size=BATCH, patch_size=SIZE,
        drop_last=True, log_img=False,
    )
    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
    tx = build_optimizer(cfg)
    state = create_state(cfg, model, tx, jax.random.PRNGKey(3))
    step = make_train_step(model, cfg, tx)
    scheduler = build_scheduler(cfg)

    ckpt = str(tmp_path / "init.pth")
    export_torch_checkpoint(
        {"params": state.params, "batch_stats": state.batch_stats}, ckpt
    )
    net = _build_torch_unetb(torch)
    net.load_state_dict(torch.load(ckpt, weights_only=False)["net"])
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=LR)
    t_sched = torch.optim.lr_scheduler.StepLR(opt, step_size=2, gamma=0.5)

    batches = _make_batches(N_EPOCHS * STEPS_PER_EPOCH)
    jax_traj, torch_traj, lrs_jax, lrs_torch = [], [], [], []
    for e in range(N_EPOCHS):
        lrs_jax.append(scheduler.lr)
        lrs_torch.append(opt.param_groups[0]["lr"])
        for i in range(STEPS_PER_EPOCH):
            x, y = batches[e * STEPS_PER_EPOCH + i]
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
            yt = torch.from_numpy(y.astype(np.float32))
            out, sel, aux = net(xt)
            loss, *_ , coverage = _torch_selective_objective(torch, out, sel, aux, yt)
            opt.zero_grad(); loss.backward(); opt.step()
            torch_traj.append((float(loss.detach()), float(coverage.detach())))

            batch = {"input": jnp.asarray(x), "label": jnp.asarray(y)}
            state, metrics = step(state, batch, scheduler.lr, jax.random.PRNGKey(i))
            jax_traj.append((float(metrics["loss"]), float(metrics["coverage"])))
        scheduler.step()
        t_sched.step()

    np.testing.assert_allclose(lrs_jax, lrs_torch, rtol=0, atol=0)
    assert lrs_jax[0] != lrs_jax[-1], "scheduler never changed the lr"
    jax_traj, torch_traj = np.asarray(jax_traj), np.asarray(torch_traj)
    # fp32 drift compounds over 24 optimizer+BN updates; observed well under
    # this bound (see docs/RESULTS.md round-3 lockstep section)
    np.testing.assert_allclose(jax_traj, torch_traj, rtol=5e-3, atol=5e-4)
    # the early trajectory is still tight
    np.testing.assert_allclose(jax_traj[:8], torch_traj[:8], rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_lockstep_per_replica_bn_dataparallel_oracle(tmp_path):
    """``--bn_mode per_replica`` vs a faithful CPU emulation of 2-replica
    torch DataParallel training (reference train.py:132-134) — closing the
    one remaining SEMANTIC deviation (SURVEY.md §7 risk 2: DataParallel BN
    sees batch_size/replicas examples, global-batch BN sees them all).

    The oracle emulates exactly what nn.DataParallel does per forward
    (nn.DataParallel itself is CUDA-only): replicate the module (broadcast —
    deepcopy AFTER zero_grad), scatter the batch in equal dim-0 chunks, each
    replica's BN computes statistics on ITS OWN sub-batch, outputs gather and
    the selective objective is computed on the full batch, replica gradients
    sum into the base parameters, and ONLY the device[0] replica's
    running-stat updates persist (it alone shares buffer storage with the
    base module — torch DataParallel docs).

    Pins (a) the per-step loss/coverage trajectory like the single-device
    lockstep, and (b) the BN RUNNING STATISTICS buffer-for-buffer — the pin
    the global-BN path cannot make."""
    torch = pytest.importorskip("torch")
    import copy

    torch.manual_seed(0)
    torch.set_num_threads(2)
    REPLICAS = 2

    cfg = TrainConfig(
        model_arch="UNet_B", selective=True, loss="BCElogit", s_lamb=S_LAMB,
        target_coverage=TARGET_COVERAGE, optim="Adam", lr=LR,
        compute_dtype="float32", batch_size=BATCH, patch_size=SIZE,
        drop_last=True, log_img=False,
        bn_mode="per_replica", bn_replicas=REPLICAS,
    )
    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective,
                        cfg.compute_dtype, bn_mode="per_replica",
                        bn_groups=REPLICAS)
    tx = build_optimizer(cfg)
    state = create_state(cfg, model, tx, jax.random.PRNGKey(3))
    step = make_train_step(model, cfg, tx)

    # ALSO run the global-BN step on the same batches: per-replica BN must
    # genuinely change the training dynamics (guard against the mode
    # silently resolving to global)
    model_g = build_model(cfg.model_arch, cfg.n_cls, cfg.selective,
                          cfg.compute_dtype)
    state_g = create_state(cfg, model_g, tx, jax.random.PRNGKey(3))
    step_g = make_train_step(model_g, cfg, tx)

    ckpt = str(tmp_path / "init_pr.pth")
    export_torch_checkpoint(
        {"params": state.params, "batch_stats": state.batch_stats}, ckpt
    )
    net = _build_torch_unetb(torch)
    net.load_state_dict(torch.load(ckpt, weights_only=False)["net"])
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=LR)

    half = BATCH // REPLICAS
    jax_traj, torch_traj, global_traj = [], [], []
    stats_snapshots = {}  # step-1 running stats (before optimizer drift)
    for i, (x, y) in enumerate(_make_batches(N_STEPS)):
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        yt = torch.from_numpy(y.astype(np.float32))
        opt.zero_grad(set_to_none=True)  # BEFORE the broadcast: replicas
        # must not carry stale .grad tensors into backward
        replicas = [net] + [copy.deepcopy(net) for _ in range(REPLICAS - 1)]
        outs = [r(xt[j * half:(j + 1) * half]) for j, r in enumerate(replicas)]
        out, sel, aux = (torch.cat([o[k] for o in outs], dim=0)
                         for k in range(3))
        loss, aux_loss, sel_loss, coverage = _torch_selective_objective(
            torch, out, sel, aux, yt)
        loss.backward()
        for rep in replicas[1:]:  # gradient reduction into the base module
            for p, q in zip(net.parameters(), rep.parameters()):
                if q.grad is not None:
                    p.grad = q.grad if p.grad is None else p.grad + q.grad
        opt.step()
        torch_traj.append(tuple(float(t.detach())
                                for t in (loss, aux_loss, sel_loss, coverage)))

        batch = {"input": jnp.asarray(x), "label": jnp.asarray(y)}
        state, metrics = step(state, batch, LR, jax.random.PRNGKey(100 + i))
        jax_traj.append((float(metrics["loss"]), float(metrics["aux_loss"]),
                         float(metrics["sel_loss"]), float(metrics["coverage"])))
        state_g, metrics_g = step_g(state_g, batch, LR, jax.random.PRNGKey(100 + i))
        global_traj.append(float(metrics_g["loss"]))

        if i == 0:
            # snapshot step-1 running stats from identical initial params:
            # the one point where the buffers are free of compounded
            # optimizer drift (deep-layer batch statistics are chaotic in
            # fp32 after a few Adam steps — measured ~0.03 divergence from
            # the plain oracle by step 4 even for GLOBAL BN), so semantics
            # are pinned here and the trajectory is pinned over all steps
            stats_snapshots["jax"] = jax.device_get(state.batch_stats)
            stats_snapshots["jax_global"] = jax.device_get(state_g.batch_stats)
            stats_snapshots["torch"] = copy.deepcopy(net.state_dict())

    jax_traj, torch_traj = np.asarray(jax_traj), np.asarray(torch_traj)
    np.testing.assert_allclose(jax_traj, torch_traj, rtol=1e-3, atol=1e-4)
    # the modes must measurably differ (sub-batch vs global statistics)
    assert np.max(np.abs(jax_traj[:, 0] - np.asarray(global_traj))) > 1e-5

    # running-statistics pin, buffer for buffer through the .pth interchange:
    # group-0-only updates with torch's UNBIASED variance, at step 1 where
    # conv numerics (~1e-5) are the only noise
    exported = str(tmp_path / "step1_pr.pth")
    export_torch_checkpoint(
        {"params": state.params, "batch_stats": stats_snapshots["jax"]},
        exported,
    )
    sd = torch.load(exported, weights_only=False)["net"]
    ref_sd = stats_snapshots["torch"]
    checked = 0
    for k, v in sd.items():
        if "running_mean" in k or "running_var" in k:
            np.testing.assert_allclose(v.numpy(), ref_sd[k].detach().numpy(),
                                       rtol=1e-4, atol=1e-5, err_msg=k)
            checked += 1
    assert checked == 28  # 14 CBR BN layers x 2 buffers

    # discriminative control: per-replica vs global running stats at step 1
    # differ by far more than the pin tolerance (group-0-only + unbiased vs
    # full-batch + biased), so the buffer pin above really distinguishes the
    # semantics
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        stats_snapshots["jax"], stats_snapshots["jax_global"])
    assert max(jax.tree_util.tree_leaves(diffs)) > 5e-3, diffs


@pytest.mark.slow
@pytest.mark.parametrize("bn_stats", ["float32", "bfloat16"])
def test_lockstep_bf16_drift_characterized(tmp_path, bn_stats):
    """bf16 training drift vs the fp32 torch oracle, CHARACTERIZED not
    asserted tight (VERDICT round-2 #3): the flagship config trains in
    bfloat16 (and optionally bf16 BN statistics — LowPrecStatsBN); this pins
    that 12 steps of bf16 training track the fp32 oracle's trajectory to a
    few percent and never diverge/NaN. Measured drift numbers are recorded
    in docs/RESULTS.md."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    torch.set_num_threads(2)

    N = 12
    cfg = TrainConfig(
        model_arch="UNet_B", selective=True, loss="BCElogit", s_lamb=S_LAMB,
        target_coverage=TARGET_COVERAGE, optim="Adam", lr=LR,
        compute_dtype="bfloat16", bn_stats=bn_stats, batch_size=BATCH,
        patch_size=SIZE, drop_last=True, log_img=False,
    )
    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective,
                        cfg.compute_dtype, bn_stats=bn_stats)
    tx = build_optimizer(cfg)
    state = create_state(cfg, model, tx, jax.random.PRNGKey(3))
    step = make_train_step(model, cfg, tx)

    ckpt = str(tmp_path / "init.pth")
    export_torch_checkpoint(
        {"params": state.params, "batch_stats": state.batch_stats}, ckpt
    )
    net = _build_torch_unetb(torch)
    net.load_state_dict(torch.load(ckpt, weights_only=False)["net"])
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=LR)

    rel_drift = []
    for i, (x, y) in enumerate(_make_batches(N)):
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
        yt = torch.from_numpy(y.astype(np.float32))
        out, sel, aux = net(xt)
        loss, *_ = _torch_selective_objective(torch, out, sel, aux, yt)
        opt.zero_grad(); loss.backward(); opt.step()

        batch = {"input": jnp.asarray(x), "label": jnp.asarray(y)}
        state, metrics = step(state, batch, LR, jax.random.PRNGKey(i))
        jl, tl = float(metrics["loss"]), float(loss.detach())
        assert np.isfinite(jl), f"bf16 loss non-finite at step {i}"
        rel_drift.append(abs(jl - tl) / abs(tl))

    # bf16 rounding (2^-8 per op) accumulates through weights; a few percent
    # after 12 steps is the expected order — 20% would mean divergence
    assert max(rel_drift) < 0.05, rel_drift


@pytest.mark.slow
def test_lockstep_through_full_data_pipeline(tmp_path):
    """Lockstep fed from an ON-DISK synthetic patch tree through BOTH
    frameworks' full data pipelines (VERDICT round-2 #3): this framework's
    PatchLoader raw-uint8 device-preproc path vs a faithful torch-side
    re-implementation of the reference pipeline (PIL decode, /255,
    (x-0.5)/0.5, HWC->CHW; reference data_utils.py:94-236) — pinning
    decode -> normalize -> loss equivalence, not just in-memory batches."""
    torch = pytest.importorskip("torch")
    from PIL import Image

    torch.manual_seed(0)
    torch.set_num_threads(2)
    from selectivenet_for_semantic_segmentation_binary_tpu.data import (
        PatchDataset,
        PatchLoader,
        construct_train_valid,
        write_synthetic_patch_tree,
    )

    data_dir = str(tmp_path / "data")
    write_synthetic_patch_tree(data_dir, n_slides=3, patches_per_slide=10,
                               patch_size=SIZE, seed=9)
    train_list, _ = construct_train_valid(data_dir, test_fold=1, seed=42)

    cfg = TrainConfig(
        data_dir=data_dir, model_arch="UNet_B", selective=True, loss="BCElogit",
        s_lamb=S_LAMB, target_coverage=TARGET_COVERAGE, optim="Adam", lr=LR,
        compute_dtype="float32", batch_size=BATCH, patch_size=SIZE,
        drop_last=True, log_img=False,
    )
    ds = PatchDataset(data_dir, train_list, cfg.patch_mag, cfg.patch_size, "RGB")
    # shuffle/flips off => deterministic dataset-order batches both sides
    loader = PatchLoader(ds, BATCH, shuffle=False, num_workers=2,
                         drop_last=True, seed=0, device_preproc=True,
                         random_flip=False)

    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
    tx = build_optimizer(cfg)
    state = create_state(cfg, model, tx, jax.random.PRNGKey(3))
    step = make_train_step(model, cfg, tx)

    ckpt = str(tmp_path / "init.pth")
    export_torch_checkpoint(
        {"params": state.params, "batch_stats": state.batch_stats}, ckpt
    )
    net = _build_torch_unetb(torch)
    net.load_state_dict(torch.load(ckpt, weights_only=False)["net"])
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=LR)

    def torch_pipeline_batch(pairs):
        """Reference PatchDataset semantics (data_utils.py:215-234)."""
        xs, ys = [], []
        for inp_name, lab_name in pairs:
            img = np.asarray(
                Image.open(f"{data_dir}/{cfg.patch_mag}x_{cfg.patch_size}/{inp_name}"),
                np.float32) / 255.0
            lab = np.asarray(
                Image.open(f"{data_dir}/{cfg.patch_mag}x_{cfg.patch_size}/{lab_name}")
                .convert("L"), np.float32) / 255.0
            xs.append((img - 0.5) / 0.5)
            ys.append(lab.astype(np.uint8))
        x = np.stack(xs).transpose(0, 3, 1, 2)
        return torch.from_numpy(x), torch.from_numpy(np.stack(ys).astype(np.float32))

    n_steps = 3
    jax_losses, torch_losses = [], []
    for i, batch in enumerate(loader):
        if i >= n_steps:
            break
        pairs = train_list[i * BATCH:(i + 1) * BATCH]
        xt, yt = torch_pipeline_batch(pairs)
        out, sel, aux = net(xt)
        loss, *_ = _torch_selective_objective(torch, out, sel, aux, yt)
        opt.zero_grad(); loss.backward(); opt.step()
        torch_losses.append(float(loss.detach()))

        device_batch = {k: batch[k] for k in ("input", "label", "flips") if k in batch}
        state, metrics = step(state, device_batch, LR, jax.random.PRNGKey(i))
        jax_losses.append(float(metrics["loss"]))

    assert len(jax_losses) == n_steps
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3, atol=1e-4)
