"""Spatial-parallel TRAINING (--sp_ways): GSPMD shards image rows.

The reference scales only by replicating the model over the batch
(DataParallel, train.py:132-134). `--sp_ways s` is the TPU-native extension
beyond that: the global batch is laid out (dp, sp) on a 2-D
(DATA_AXIS, SPATIAL_AXIS) mesh — examples over `data`, image ROWS over
`spatial` — and the unchanged jitted train step lets XLA/GSPMD spatially
partition every convolution with automatic halo exchange. Because the step
computes global-batch losses/BN over global logical arrays, sharding layout
cannot change the objective (SURVEY.md §2.2 "spatial partitioning" stretch
goal, here for training, i.e. patches too large for one chip's HBM).

These tests pin that equivalence on the virtual 8-device CPU mesh.
"""

import jax
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
from selectivenet_for_semantic_segmentation_binary_tpu.data import (
    write_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
from selectivenet_for_semantic_segmentation_binary_tpu.parallel import (
    batch_sharding,
    replicate,
    replicated_sharding,
)
from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    make_mesh_dp_sp,
)
from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
    create_state,
    make_train_step,
    train,
)


def _sharded_batch(x, y, mesh):
    s = batch_sharding(mesh)
    return {"input": jax.device_put(x, s), "label": jax.device_put(y, s)}


class TestMeshConstruction:
    def test_sp1_is_plain_dp(self):
        mesh = make_mesh_dp_sp(8, 1, batch_size=16, patch_size=32)
        assert mesh.axis_names == (DATA_AXIS,)
        assert mesh.devices.size == 8

    def test_2d_mesh_axes_and_sizes(self):
        mesh = make_mesh_dp_sp(8, 4, batch_size=16, patch_size=32)
        assert set(mesh.axis_names) == {DATA_AXIS, SPATIAL_AXIS}
        assert mesh.shape[DATA_AXIS] == 2 and mesh.shape[SPATIAL_AXIS] == 4

    def test_batch_sharding_spec_follows_mesh(self):
        m1 = make_mesh_dp_sp(8, 1, 16, 32)
        m2 = make_mesh_dp_sp(8, 2, 16, 32)
        assert batch_sharding(m1).spec == jax.sharding.PartitionSpec(DATA_AXIS)
        assert batch_sharding(m2).spec == jax.sharding.PartitionSpec(
            DATA_AXIS, SPATIAL_AXIS)

    def test_validation_errors(self):
        with pytest.raises(ValueError, match="divide the device count"):
            make_mesh_dp_sp(8, 3, batch_size=16, patch_size=48)
        with pytest.raises(ValueError, match="data-parallel ways"):
            make_mesh_dp_sp(8, 2, batch_size=7, patch_size=32)
        with pytest.raises(ValueError, match="8 \\* sp_ways"):
            make_mesh_dp_sp(8, 2, batch_size=16, patch_size=24)
        # sp=1 keeps the historic divisibility error
        with pytest.raises(ValueError, match="mesh size"):
            make_mesh_dp_sp(8, 1, batch_size=7, patch_size=32)


class TestStepEquivalence:
    """The SAME jitted step fed dp / dp x sp sharded inputs must produce the
    same losses and parameter updates (up to fp32 reduction order)."""

    def _run(self, mesh, x, y, n_steps=3):
        cfg = TrainConfig(
            model_arch="UNet_B", selective=True, loss="BCElogit", s_lamb=2.0,
            batch_size=x.shape[0], patch_size=x.shape[1],
            compute_dtype="float32",
            # SGD: param deltas are lr-proportional to grads, so leaf-for-leaf
            # comparison is well-conditioned (Adam normalizes near-zero grads
            # into +-lr sign noise, which fp32 reduction order can flip)
            optim="SGD",
        )
        model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective,
                            cfg.compute_dtype)
        tx = build_optimizer(cfg)
        state = replicate(create_state(cfg, model, tx, jax.random.PRNGKey(0)),
                          mesh)
        step = make_train_step(model, cfg, tx)
        batch = _sharded_batch(x, y, mesh)
        losses = []
        for _ in range(n_steps):
            state, metrics = step(state, batch, 1e-3, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
        return losses, state

    def test_sp_shardings_match_dp(self, rng):
        x = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
        y = (x[..., 0] > 0).astype(np.int32)

        base_losses, base_state = self._run(make_mesh_dp_sp(8, 1, 8, 32), x, y)
        for sp in (2, 4):
            mesh = make_mesh_dp_sp(8, sp, 8, 32)
            losses, state = self._run(mesh, x, y)
            for i, (a, b) in enumerate(zip(base_losses, losses)):
                assert b == pytest.approx(a, rel=1e-4), (
                    f"sp={sp} step {i}: {b} vs {a}")
            # updated params agree leaf-for-leaf and stay replicated
            for la, lb in zip(jax.tree_util.tree_leaves(base_state.params),
                              jax.tree_util.tree_leaves(state.params)):
                np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                           rtol=1e-4, atol=1e-6)
            leaf = jax.tree_util.tree_leaves(state.params)[0]
            assert leaf.sharding.is_equivalent_to(
                replicated_sharding(mesh), ndim=leaf.ndim)


class TestRemat:
    """--remat (jax.checkpoint over the loss fn) recomputes the forward in
    the backward pass; the math is identical ops in the same dtype, so losses
    and updated params must match the non-remat step exactly (it is a
    memory/throughput trade, never a numerics change). Composes with sp_ways
    (the huge-patch pairing: rows sharded across chips + lean activations)."""

    def _run(self, remat, mesh, x, y, n_steps=3):
        cfg = TrainConfig(
            model_arch="UNet_B", selective=True, loss="BCElogit", s_lamb=2.0,
            batch_size=x.shape[0], patch_size=x.shape[1],
            compute_dtype="float32", optim="SGD", remat=remat,
        )
        model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective,
                            cfg.compute_dtype)
        tx = build_optimizer(cfg)
        state = replicate(create_state(cfg, model, tx, jax.random.PRNGKey(0)),
                          mesh)
        step = make_train_step(model, cfg, tx)
        batch = _sharded_batch(x, y, mesh)
        losses = []
        for _ in range(n_steps):
            state, metrics = step(state, batch, 1e-3, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
        return losses, state

    def test_remat_step_is_numerically_identical(self, rng):
        x = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
        y = (x[..., 0] > 0).astype(np.int32)
        mesh = make_mesh_dp_sp(4, 1, 4, 32)
        base_losses, base_state = self._run(False, mesh, x, y)
        rm_losses, rm_state = self._run(True, mesh, x, y)
        assert rm_losses == base_losses  # same ops, same dtype: bit-equal
        for la, lb in zip(jax.tree_util.tree_leaves(base_state.params),
                          jax.tree_util.tree_leaves(rm_state.params)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-6, atol=1e-7)

    def test_remat_composes_with_sp_ways(self, rng):
        x = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
        y = (x[..., 0] > 0).astype(np.int32)
        base, _ = self._run(False, make_mesh_dp_sp(4, 1, 4, 32), x, y)
        sp_rm, _ = self._run(True, make_mesh_dp_sp(8, 4, 4, 32), x, y)
        for a, b in zip(base, sp_rm):
            assert b == pytest.approx(a, rel=1e-4)


class TestPublicTrainEntry:
    @pytest.fixture(scope="class")
    def data_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("sp_train_data")
        write_synthetic_patch_tree(str(d), n_slides=2, patches_per_slide=12,
                                   patch_size=32)
        return str(d)

    def _cfg(self, data_dir, model_dir, **kw):
        base = dict(
            data_dir=data_dir, model_dir=model_dir, fold=1, patch_size=32,
            batch_size=8, n_epoch=2, model_arch="UNet_B", loss="BCElogit",
            selective=True, s_lamb=2.0, compute_dtype="float32",
            num_workers=2, log_img=False,
        )
        base.update(kw)
        return TrainConfig(**base)

    def test_sp_ways_train_matches_dp(self, data_dir, tmp_path):
        """Public train() with --sp_ways 2 (4 devices -> dp2 x sp2) reproduces
        the dp-only run: same loader order (seeded), same global objective."""
        r_dp = train(self._cfg(data_dir, str(tmp_path / "dp"),
                               local_rank=[0, 1, 2, 3]), verbose=False)
        r_sp = train(self._cfg(data_dir, str(tmp_path / "sp"),
                               local_rank=[0, 1, 2, 3], sp_ways=2),
                     verbose=False)
        assert r_sp["epoch"] == r_dp["epoch"] == 2
        assert r_sp["train"].loss == pytest.approx(r_dp["train"].loss, rel=1e-3)
        assert r_sp["valid"].loss == pytest.approx(r_dp["valid"].loss, rel=1e-3)
        assert r_sp["train"].acc == pytest.approx(r_dp["train"].acc, abs=1e-3)

    def test_sp_ways_eval_matches_dp(self, data_dir, tmp_path):
        """evaluate() under a 2-D DP x SP mesh reproduces the 1-D metrics
        (the forward is deterministic; only fp32 reduction order differs)."""
        import glob
        import shutil

        from selectivenet_for_semantic_segmentation_binary_tpu.config import (
            EvalConfig,
        )
        from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import (
            evaluate,
        )

        model_dir = str(tmp_path / "model")
        train(self._cfg(data_dir, model_dir, local_rank=[0, 1, 2, 3],
                        n_epoch=1), verbose=False)
        single = str(tmp_path / "single")
        import os

        os.makedirs(single)
        shutil.copy(sorted(glob.glob(
            f"{model_dir}/1-fold/checkpoint/*.ckpt"))[-1], single)

        def _eval(sp):
            # select_eval=False: after 1 epoch the selection head can still
            # reject everything, making in-coverage metrics nan (documented
            # early-epoch behavior) — plain metrics are always defined
            cfg = EvalConfig(
                data_dir=data_dir, test_fold=1, patch_size=32, batch_size=8,
                model_dir=single, model_arch=["UNet_B"], selective=True,
                select_eval=False, compute_dtype="float32",
                local_rank=[0, 1, 2, 3], num_workers=2, sp_ways=sp,
            )
            return evaluate(cfg, verbose=False)

        r1, r2 = _eval(1), _eval(2)
        assert np.isfinite(r1["accuracy"])
        assert r2["accuracy"] == pytest.approx(r1["accuracy"], abs=2e-3)
        assert r2["mIoU"] == pytest.approx(r1["mIoU"], abs=2e-3)
        np.testing.assert_allclose(r2["confusion_matrix"],
                                   r1["confusion_matrix"], atol=64)

    def test_loader_layout_under_2d_mesh(self, data_dir):
        """input/label ride (data, spatial); (N, 2) flips stay data-only."""
        from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
            make_loaders,
        )

        cfg = self._cfg(data_dir, "/tmp/unused", local_rank=[0, 1, 2, 3],
                        sp_ways=2)
        mesh = make_mesh_dp_sp(cfg.n_devices, cfg.sp_ways, cfg.batch_size,
                               cfg.patch_size)
        loader_train, _ = make_loaders(cfg, mesh)
        batch = next(iter(loader_train))
        P = jax.sharding.PartitionSpec
        assert batch["input"].sharding.spec == P(DATA_AXIS, SPATIAL_AXIS)
        assert batch["label"].sharding.spec == P(DATA_AXIS, SPATIAL_AXIS)
        if "flips" in batch:
            assert batch["flips"].sharding.spec == P(DATA_AXIS)
