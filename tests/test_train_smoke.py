"""End-to-end training smoke tests on a synthetic patch tree.

Covers: full train() driver (loaders -> jitted steps -> TB logs -> checkpoints),
reference checkpoint/log directory layout, digit-sorted auto-resume, selective
and plain modes, and learning signal (loss decreases / accuracy beats chance on
the separable synthetic data).
"""

import glob
import os

import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
from selectivenet_for_semantic_segmentation_binary_tpu.data import write_synthetic_patch_tree
from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import train


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("smoke_data")
    write_synthetic_patch_tree(str(d), n_slides=2, patches_per_slide=15, patch_size=32)
    return str(d)


def _cfg(data_dir, model_dir, **kw):
    base = dict(
        data_dir=data_dir,
        model_dir=model_dir,
        fold=1,
        patch_size=32,
        batch_size=8,
        n_epoch=2,
        model_arch="UNet_B",
        loss="BCElogit",
        selective=False,
        compute_dtype="float32",
        num_workers=2,
        local_rank=[0, 1],  # 2-device mesh
        log_img=True,
    )
    base.update(kw)
    return TrainConfig(**base)


class TestTrainSmoke:
    def test_plain_bce_two_epochs(self, data_dir, tmp_path):
        cfg = _cfg(data_dir, str(tmp_path / "model"))
        result = train(cfg, verbose=False)
        assert result["epoch"] == 2
        assert np.isfinite(result["train"].loss)
        assert np.isfinite(result["valid"].loss)

        # reference layout: {model_dir}/{fold}-fold/{checkpoint,log/{train,valid}}
        root = tmp_path / "model" / "1-fold"
        assert (root / "checkpoint" / "model_epoch1.ckpt").exists()
        assert (root / "checkpoint" / "model_epoch2.ckpt").exists()
        assert glob.glob(str(root / "log" / "train" / "events.out.tfevents.*"))
        assert glob.glob(str(root / "log" / "valid" / "events.out.tfevents.*"))

    def test_auto_resume_continues_epoch_numbering(self, data_dir, tmp_path):
        cfg = _cfg(data_dir, str(tmp_path / "model"), n_epoch=1)
        train(cfg, verbose=False)
        train(cfg, verbose=False)  # same command again -> resumes from epoch 1
        ckpts = os.listdir(str(tmp_path / "model" / "1-fold" / "checkpoint"))
        assert "model_epoch1.ckpt" in ckpts and "model_epoch2.ckpt" in ckpts

    def test_selective_training_and_signal(self, data_dir, tmp_path):
        cfg = _cfg(
            data_dir, str(tmp_path / "model"),
            selective=True, s_lamb=2.0, n_epoch=4,
        )
        result = train(cfg, verbose=False)
        tr = result["train"]
        assert tr.aux_loss is not None and np.isfinite(tr.aux_loss)
        assert tr.sel_loss is not None and np.isfinite(tr.sel_loss)
        assert 0.0 <= tr.rejection <= 1.0
        # separable synthetic data: accuracy should beat chance after 4 epochs
        assert tr.acc > 0.6

    def test_ce_unet_mode(self, data_dir, tmp_path):
        cfg = _cfg(
            data_dir, str(tmp_path / "model"),
            model_arch="UNet", loss="CE", n_epoch=1,
        )
        result = train(cfg, verbose=False)
        assert np.isfinite(result["train"].loss)

    def test_scheduler_integration(self, data_dir, tmp_path):
        cfg = _cfg(
            data_dir, str(tmp_path / "model"),
            lr_sche="StepLR", patience=1, factor=0.5, n_epoch=2,
        )
        result = train(cfg, verbose=False)
        assert result["epoch"] == 2

    def test_batch_not_divisible_by_mesh_raises(self, data_dir, tmp_path):
        cfg = _cfg(data_dir, str(tmp_path / "model"), batch_size=7)
        with pytest.raises(ValueError, match="divisible"):
            train(cfg, verbose=False)


class TestTrainVariants:
    def test_gh_stain_input_training(self, data_dir, tmp_path):
        """2-channel Gray+Hematoxylin input path end to end."""
        cfg = _cfg(data_dir, str(tmp_path / "model"), input_type="GH", n_epoch=1)
        result = train(cfg, verbose=False)
        assert np.isfinite(result["train"].loss)

    def test_ce_selective_training(self, data_dir, tmp_path):
        """UNet + CE + selective (softmax-selection risk) end to end."""
        cfg = _cfg(
            data_dir, str(tmp_path / "model"),
            model_arch="UNet", loss="CE", selective=True, s_lamb=2.0, n_epoch=1,
        )
        result = train(cfg, verbose=False)
        assert np.isfinite(result["train"].loss)
        assert np.isfinite(result["train"].sel_loss)

    def test_pnt_and_blankfield_flags(self, data_dir, tmp_path):
        cfg = _cfg(
            data_dir, str(tmp_path / "model"),
            pnt_aug=True, blankfield=True, n_epoch=1,
        )
        result = train(cfg, verbose=False)
        assert np.isfinite(result["train"].loss)

    def test_async_checkpointing(self, data_dir, tmp_path):
        cfg = _cfg(data_dir, str(tmp_path / "model"), ckpt_async=True)
        result = train(cfg, verbose=False)
        assert result["epoch"] == 2
        # both epochs landed in the reference layout and the latest resumes
        root = tmp_path / "model" / "1-fold" / "checkpoint"
        assert (root / "model_epoch1.ckpt").exists()
        assert (root / "model_epoch2.ckpt").exists()
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
            latest_checkpoint,
            load_checkpoint,
        )

        path, epoch = latest_checkpoint(str(root))
        assert epoch == 2
        assert load_checkpoint(path)["epoch"] == 2

    def test_sgd_momentum_and_cosine(self, data_dir, tmp_path):
        cfg = _cfg(
            data_dir, str(tmp_path / "model"),
            optim="SGD", momentum=0.9, w_decay=5e-4,
            lr_sche="CosineAnnealingLR", patience=4, n_epoch=2,
        )
        result = train(cfg, verbose=False)
        assert result["epoch"] == 2


class TestSchedulerResume:
    def test_reduce_lr_state_survives_resume(self, data_dir, tmp_path):
        """Regression: scheduler state was saved every epoch but never
        restored, so ReduceLR resumed at lr0 with reset counters."""
        from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_scheduler
        from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
            create_state,
            restore_if_available,
        )
        from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
        from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
        import jax

        cfg = _cfg(data_dir, str(tmp_path / "model"), lr_sche="ReduceLR",
                   patience=0, factor=0.5, n_epoch=3)
        train(cfg, verbose=False)

        model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
        tx = build_optimizer(cfg)
        state = create_state(cfg, model, tx, jax.random.PRNGKey(0))
        _, epoch, sched_state = restore_if_available(cfg, state)
        assert epoch == 3
        assert sched_state is not None
        sched = build_scheduler(cfg)
        sched.load_state_dict(sched_state)
        # patience=0 on a non-improving loss decays quickly; the restored lr
        # must carry whatever the run reached, not reset to lr0 unless the
        # loss actually kept improving
        assert sched.lr <= cfg.lr
        assert sched.last_epoch == 3


def test_fleet_checkpoint_agreement_single_process():
    """Single-process degenerate case of the per-epoch fleet agreement: a
    captured writer error re-raises locally, no error is a no-op (the
    multi-process abort path is pinned by
    test_multihost.py::test_writer_host_checkpoint_failure_aborts_whole_fleet)."""
    from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
        _fleet_checkpoint_agreement,
    )

    _fleet_checkpoint_agreement(None)
    with pytest.raises(OSError, match="disk full"):
        _fleet_checkpoint_agreement(OSError("disk full"))


class TestDegenerateEpochs:
    def test_zero_batch_selective_epoch_degrades_to_nan(self, data_dir, tmp_path):
        """batch_size > len(train split) with drop_last=True yields a
        zero-batch epoch: the selective TB scalars and verbose summary must
        degrade to NaN like loss/acc instead of crashing on None."""
        cfg = _cfg(data_dir, str(tmp_path / "model"), selective=True,
                   batch_size=512, n_epoch=1, log_img=False)
        result = train(cfg, verbose=True)
        assert np.isnan(result["train"].loss)
        assert np.isnan(result["train"].aux_loss)
        assert np.isnan(result["train"].rejection)
