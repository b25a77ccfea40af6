"""Experiment-grid sweep harness tests (reference u-net_testing.ipynb cells
21-60 report shape on synthetic data)."""

import csv
import os

import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.data import (
    write_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.tools import (
    Variant,
    default_grid,
    run_sweep,
)


def test_default_grid_matches_reference_variants():
    names = {v.name for v in default_grid()}
    assert names == {"baseline", "PNT", "BC", "GH", "GH_BC"}
    gh = next(v for v in default_grid() if v.name == "GH")
    assert gh.train_kw["input_type"] == "GH" and gh.eval_kw["input_type"] == "GH"


@pytest.mark.slow
def test_sweep_end_to_end_synthetic(tmp_path):
    data_dir = str(tmp_path / "data")
    write_synthetic_patch_tree(data_dir, n_slides=2, patches_per_slide=12,
                               patch_size=32, seed=11)
    model_root = str(tmp_path / "models")
    save_dir = str(tmp_path / "report")

    variants = [Variant("baseline"), Variant("GH", train_kw={"input_type": "GH"},
                                             eval_kw={"input_type": "GH"})]
    rows = run_sweep(
        data_dir, model_root, folds=[1], variants=variants,
        train_overrides=dict(
            model_arch="UNet_B", selective=False, loss="BCElogit",
            n_epoch=2, batch_size=8, patch_size=32, num_workers=2,
            compute_dtype="float32", local_rank=[0, 1],
        ),
        eval_overrides=dict(local_rank=[0, 1], compute_dtype="float32"),
        save_dir=save_dir, verbose=False,
    )

    # per-(variant, fold) rows + one mean row per variant
    assert len(rows) == 4
    by_variant = {}
    for r in rows:
        by_variant.setdefault(r["variant"], []).append(r)
    for name in ("baseline", "GH"):
        fold_rows = [r for r in by_variant[name] if r["fold"] != "mean"]
        mean_rows = [r for r in by_variant[name] if r["fold"] == "mean"]
        assert len(fold_rows) == 1 and len(mean_rows) == 1
        assert fold_rows[0]["best_epoch"] in (1, 2)
        assert 0.0 <= fold_rows[0]["mIoU"] <= 1.0
        # single fold -> the nanmean row equals the fold row
        assert mean_rows[0]["mIoU"] == pytest.approx(fold_rows[0]["mIoU"])

    # checkpoints landed in the reference layout per variant
    assert os.path.exists(os.path.join(
        model_root, "baseline", "1-fold", "checkpoint", "model_epoch2.ckpt"))

    # CSV written with the expected header and row count
    with open(os.path.join(save_dir, "sweep_summary.csv")) as f:
        rd = list(csv.reader(f))
    assert rd[0][:3] == ["variant", "fold", "best_epoch"]
    assert len(rd) == 1 + len(rows)


@pytest.mark.slow
def test_sweep_resumes_without_retraining(tmp_path):
    """A second run over an already-trained grid must not add checkpoints."""
    data_dir = str(tmp_path / "data")
    write_synthetic_patch_tree(data_dir, n_slides=2, patches_per_slide=10,
                               patch_size=32, seed=12)
    model_root = str(tmp_path / "models")
    kw = dict(
        train_overrides=dict(model_arch="UNet_B", selective=False,
                             loss="BCElogit", n_epoch=1, batch_size=8,
                             patch_size=32, num_workers=2,
                             compute_dtype="float32", local_rank=[0, 1]),
        eval_overrides=dict(local_rank=[0, 1], compute_dtype="float32"),
        verbose=False,
    )
    variants = [Variant("baseline")]
    run_sweep(data_dir, model_root, folds=[1], variants=variants, **kw)
    ckpt_dir = os.path.join(model_root, "baseline", "1-fold", "checkpoint")
    before = sorted(os.listdir(ckpt_dir))
    rows = run_sweep(data_dir, model_root, folds=[1], variants=variants, **kw)
    assert sorted(os.listdir(ckpt_dir)) == before
    assert rows[0]["best_epoch"] == 1


class TestPickBest:
    def test_nan_never_wins(self):
        from selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep import (
            _pick_best,
        )

        scored = [(float("nan"), "e1"), (0.5, "e2"), (0.9, "e3"), (float("nan"), "e4")]
        assert _pick_best(scored) == (0.9, "e3")

    def test_all_nan_falls_back_to_latest(self):
        import math

        from selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep import (
            _pick_best,
        )

        scored = [(float("nan"), "e1"), (float("nan"), "e2"), (float("nan"), "e3")]
        score, ckpt = _pick_best(scored)
        assert ckpt == "e3" and math.isnan(score)


def test_completed_cell_cache_skips_rescoring(tmp_path, monkeypatch):
    """A finished (variant, fold) cell persists its row to sweep_row.json;
    re-running the same grid must reload it without ANY checkpoint scoring
    (long grids get OOM-killed by the tunnel client's host-memory growth and
    must be restartable at zero cost), while changing the grid definition
    (e.g. select_metric or eval overrides) must invalidate the cache."""
    import selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep as sweep_mod

    data_dir = str(tmp_path / "data")
    write_synthetic_patch_tree(data_dir, n_slides=2, patches_per_slide=12,
                               patch_size=32, seed=14)
    model_root = str(tmp_path / "models")
    ckpt_dir = os.path.join(model_root, "baseline", "1-fold", "checkpoint")
    os.makedirs(ckpt_dir)
    for e in (1, 2):  # pre-made "checkpoints": training is skipped (done=2)
        open(os.path.join(ckpt_dir, f"model_epoch{e}.ckpt"), "wb").close()

    calls = []

    def fake_eval(cfg, ckpt, loader):
        calls.append(os.path.basename(ckpt))
        return {"accuracy": 0.9, "accuracy_class": 0.9, "precision": [0.9],
                "recall": [0.9], "f1_score": [0.9], "mIoU": 0.9,
                "IoU_class": [0.9]}

    monkeypatch.setattr(sweep_mod, "_eval_single_checkpoint", fake_eval)
    kw = dict(
        folds=[1], variants=[Variant("baseline")],
        train_overrides=dict(
            model_arch="UNet_B", selective=False, loss="BCElogit",
            n_epoch=2, batch_size=8, patch_size=32, num_workers=2,
            compute_dtype="float32",
        ),
        eval_overrides={}, verbose=False,
    )
    rows1 = sweep_mod.run_sweep(data_dir, model_root, **kw)
    assert calls  # first run scored checkpoints
    assert os.path.exists(os.path.join(
        model_root, "baseline", "1-fold", "sweep_row.json"))

    calls.clear()
    rows2 = sweep_mod.run_sweep(data_dir, model_root, **kw)
    assert calls == []  # cache hit: zero scoring
    assert rows2 == rows1

    # a different grid definition must NOT reuse the stale row
    kw2 = {**kw, "eval_overrides": {"select_eval": False}}
    sweep_mod.run_sweep(data_dir, model_root, **kw2)
    assert calls  # meta mismatch -> re-scored

    # ... nor may a SAME-NAMED variant redefined with different eval settings
    sweep_mod.run_sweep(data_dir, model_root, **kw)  # restore the kw row
    calls.clear()
    kw3 = {**kw, "variants": [Variant("baseline",
                                      eval_kw={"blankfield": True})]}
    sweep_mod.run_sweep(data_dir, model_root, **kw3)
    assert calls  # variant_eval_kw mismatch -> re-scored

    # ... nor a swapped dataset (same fold/variant names, different data)
    data_dir2 = str(tmp_path / "data2")
    write_synthetic_patch_tree(data_dir2, n_slides=2, patches_per_slide=12,
                               patch_size=32, seed=15)
    sweep_mod.run_sweep(data_dir, model_root, **kw)  # restore the kw row
    calls.clear()
    sweep_mod.run_sweep(data_dir2, model_root, **kw)
    assert calls  # data_dir mismatch -> re-scored


class TestIsolateCells:
    """--isolate_cells: every (variant, fold) cell runs in a fresh child
    process and lands its row through the ordinary cell cache, with retries —
    the in-harness version of the external bash OOM-retry wrapper the round-3
    grid needed (the TPU-tunnel client leaks ~10 GB host RSS per cell)."""

    def _grid_kw(self):
        return dict(
            folds=[1], variants=[Variant("baseline")],
            train_overrides=dict(
                model_arch="UNet_B", selective=False, loss="BCElogit",
                n_epoch=2, batch_size=8, patch_size=32, num_workers=2,
                compute_dtype="float32",
            ),
            eval_overrides={}, verbose=False,
        )

    def test_retry_then_success_and_spec_roundtrip(self, tmp_path, monkeypatch):
        """A child that dies without producing a row is retried; the spec file
        round-trips the full cell definition (meta must match the parent's)."""
        import selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep as sweep_mod

        data_dir = str(tmp_path / "data")
        write_synthetic_patch_tree(data_dir, n_slides=2, patches_per_slide=12,
                                   patch_size=32, seed=21)
        model_root = str(tmp_path / "models")
        ckpt_dir = os.path.join(model_root, "baseline", "1-fold", "checkpoint")
        os.makedirs(ckpt_dir)
        for e in (1, 2):  # pre-made "checkpoints": the cell skips training
            open(os.path.join(ckpt_dir, f"model_epoch{e}.ckpt"), "wb").close()

        def fake_eval(cfg, ckpt, loader):
            return {"accuracy": 0.9, "accuracy_class": 0.9, "precision": [0.9],
                    "recall": [0.9], "f1_score": [0.9], "mIoU": 0.875,
                    "IoU_class": [0.9]}

        monkeypatch.setattr(sweep_mod, "_eval_single_checkpoint", fake_eval)

        attempts = []

        def fake_spawn(cmd):
            attempts.append(list(cmd))
            if len(attempts) == 1:
                return 137  # "OOM-killed" child: no row written
            # 2nd attempt: run the real child entry in-process (same
            # monkeypatched module), exercising the spec round trip and
            # proving the child's row cache key matches the parent's
            sweep_mod._cell_main(cmd[cmd.index("--cell_spec") + 1])
            return 0

        monkeypatch.setattr(sweep_mod, "_spawn_cell", fake_spawn)
        rows = sweep_mod.run_sweep(
            data_dir, model_root, isolate_cells=True, cell_retries=2,
            cell_retry_delay=0.01, **self._grid_kw(),
        )
        assert len(attempts) == 2
        fold_rows = [r for r in rows if r["fold"] == 1]
        assert fold_rows and fold_rows[0]["mIoU"] == pytest.approx(0.875)
        # the row persisted through the ordinary cell cache
        assert os.path.exists(os.path.join(
            model_root, "baseline", "1-fold", "sweep_row.json"))

    def test_exhausted_retries_raise(self, tmp_path, monkeypatch):
        import selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep as sweep_mod

        data_dir = str(tmp_path / "data")
        write_synthetic_patch_tree(data_dir, n_slides=2, patches_per_slide=12,
                                   patch_size=32, seed=22)
        monkeypatch.setattr(sweep_mod, "_spawn_cell", lambda cmd: 137)
        with pytest.raises(RuntimeError, match="no result row"):
            sweep_mod.run_sweep(
                data_dir, str(tmp_path / "models"), isolate_cells=True,
                cell_retries=1, cell_retry_delay=0.01, **self._grid_kw(),
            )

    @pytest.mark.slow
    def test_true_subprocess_end_to_end(self, tmp_path):
        """One real child interpreter trains + scores a tiny cell on the cpu
        platform (cell_platform forces it past the session's pinned device —
        the env var alone cannot, a sitecustomize latches the platform)."""
        data_dir = str(tmp_path / "data")
        write_synthetic_patch_tree(data_dir, n_slides=2, patches_per_slide=10,
                                   patch_size=32, seed=23)
        model_root = str(tmp_path / "models")
        rows = run_sweep(
            data_dir, model_root, folds=[1], variants=[Variant("baseline")],
            train_overrides=dict(
                model_arch="UNet_B", selective=False, loss="BCElogit",
                n_epoch=1, batch_size=8, patch_size=32, num_workers=2,
                compute_dtype="float32",
            ),
            eval_overrides={}, verbose=False,
            isolate_cells=True, cell_platform="cpu", cell_retries=0,
        )
        fold_rows = [r for r in rows if r["fold"] == 1]
        assert fold_rows and 0.0 <= fold_rows[0]["mIoU"] <= 1.0
        assert fold_rows[0]["best_epoch"] == 1
        # reference checkpoint layout produced by the child
        assert os.path.exists(os.path.join(
            model_root, "baseline", "1-fold", "checkpoint", "model_epoch1.ckpt"))
        # a rerun is a pure cache hit: no child spawn needed at all
        import selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep as sweep_mod
        import unittest.mock as mock

        with mock.patch.object(sweep_mod, "_spawn_cell",
                               side_effect=AssertionError("must not spawn")):
            rows2 = sweep_mod.run_sweep(
                data_dir, model_root, folds=[1], variants=[Variant("baseline")],
                train_overrides=dict(
                    model_arch="UNet_B", selective=False, loss="BCElogit",
                    n_epoch=1, batch_size=8, patch_size=32, num_workers=2,
                    compute_dtype="float32",
                ),
                eval_overrides={}, verbose=False,
                isolate_cells=True, cell_platform="cpu", cell_retries=0,
            )
        assert [r["mIoU"] for r in rows2 if r["fold"] == 1] == \
            [fold_rows[0]["mIoU"]]


def test_selection_stage_uses_select_overrides(tmp_path, monkeypatch):
    """In-coverage best-epoch selection is degenerate (an all-rejecting
    epoch-1 head scores ~1.0 on the trivial residue and wins); run_sweep must
    score the SELECTION stage with ``select_overrides`` (select_eval=False)
    while still REPORTING the test stage with ``eval_overrides``."""
    import selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep as sweep_mod

    data_dir = str(tmp_path / "data")
    write_synthetic_patch_tree(data_dir, n_slides=2, patches_per_slide=12,
                               patch_size=32, seed=13)
    model_root = str(tmp_path / "models")
    ckpt_dir = os.path.join(model_root, "baseline", "1-fold", "checkpoint")
    os.makedirs(ckpt_dir)
    for e in (1, 2):  # pre-made "checkpoints": training is skipped (done=2)
        open(os.path.join(ckpt_dir, f"model_epoch{e}.ckpt"), "wb").close()

    calls = []

    def fake_eval(cfg, ckpt, loader):
        calls.append(bool(cfg.select_eval))
        return {"accuracy": 0.9, "accuracy_class": 0.9, "precision": [0.9],
                "recall": [0.9], "f1_score": [0.9], "mIoU": 0.9,
                "IoU_class": [0.9], "rejection_ratio": 0.5}

    monkeypatch.setattr(sweep_mod, "_eval_single_checkpoint", fake_eval)
    sweep_mod.run_sweep(
        data_dir, model_root, folds=[1], variants=[Variant("baseline")],
        train_overrides=dict(
            model_arch="UNet_B", selective=True, loss="BCElogit",
            n_epoch=2, batch_size=8, patch_size=32, num_workers=2,
            compute_dtype="float32",
        ),
        eval_overrides=dict(select_eval=True),
        select_overrides=dict(select_eval=False),
        verbose=False,
    )
    # 2 selection-stage scorings (select_eval forced OFF) + 1 report (ON)
    assert calls == [False, False, True]
