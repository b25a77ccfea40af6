"""Selection-threshold calibration tests (tools/calibrate.py).

The reference evaluates at a fixed s_cut_off=0.5 (eval.py:45); the calibration
tool is the TPU-native extension that picks the threshold achieving a
requested empirical coverage. Quantile math is pinned on hand-built
histograms; the end-to-end path runs a real selective checkpoint through the
eval loader on the CPU mesh.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.config import EvalConfig
from selectivenet_for_semantic_segmentation_binary_tpu.data import (
    write_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.models import UNetB
from selectivenet_for_semantic_segmentation_binary_tpu.tools.calibrate import (
    N_BINS,
    calibrate,
    threshold_for_coverage,
)
from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
    save_checkpoint,
)


class TestQuantileMath:
    def test_uniform_histogram(self):
        hist = np.ones(N_BINS, np.int64)  # g uniform on [0, 1)
        res = threshold_for_coverage(hist, 0.8)
        assert res["s_cut_off"] == pytest.approx(0.2, abs=2 / N_BINS)
        assert res["achieved_coverage"] >= 0.8
        assert res["achieved_coverage"] == pytest.approx(0.8, abs=2 / N_BINS)

    def test_inclusive_side(self):
        # all mass in one bin: any target must select that bin, coverage 1.0
        hist = np.zeros(N_BINS, np.int64)
        hist[2000] = 100
        res = threshold_for_coverage(hist, 0.8)
        assert res["achieved_coverage"] == 1.0
        assert res["s_cut_off"] <= 2000 / N_BINS

    def test_full_coverage_threshold_zero(self):
        hist = np.ones(N_BINS, np.int64)
        res = threshold_for_coverage(hist, 1.0)
        assert res["s_cut_off"] == 0.0

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            threshold_for_coverage(np.zeros(N_BINS, np.int64), 0.8)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("calib")
        data_dir = os.path.join(str(d), "data")
        write_synthetic_patch_tree(data_dir, n_slides=2, patches_per_slide=10,
                                   patch_size=32, seed=7)
        model = UNetB(selective=True)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                               train=False)
        ckpt_dir = os.path.join(str(d), "ckpt")
        save_checkpoint(ckpt_dir, {"net": variables, "epoch": 1}, 1)
        return data_dir, ckpt_dir

    def _cfg(self, data_dir, ckpt_dir):
        return EvalConfig(
            data_dir=data_dir, test_fold=1, model_dir=ckpt_dir,
            model_arch=["UNet_B"], selective=True, select_eval=True,
            patch_size=32, batch_size=4,
        )

    def test_achieves_requested_coverage(self, setup):
        data_dir, ckpt_dir = setup
        res = calibrate(self._cfg(data_dir, ckpt_dir), target_coverage=0.7,
                        verbose=False)
        assert res["achieved_coverage"] >= 0.7
        # within one histogram bin + ties of the request
        assert 0.0 <= res["s_cut_off"] <= 1.0
        assert res["n_pixels"] == 4 * 32 * 32  # one test fold = 4 patches

    def test_threshold_reproduces_coverage_in_eval(self, setup):
        """Evaluating with the calibrated s_cut_off must reject ~(1-coverage)."""
        from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import (
            evaluate,
        )

        data_dir, ckpt_dir = setup
        res = calibrate(self._cfg(data_dir, ckpt_dir), target_coverage=0.6,
                        verbose=False)
        cfg = EvalConfig(
            data_dir=data_dir, test_fold=1, model_dir=ckpt_dir,
            model_arch=["UNet_B"], selective=True, select_eval=True,
            patch_size=32, batch_size=4, s_cut_off=res["s_cut_off"],
        )
        metrics = evaluate(cfg, verbose=False)
        achieved = 1.0 - metrics["rejection_ratio"]
        assert achieved == pytest.approx(res["achieved_coverage"], abs=0.02)

    def test_rejects_non_selective(self, setup):
        data_dir, ckpt_dir = setup
        cfg = self._cfg(data_dir, ckpt_dir)
        cfg.selective = False
        with pytest.raises(ValueError):
            calibrate(cfg, 0.8, verbose=False)

    def test_raw_logit_space_when_single_scale_none(self, setup):
        """With --single_scale None eval thresholds RAW selection logits, so
        the calibrated threshold must come back logit-transformed and still
        reproduce the requested coverage in eval."""
        from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import (
            evaluate,
        )

        data_dir, ckpt_dir = setup
        cfg = EvalConfig(
            data_dir=data_dir, test_fold=1, model_dir=ckpt_dir,
            model_arch=["UNet_B"], selective=True, select_eval=True,
            patch_size=32, batch_size=4, single_scale="None",
        )
        res = calibrate(cfg, target_coverage=0.6, verbose=False)
        assert res["space"] == "logit"
        ecfg = EvalConfig(
            data_dir=data_dir, test_fold=1, model_dir=ckpt_dir,
            model_arch=["UNet_B"], selective=True, select_eval=True,
            patch_size=32, batch_size=4, single_scale="None",
            s_cut_off=res["s_cut_off"],
        )
        metrics = evaluate(ecfg, verbose=False)
        achieved = 1.0 - metrics["rejection_ratio"]
        assert achieved == pytest.approx(res["achieved_coverage"], abs=0.02)

    def test_rejects_ce_form(self, setup):
        data_dir, ckpt_dir = setup
        cfg = self._cfg(data_dir, ckpt_dir)
        cfg.model_arch = ["UNet"]
        with pytest.raises(ValueError, match="argmax"):
            calibrate(cfg, 0.8, verbose=False)


class TestRiskCoverage:
    def test_curve_math_from_histogram(self):
        from selectivenet_for_semantic_segmentation_binary_tpu.tools.calibrate import (
            curve_from_histogram,
        )

        # confident-and-right mass high, confused mass low: risk must fall
        # as coverage shrinks
        hist = np.zeros((N_BINS, 2), np.int64)
        hist[100, 0] = 50   # low-confidence wrong
        hist[100, 1] = 50   # low-confidence right
        hist[4000, 1] = 900  # high-confidence right
        c = curve_from_histogram(hist)
        assert c["coverage"][0] == 1.0
        assert c["selective_risk"][0] == pytest.approx(0.05)
        # past the low-confidence mass only correct pixels remain
        i = 200
        assert c["coverage"][i] == pytest.approx(0.9)
        assert c["selective_risk"][i] == 0.0
        # coverage is non-increasing in the threshold
        assert np.all(np.diff(c["coverage"]) <= 0)

    def test_end_to_end_curve_and_csv(self, tmp_path):
        from selectivenet_for_semantic_segmentation_binary_tpu.tools.calibrate import (
            risk_coverage_curve,
        )

        d = str(tmp_path)
        data_dir = os.path.join(d, "data")
        write_synthetic_patch_tree(data_dir, n_slides=2, patches_per_slide=10,
                                   patch_size=32, seed=7)
        model = UNetB(selective=True)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                               train=False)
        ckpt_dir = os.path.join(d, "ckpt")
        save_checkpoint(ckpt_dir, {"net": variables, "epoch": 1}, 1)
        cfg = EvalConfig(
            data_dir=data_dir, test_fold=1, model_dir=ckpt_dir,
            model_arch=["UNet_B"], selective=True, select_eval=True,
            patch_size=32, batch_size=4,
        )
        csv_path = os.path.join(d, "curve.csv")
        c = risk_coverage_curve(cfg, csv_path=csv_path, verbose=False)
        assert c["coverage"][0] == 1.0
        assert np.all(np.diff(c["coverage"]) <= 0)
        with open(csv_path) as f:
            lines = f.read().strip().splitlines()
        assert lines[0] == "s_cut_off,coverage,selective_risk,selective_accuracy"
        assert len(lines) == 1 + N_BINS


class TestEvalSpaceCurve:
    def test_curve_thresholds_transform_with_single_scale(self, tmp_path):
        """With --single_scale None, every CSV/returned threshold must be a
        raw-logit value eval can consume directly."""
        from selectivenet_for_semantic_segmentation_binary_tpu.tools.calibrate import (
            risk_coverage_curve,
        )

        d = str(tmp_path)
        data_dir = os.path.join(d, "data")
        write_synthetic_patch_tree(data_dir, n_slides=2, patches_per_slide=10,
                                   patch_size=32, seed=7)
        model = UNetB(selective=True)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                               train=False)
        ckpt_dir = os.path.join(d, "ckpt")
        save_checkpoint(ckpt_dir, {"net": variables, "epoch": 1}, 1)
        cfg = EvalConfig(
            data_dir=data_dir, test_fold=1, model_dir=ckpt_dir,
            model_arch=["UNet_B"], selective=True, select_eval=True,
            patch_size=32, batch_size=4, single_scale="None",
        )
        c = risk_coverage_curve(cfg, verbose=False)
        # logit space spans negatives; sigmoid space never does
        assert c["threshold"][0] < 0
        assert np.all(np.diff(c["threshold"]) > 0)  # still monotone
        # the 2-D histogram marginal is the calibration histogram
        assert c["histogram2d"].shape[1] == 2
        assert int(c["histogram2d"].sum()) == 4 * 32 * 32


class TestCLISeed:
    def test_seed_flag_reaches_split(self, monkeypatch, tmp_path):
        """--seed must feed construct_train_valid for --split valid, or a
        non-default-seed model calibrates on data it trained on (advisor
        round-2 finding)."""
        from selectivenet_for_semantic_segmentation_binary_tpu.tools import (
            calibrate as cal,
        )

        seen = {}

        def fake_split(data_dir, test_fold, seed=42):
            seen["seed"] = seed
            raise RuntimeError("stop-after-split")

        monkeypatch.setattr(
            "selectivenet_for_semantic_segmentation_binary_tpu.data."
            "construct_train_valid", fake_split)
        with pytest.raises(RuntimeError, match="stop-after-split"):
            cal.main(["--data_dir", str(tmp_path), "--fold", "1",
                      "--model_dir", str(tmp_path), "--split", "valid",
                      "--seed", "7"])
        assert seen["seed"] == 7
