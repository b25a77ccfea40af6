"""Metric-layer golden tests.

The reference's manual spec is jupyters/check_metrics.ipynb: drive the Evaluator
with a fixed toy label/pred pair and check every getter. Here the same idea runs
as real pytest golden values (hand-computed confusion matrices), plus:
  * equivalence of host numpy vs on-device accumulation paths,
  * selective (in-coverage) masking semantics,
  * padded-pixel exclusion (label == PAD_LABEL drops out of counting).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.ops.confusion import (
    PAD_LABEL,
    confusion_matrix_update,
)
from selectivenet_for_semantic_segmentation_binary_tpu.utils.metrics import (
    Evaluator,
    compute_IoU,
    compute_mIOU,
    get_performance,
)

# toy 3x3 case: label rows are GT, columns are predictions
LABEL = np.array([[[0, 0, 1], [1, 1, 0], [1, 1, 1]]])
PRED = np.array([[[0, 1, 1], [1, 0, 0], [1, 1, 1]]])
# GT 0 (3 px): pred 0 ->1, pred 1 ->1... counts: label0: preds (0,1,0)->cm[0,0]=2? walk:
#  (0,0)->0/0, (0,1)->0/1, (0,2)->1/1, (1,0)->1/1, (1,1)->1/0, (1,2)->0/0,
#  (2,0)->1/1, (2,1)->1/1, (2,2)->1/1
# cm = [[2, 1], [1, 5]]
GOLD_CM = np.array([[2.0, 1.0], [1.0, 5.0]])


class TestEvaluatorGolden:
    def test_confusion_matrix(self):
        ev = Evaluator(num_class=2, selective=False)
        ev.add_batch(LABEL, PRED)
        np.testing.assert_array_equal(ev.confusion_matrix, GOLD_CM)

    def test_all_getters(self):
        ev = Evaluator(num_class=2, selective=False)
        ev.add_batch(LABEL, PRED)
        assert ev.get_Pixel_Accuracy() == pytest.approx(7 / 9)
        # per-class acc: [2/3, 5/6] -> mean 0.75
        assert ev.get_Pixel_Accuracy_Class() == pytest.approx(0.75)
        np.testing.assert_allclose(ev.get_Precision(), [2 / 3, 5 / 6])
        np.testing.assert_allclose(ev.get_Recall(), [2 / 3, 5 / 6])
        f1 = ev.get_F1_Score(ev.get_Precision(), ev.get_Recall())
        np.testing.assert_allclose(f1, [2 / 3, 5 / 6])
        # IoU: diag / (row + col - diag) = [2/4, 5/7]
        np.testing.assert_allclose(ev.get_IoU_Class(), [0.5, 5 / 7])
        assert ev.get_mIoU() == pytest.approx((0.5 + 5 / 7) / 2)
        # FWIoU: freq [3/9, 6/9] -> 3/9*1/2 + 6/9*5/7
        assert ev.get_FWIoU() == pytest.approx(3 / 9 * 0.5 + 6 / 9 * 5 / 7)
        np.testing.assert_allclose(ev.get_Dice_Score(), [2 * 2 / 6, 2 * 5 / 12])

    def test_reset_and_accumulate(self):
        ev = Evaluator(num_class=2, selective=False)
        ev.add_batch(LABEL, PRED)
        ev.add_batch(LABEL, PRED)
        np.testing.assert_array_equal(ev.confusion_matrix, 2 * GOLD_CM)
        ev.reset()
        assert ev.confusion_matrix.sum() == 0

    def test_selective_masking(self):
        """compute_metric.py:17-18: only pixels with selection == 1 count."""
        ev = Evaluator(num_class=2, selective=True)
        selection = np.zeros_like(LABEL)
        selection[0, 2, :] = 1  # only bottom row: all label 1, pred 1
        ev.add_batch(LABEL, PRED, selection=selection)
        np.testing.assert_array_equal(ev.confusion_matrix, [[0, 0], [0, 3]])

    def test_invalid_labels_excluded(self):
        ev = Evaluator(num_class=2, selective=False)
        label = LABEL.copy()
        label[0, 0, 0] = PAD_LABEL  # padded pixel must not count
        ev.add_batch(label, PRED)
        expect = GOLD_CM.copy()
        expect[0, 0] -= 1
        np.testing.assert_array_equal(ev.confusion_matrix, expect)


class TestOnDevicePath:
    def test_device_equals_host(self, rng):
        label = rng.integers(0, 2, (4, 16, 16))
        pred = rng.integers(0, 2, (4, 16, 16))
        ev_host = Evaluator(2, selective=False)
        ev_host.add_batch(label, pred)
        ev_dev = Evaluator(2, selective=False)
        ev_dev.add_batch(jnp.asarray(label), jnp.asarray(pred))
        np.testing.assert_array_equal(ev_host.confusion_matrix, ev_dev.confusion_matrix)

    def test_device_selective_equals_host(self, rng):
        label = rng.integers(0, 2, (4, 16, 16))
        pred = rng.integers(0, 2, (4, 16, 16))
        sel = rng.integers(0, 2, (4, 16, 16))
        ev_host = Evaluator(2, selective=True)
        ev_host.add_batch(label, pred, selection=sel)
        ev_dev = Evaluator(2, selective=True)
        ev_dev.add_batch(jnp.asarray(label), jnp.asarray(pred), selection=jnp.asarray(sel))
        np.testing.assert_array_equal(ev_host.confusion_matrix, ev_dev.confusion_matrix)

    def test_jitted_update_golden(self):
        cm = np.asarray(confusion_matrix_update(jnp.asarray(LABEL), jnp.asarray(PRED), 2))
        np.testing.assert_array_equal(cm, GOLD_CM)

    def test_add_confusion_matrix(self):
        ev = Evaluator(2)
        ev.add_confusion_matrix(jnp.asarray(GOLD_CM))
        np.testing.assert_array_equal(ev.confusion_matrix, GOLD_CM)


class TestScalarMetrics:
    def test_get_performance_golden(self):
        label = np.array([0, 0, 1, 1, 1])
        output = np.array([0.1, 0.8, 0.9, 0.3, 0.7])
        predict = (output > 0.5).astype(np.uint8)
        acc, rec, prec, f1, auc = get_performance(label, output, predict)
        assert acc == pytest.approx(3 / 5)
        assert rec == pytest.approx(2 / 3)
        assert prec == pytest.approx(2 / 3)
        assert f1 == pytest.approx(2 / 3)
        # ROC-AUC of these scores: pairs (neg, pos): (0.1 vs all 3) wins 3;
        # (0.8 vs 0.9) win, (0.8 vs 0.3) lose, (0.8 vs 0.7) lose -> 4/6
        assert auc == pytest.approx(4 / 6)

    def test_get_performance_degenerate(self):
        label = np.zeros(4)
        output = np.zeros(4)
        predict = np.zeros(4)
        acc, rec, prec, f1, auc = get_performance(label, output, predict)
        assert acc == 1.0
        assert np.isnan(rec) and np.isnan(prec)

    def test_compute_iou(self):
        label = np.array([[0, 1], [1, 1]])
        pred = np.array([[0, 1], [0, 1]])
        assert compute_IoU(label, pred, 1) == pytest.approx(2 / 3, rel=1e-4)
        assert compute_IoU(label, pred, 0) == pytest.approx(1 / 2, rel=1e-4)
        assert compute_mIOU(label, pred, 2) == pytest.approx((2 / 3 + 1 / 2) / 2, rel=1e-4)


class TestLargeCountExactness:
    def test_counts_beyond_f32_precision(self):
        """Multi-chip global batches can put >2^24 pixels in one confusion
        cell; the chunked contraction must count them exactly (regression:
        a single f32 matmul saturates at 16,777,216)."""
        n = 257 * 256 * 256  # 16,842,752 > 2^24
        label = jnp.zeros((257, 256, 256), jnp.int32)
        pred = jnp.zeros((257, 256, 256), jnp.int32)
        cm = np.asarray(confusion_matrix_update(label, pred, 2))
        assert cm[0, 0] == n
        assert cm.sum() == n
