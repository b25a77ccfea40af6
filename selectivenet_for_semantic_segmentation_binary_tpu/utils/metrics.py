"""Confusion-matrix evaluator and scalar segmentation metrics.

API-compatible counterpart of reference utils/compute_metric.py:

* ``Evaluator``      <- compute_metric.py:4-84 (same getter names and formulas:
  Pixel_Accuracy, Pixel_Accuracy_Class, Precision (column-sum), Recall
  (row-sum), F1, mIoU, IoU_Class, FWIoU, Dice; selective mode masks counting to
  pixels with selection == 1, compute_metric.py:17-18)
* ``get_performance``<- compute_metric.py:93-148 (flattened index-set TP/TN/FP/FN
  accuracy/recall/precision/F1 + ROC-AUC)
* ``compute_IoU`` / ``compute_mIOU`` <- compute_metric.py:150-168

TPU-first difference: ``add_batch`` accepts either numpy arrays *or* jax arrays,
and the per-batch bincount runs on the accelerator via
ops.confusion.confusion_matrix_update when given device arrays — the reference
instead syncs every batch to host numpy (train.py:211-239). The accumulated
matrix itself is a tiny (C, C) float64 host array, transferred once per call.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.confusion import confusion_matrix_update


def _is_jax_array(x) -> bool:
    return type(x).__module__.startswith("jax")


class Evaluator:
    """Streaming confusion-matrix metrics (reference compute_metric.py:4-84)."""

    def __init__(self, num_class: int, selective: bool = False):
        self.num_class = num_class
        self.selective = selective
        self.confusion_matrix = np.zeros((num_class, num_class), dtype=np.float64)

    # -- accumulation ------------------------------------------------------
    def _generate_matrix(self, label, pred, selection=None) -> np.ndarray:
        label = np.asarray(label)
        pred = np.asarray(pred)
        mask = (label >= 0) & (label < self.num_class)
        if self.selective:
            mask = mask & (np.asarray(selection) == 1)
        flat = self.num_class * label[mask].astype(np.int64) + pred[mask].astype(np.int64)
        count = np.bincount(flat, minlength=self.num_class ** 2)
        return count.reshape(self.num_class, self.num_class)

    def add_batch(self, label, pred, selection=None) -> None:
        assert np.shape(label) == np.shape(pred)
        if _is_jax_array(label) or _is_jax_array(pred):
            sel = selection if self.selective else None
            cm = np.asarray(confusion_matrix_update(label, pred, self.num_class, sel))
        else:
            cm = self._generate_matrix(label, pred, selection=selection)
        self.confusion_matrix += cm

    def add_confusion_matrix(self, cm) -> None:
        """Accumulate a precomputed (C, C) count matrix (the on-device path:
        jitted train/eval steps return their batch matrix directly)."""
        self.confusion_matrix += np.asarray(cm, dtype=np.float64)

    def reset(self) -> None:
        self.confusion_matrix = np.zeros((self.num_class, self.num_class), dtype=np.float64)

    # -- getters (names preserved from the reference) -----------------------
    def Confusion_Matrix(self) -> np.ndarray:
        print(self.confusion_matrix)
        return self.confusion_matrix

    def get_Pixel_Accuracy(self) -> float:
        cm = self.confusion_matrix
        return float(np.diag(cm).sum() / cm.sum())

    def get_Pixel_Accuracy_Class(self) -> float:
        with np.errstate(divide="ignore", invalid="ignore"):
            acc = np.diag(self.confusion_matrix) / self.confusion_matrix.sum(axis=1)
        return float(np.nanmean(acc))

    def get_Pixel_Accuracy_Class_S(self) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.diag(self.confusion_matrix) / self.confusion_matrix.sum(axis=1)

    def get_Precision(self) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.diag(self.confusion_matrix) / self.confusion_matrix.sum(axis=0)

    def get_Recall(self) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.diag(self.confusion_matrix) / self.confusion_matrix.sum(axis=1)

    def get_F1_Score(self, prec, recall) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            return 2 * (prec * recall) / (prec + recall)

    def _iou(self) -> np.ndarray:
        cm = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm))

    def get_mIoU(self) -> float:
        return float(np.nanmean(self._iou()))

    def get_IoU_Class(self) -> np.ndarray:
        return self._iou()

    def get_FWIoU(self) -> float:
        cm = self.confusion_matrix
        freq = cm.sum(axis=1) / cm.sum()
        iu = self._iou()
        return float((freq[freq > 0] * iu[freq > 0]).sum())

    def get_Dice_Score(self) -> np.ndarray:
        cm = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"):
            return 2 * np.diag(cm) / (cm.sum(axis=1) + cm.sum(axis=0))


def get_performance(label, output, predict, isprint: bool = False):
    """Pixel-level accuracy/recall/precision/F1/AUC of one patch or WSI
    (reference compute_metric.py:93-148).

    Args:
        label: ground truth mask in {0, 1}.
        output: continuous scores (for ROC-AUC).
        predict: binarized prediction in {0, 1}.
    Returns:
        (accuracy, recall, precision, f1_score, auc_score); undefined values NaN.
    """
    label = np.asarray(label).flatten()
    output = np.asarray(output).flatten()
    predict = np.asarray(predict).flatten()

    c1 = int((label == 1).sum())
    c0 = int((label == 0).sum())
    tp = int(((label == 1) & (predict == 1)).sum())
    tn = int(((label == 0) & (predict == 0)).sum())
    p1 = int((predict == 1).sum())

    accuracy = (tp + tn) / (c1 + c0)

    recall = tp / c1 if c1 != 0 else np.nan
    precision = tp / p1 if p1 != 0 else np.nan
    f1_score = np.nan
    if not np.isnan(recall) and not np.isnan(precision) and (recall + precision) != 0:
        f1_score = 2 * recall * precision / (recall + precision)

    try:
        from sklearn.metrics import roc_auc_score

        auc_score = roc_auc_score(label, output)
    except Exception:
        auc_score = np.nan

    if isprint:
        print(
            f"accuracy: {accuracy:.3f} | recall: {recall:.3f} | precision: {precision:.3f}"
            f" | f1 score: {f1_score:.3f} | AUC score: {auc_score:.3f}"
        )
    return accuracy, recall, precision, f1_score, auc_score


def compute_IoU(label, pred, index, EPS: float = 1e-6) -> float:
    """Single-class IoU with epsilon smoothing (compute_metric.py:150-161)."""
    tl = (np.asarray(label) == index)
    tp = (np.asarray(pred) == index)
    intersect = float((tl & tp).sum())
    union = float((tl | tp).sum())
    return (intersect + EPS) / (union + EPS)


def compute_mIOU(label, pred, n_class: int = 2) -> float:
    """Mean IoU over classes (compute_metric.py:163-168)."""
    return sum(compute_IoU(label, pred, i) for i in range(n_class)) / float(n_class)
