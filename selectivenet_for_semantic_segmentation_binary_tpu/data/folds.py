"""5-fold cross-validation list construction.

Reproduces reference utils/data_utils.py:44-86 exactly:

* training pool = the four non-test folds' ``{i}-fold_tumorable_data.npy`` and
  ``{i}-fold_non_tumorable_data.npy`` lists (each row an
  (input_filename, label_filename) string pair);
* 80/20 train/valid split drawn *separately* for the tumorable and
  non-tumorable lists (class-stratified) via choice-without-replacement;
* test = the held-out fold's two lists stacked.

Seeding: the reference calls ``np.random.seed(42)`` at import time
(data_utils.py:48), so the split depends on global RNG state / import order.
Here the same MT19937 sequence is drawn from a fresh ``RandomState(seed)``
inside ``construct_train_valid`` — identical to what the reference's train.py
process actually sees on its first (only) call, but reproducible regardless of
import order (SURVEY.md §7 risk 7).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def split_train_valid(train_list, valid_ratio: float = 0.2, rs: np.random.RandomState = None):
    """Choice-without-replacement 80/20 split (data_utils.py:50-54)."""
    if rs is None:
        rs = np.random.RandomState(42)
    train_list = np.asarray(train_list)
    total_n = len(train_list)
    valid_idx = rs.choice(total_n, size=int(total_n * valid_ratio), replace=False)
    train_idx = np.setdiff1d(np.arange(total_n), valid_idx)
    return train_list[train_idx], train_list[valid_idx]


def construct_train_valid(
    data_dir: str, test_fold: int = 5, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray]:
    """Build the (train, valid) filename-pair lists (data_utils.py:56-74)."""
    folds = [1, 2, 3, 4, 5]
    folds.remove(test_fold)

    tumorable, non_tumorable = [], []
    for i in folds:
        tumorable.append(np.load(f"{data_dir}/{i}-fold_tumorable_data.npy"))
        non_tumorable.append(np.load(f"{data_dir}/{i}-fold_non_tumorable_data.npy"))

    tumorable = np.concatenate(tumorable)
    non_tumorable = np.concatenate(non_tumorable)

    # one RandomState drawn in the same order as the reference's global RNG:
    # tumorable split first, then non-tumorable (data_utils.py:68-69)
    rs = np.random.RandomState(seed)
    t_train, t_valid = split_train_valid(tumorable, 0.2, rs)
    n_train, n_valid = split_train_valid(non_tumorable, 0.2, rs)

    train = np.vstack([t_train, n_train])
    valid = np.vstack([t_valid, n_valid])
    return train, valid


def construct_test(data_dir: str, test_fold: int = 1) -> np.ndarray:
    """Held-out fold's stacked pair list (data_utils.py:76-86)."""
    tumorable = np.load(f"{data_dir}/{test_fold}-fold_tumorable_data.npy")
    non_tumorable = np.load(f"{data_dir}/{test_fold}-fold_non_tumorable_data.npy")
    return np.vstack([np.asarray(tumorable), np.asarray(non_tumorable)])
