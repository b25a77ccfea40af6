"""Preprocessing and augmentation transforms.

Counterparts of reference utils/data_utils.py:94-168, re-designed for an
explicit-RNG, NHWC pipeline:

* every transform is ``__call__(data, rng)`` with a ``numpy.random.Generator``
  (the reference draws from the *global* numpy RNG inside DataLoader worker
  processes, which is irreproducible; explicit generators make augmentation
  deterministic per (seed, epoch, sample));
* arrays stay NHWC float32 end to end — there is no ToTensor/CHW transpose
  because NHWC is the TPU-native layout (``ToArray`` exists for API parity and
  only finalizes dtypes);
* ``PartialNonTissue`` fixes the reference's 2-D-label indexing bug
  (data_utils.py:143-152 indexes ``label[..., :]`` with 3 axes on a 2-D label)
  and its rotation-branch duplication (branches 1 and 4 both overwrite the
  same quadrant), keeping the documented intent: with probability 1/4, one
  random quadrant is replaced by synthetic white-noise non-tissue
  ~ N(0.96, 0.005^2) clipped to [0, 1] and its label zeroed.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np

Data = Dict[str, np.ndarray]


class Compose:
    """Sequential transform application with a shared RNG."""

    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        for t in self.transforms:
            data = t(data, rng)
        return data


class Normalization:
    """input <- (input - mean) / std (reference data_utils.py:94-106)."""

    def __init__(self, mean: float = 0.5, std: float = 0.5):
        self.mean = mean
        self.std = std

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        data["input"] = (data["input"] - self.mean) / self.std
        return data


class RandomFlip:
    """Independent 50% left-right and up-down flips (data_utils.py:108-125)."""

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        label, inp = data["label"], data["input"]
        if rng.random() > 0.5:
            label = np.fliplr(label)
            inp = np.fliplr(inp)
        if rng.random() > 0.5:
            label = np.flipud(label)
            inp = np.flipud(inp)
        data["input"] = np.ascontiguousarray(inp)
        data["label"] = np.ascontiguousarray(label)
        return data


class PartialNonTissue:
    """Overwrite one random quadrant with synthetic non-tissue noise
    (data_utils.py:127-157; unused by the reference train.py but part of the
    public transform surface)."""

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        label, inp = data["label"], data["input"]
        size = inp.shape[0]
        ch = inp.shape[2]
        half = size // 2

        if rng.integers(1, 5) == 1:
            non_tissue = np.clip(
                0.96 + 0.005 * rng.standard_normal((half, half, ch)), 0.0, 1.0
            ).astype(inp.dtype)
            quadrant = int(rng.integers(0, 4))
            ys = slice(0, half) if quadrant in (0, 1) else slice(half, size)
            xs = slice(0, half) if quadrant in (0, 2) else slice(half, size)
            inp = inp.copy()
            label = label.copy()
            inp[ys, xs, :] = non_tissue
            label[ys, xs] = 0

        data["input"] = inp
        data["label"] = label
        return data


class BlankfieldCorrection:
    """Blank-field (white-balance) correction: rescale each channel by its
    estimated background white point so non-tissue regions become neutral
    white.

    Reconstructs the "BC" preprocessing variant of the reference's experiment
    grid (u-net_testing.ipynb cells 21-60 evaluate 'Blankfield-corrected'
    models; the notebook that implemented it, check_preprocessing.ipynb, is
    stripped from the repo — .MISSING_LARGE_BLOBS:1). White point = the
    ``percentile``-th per-channel value (background pixels dominate the bright
    tail of WSI patches); output = clip(rgb / whitepoint, 0, 1).
    """

    def __init__(self, percentile: float = 95.0, min_white: float = 0.5):
        self.percentile = percentile
        self.min_white = min_white  # guards all-tissue patches with no background

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        inp = data["input"]
        white = np.percentile(inp.reshape(-1, inp.shape[-1]), self.percentile, axis=0)
        white = np.maximum(white, self.min_white)
        data["input"] = np.clip(inp / white, 0.0, 1.0).astype(inp.dtype)
        return data


class ToArray:
    """Finalize dtypes: input float32 NHWC, label int64 (replaces the
    reference's ToTensor CHW transpose, data_utils.py:159-168 — NHWC stays)."""

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        data["input"] = np.ascontiguousarray(data["input"], dtype=np.float32)
        data["label"] = np.ascontiguousarray(data["label"]).astype(np.int64)
        return data


# name alias for drop-in familiarity with the reference pipeline
ToTensor = ToArray
