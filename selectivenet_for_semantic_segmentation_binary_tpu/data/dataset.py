"""Patch dataset: JPEG/PNG WSI patch pairs on disk.

Counterpart of reference utils/data_utils.py:174-236 with identical on-disk
contract:

* files live in ``{data_dir}/{patch_mag}x_{patch_size}/``;
* names ``{slide_id}_{x}_{y}_input.jpg`` / ``{slide_id}_{x}_{y}_label.png``;
* input/label pairness asserted by filename-stem equality;
* ``__getitem__``: decode, label -> "L" grayscale, both / 255, input float32,
  label uint8 (so a 0/255 PNG becomes 0/1), optional RGB2GH / H_RGB stain
  conversion, returns ``{"id", "input" (H, W, C) float32, "label" (H, W)}``.

Also provides ``write_synthetic_patch_tree`` — the synthetic fixture generator
used by tests and the benchmark (the reference has no test data; SURVEY.md §4
calls for generated JPEG/PNG patch trees).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from .stain import H_RGB, RGB2GH


class PatchDataset:
    """Map-style dataset of (input JPEG, label PNG) patch pairs."""

    def __init__(
        self,
        data_dir: str,
        data_list: Sequence,
        patch_mag: int = 200,
        patch_size: int = 256,
        input_type: str = "RGB",
        transform=None,
        decoder: str = "auto",
    ):
        """decoder: 'auto' uses the native C++ libjpeg/libpng decoder
        (native/patch_decoder.cpp) when buildable, falling back to PIL;
        'pil' forces PIL; 'native' requires the native decoder."""
        self.data_dir = data_dir
        self.data_list = data_list
        self.transform = transform
        self.input_type = input_type
        self.patch_mag = patch_mag
        self.patch_size = patch_size

        if decoder == "auto":
            from . import native_decoder

            self._use_native = native_decoder.available()
        elif decoder == "native":
            from . import native_decoder

            if not native_decoder.available():
                raise RuntimeError("native decoder requested but unavailable")
            self._use_native = True
        else:
            self._use_native = False

        input_list, label_list = [], []
        for f in data_list:
            assert f[0].split("_input")[0] == f[1].split("_label")[0], (
                f"input/label filename stems differ: {f[0]} vs {f[1]}"
            )
            input_list.append(f[0])
            label_list.append(f[1])
        self.input_list = input_list
        self.label_list = label_list

    def __len__(self) -> int:
        return len(self.input_list)

    @property
    def patch_dir(self) -> str:
        return os.path.join(self.data_dir, f"{self.patch_mag}x_{self.patch_size}")

    def get_raw(self, index: int):
        """Raw decode for the device-side preprocessing path: input uint8 RGB
        (unscaled), label uint8 {0, 1}; no stain conversion, no transforms.
        Host work reduces to pure (GIL-released) decode, and the batch ships
        to the device at 1/4 the float32 transfer size."""
        inp_path = os.path.join(self.patch_dir, self.input_list[index])
        lab_path = os.path.join(self.patch_dir, self.label_list[index])
        if self._use_native:
            from . import native_decoder

            try:
                return native_decoder.decode_patch_pair_u8(
                    inp_path, lab_path, self.patch_size
                )
            except RuntimeError:
                pass  # odd file -> PIL below
        # convert("RGB"): the odd files the native decoder punts here
        # (grayscale, CMYK, palette PNGs) must still come back (H, W, 3)
        # or batch assembly fails mid-epoch on a shape mismatch
        inp = np.asarray(Image.open(inp_path).convert("RGB"), dtype=np.uint8)
        lab = (np.asarray(Image.open(lab_path).convert("L")) / 255.0).astype(np.uint8)
        return inp, lab

    def __getitem__(self, index: int, rng: Optional[np.random.Generator] = None):
        assert len(self.input_list) == len(self.label_list)
        assert (
            self.input_list[index].split("_input")[0]
            == self.label_list[index].split("_label")[0]
        ), (
            f"unpaired entry at index {index}: "
            f"{self.input_list[index]} vs {self.label_list[index]}"
        )

        inp_path = os.path.join(self.patch_dir, self.input_list[index])
        lab_path = os.path.join(self.patch_dir, self.label_list[index])

        if self._use_native:
            from . import native_decoder

            try:
                inp, lab = native_decoder.decode_patch_pair(
                    inp_path, lab_path, self.patch_size
                )
            except RuntimeError:
                inp = lab = None  # odd file (size mismatch, CMYK, ...) -> PIL
        else:
            inp = lab = None

        if inp is None:
            inp = Image.open(inp_path).convert("RGB")  # see get_raw
            lab = Image.open(lab_path).convert("L")
            inp = np.asarray(inp, dtype=np.float32) / 255.0
            lab = (np.asarray(lab) / 255.0).astype(np.uint8)

        if self.input_type == "GH":
            inp = RGB2GH(inp)
        elif self.input_type == "H_RGB":
            inp = H_RGB(inp)

        data = {
            "id": self.input_list[index].split("_input")[0],
            "input": inp,
            "label": lab,
        }
        if self.transform:
            if rng is None:
                rng = np.random.default_rng()
            data = self.transform(data, rng)
        return data


def _smooth_field(rng, patch_size: int, coarse: int = 8) -> np.ndarray:
    """Low-frequency random field in roughly [-1, 1]: coarse Gaussian noise
    bilinearly upsampled to (patch_size, patch_size)."""
    grid = rng.standard_normal((coarse, coarse)).astype(np.float32)
    img = Image.fromarray(grid, mode="F").resize(
        (patch_size, patch_size), Image.BILINEAR
    )
    return np.asarray(img)


def write_hard_synthetic_patch_tree(
    data_dir: str,
    n_slides: int = 4,
    patches_per_slide: int = 100,
    patch_mag: int = 200,
    patch_size: int = 256,
    ambiguous_level: float = 0.17,
    camo_level: float = 0.035,
    seed: int = 0,
    n_folds: int = 5,
) -> None:
    """Reference-layout synthetic dataset with IRREDUCIBLE localized error —
    the benchmark for the selective-prediction claim.

    The easy generator (below) is color-separable, so every model saturates
    and the reference's headline ordering — in-coverage metrics beat the
    non-selective model (reference README.md:84-86) — cannot be exhibited.
    Here each patch is partitioned by smooth random fields into three zones:

    * benign tissue: pale pink texture, label 0;
    * lesion: distinct purple texture, label 1;
    * **ambiguous**: its own third appearance, but its label follows a HIDDEN
      random field that leaves no trace in the pixels — irreducible ~50%
      error wherever it occurs (~20% of pixels at the default level, sized to
      sit inside the selective objective's 0.8 target coverage).

    A plain model's accuracy is capped by the ambiguous mass; a selective
    model can learn to reject exactly those pixels, so in-coverage metrics
    recover toward the clean-zone ceiling.

    ``camo_level`` additionally plants CAMOUFLAGED ambiguity (~4% of pixels
    at the default): regions whose label follows another hidden field while
    their appearance stays exactly that of their host zone. No pixel trace
    exists, so even a perfect selection head ACCEPTS them — a tunable
    irreducible in-coverage error (~camo_mass/2) that keeps accepted-region
    metrics in the regime the reference's published numbers occupy
    (in-coverage accuracy 0.9839 / mIoU 0.9612, README.md:85) instead of
    saturating at ~1.0 the way the round-3 grid did (docs/artifacts/sweep_r3).
    Set camo_level=0.0 for the round-3 behavior.

    scripts/selective_benchmark.py runs the full comparison; fold npy
    classification uses the reference's 10%-of-pixels tumorable rule
    (tumor_label-based_data_split.ipynb cell 0).
    """
    rng = np.random.default_rng(seed)
    patch_dir = os.path.join(data_dir, f"{patch_mag}x_{patch_size}")
    os.makedirs(patch_dir, exist_ok=True)

    benign_rgb = np.array([222.0, 192.0, 205.0])
    lesion_rgb = np.array([158.0, 92.0, 148.0])
    ambig_rgb = np.array([190.0, 142.0, 176.0])

    tumorable, non_tumorable = [], []
    for s in range(n_slides):
        for p in range(patches_per_slide):
            x, y = 256 * p, 512 * p
            stem = f"slide{s:02d}_{x}_{y}"

            lesion_zone = _smooth_field(rng, patch_size) > rng.uniform(-0.2, 0.8)
            ambiguous = np.abs(_smooth_field(rng, patch_size)) < ambiguous_level
            hidden = _smooth_field(rng, patch_size) > 0.0  # invisible to the image
            # camouflaged ambiguity: label flips with NO appearance change —
            # the image loop below keys on (lesion_zone, ambiguous) only, so
            # camo pixels render exactly like their host zone
            camo = ((~ambiguous)
                    & (np.abs(_smooth_field(rng, patch_size)) < camo_level))
            hidden2 = _smooth_field(rng, patch_size) > 0.0

            label01 = np.where(ambiguous, hidden,
                               np.where(camo, hidden2, lesion_zone))

            img = np.empty((patch_size, patch_size, 3), np.float32)
            for zone, color in (
                (~lesion_zone & ~ambiguous, benign_rgb),
                (lesion_zone & ~ambiguous, lesion_rgb),
                (ambiguous, ambig_rgb),  # appearance independent of `hidden`
            ):
                img[zone] = color + 12.0 * rng.standard_normal((int(zone.sum()), 3))
            img = np.clip(img, 0, 255)

            Image.fromarray(img.astype(np.uint8)).save(
                os.path.join(patch_dir, f"{stem}_input.jpg"), quality=92
            )
            Image.fromarray((label01 * 255).astype(np.uint8)).save(
                os.path.join(patch_dir, f"{stem}_label.png")
            )

            pair = (f"{stem}_input.jpg", f"{stem}_label.png")
            is_tumorable = label01.mean() > 0.1  # the reference's 10% rule
            (tumorable if is_tumorable else non_tumorable).append(pair)

    _write_fold_npys(data_dir, tumorable, non_tumorable, n_folds)


def write_synthetic_patch_tree(
    data_dir: str,
    n_slides: int = 2,
    patches_per_slide: int = 8,
    patch_mag: int = 200,
    patch_size: int = 64,
    tumor_fraction: float = 0.5,
    seed: int = 0,
    n_folds: int = 5,
) -> None:
    """Generate a reference-layout synthetic dataset incl. fold npy files.

    Creates ``{data_dir}/{patch_mag}x_{patch_size}/`` with JPEG inputs whose
    tumor regions are reddish tissue on a pale background, PNG labels (0/255),
    plus ``{i}-fold_{non_}tumorable_data.npy`` pair lists for all folds — the
    exact inputs construct_train_valid/construct_test consume.
    """
    rng = np.random.default_rng(seed)
    patch_dir = os.path.join(data_dir, f"{patch_mag}x_{patch_size}")
    os.makedirs(patch_dir, exist_ok=True)

    tumorable, non_tumorable = [], []
    for s in range(n_slides):
        for p in range(patches_per_slide):
            x, y = 256 * p, 512 * p
            stem = f"slide{s:02d}_{x}_{y}"
            is_tumor = rng.random() < tumor_fraction

            # pale tissue-like background with stain-colored texture
            img = np.clip(
                220 + 20 * rng.standard_normal((patch_size, patch_size, 3)), 0, 255
            )
            label = np.zeros((patch_size, patch_size), np.uint8)
            if is_tumor:
                h = patch_size // 2
                cy, cx = rng.integers(0, patch_size - h, 2)
                label[cy : cy + h, cx : cx + h] = 255
                img[cy : cy + h, cx : cx + h] = np.clip(
                    np.array([150.0, 60.0, 120.0])
                    + 25 * rng.standard_normal((h, h, 3)),
                    0,
                    255,
                )

            Image.fromarray(img.astype(np.uint8)).save(
                os.path.join(patch_dir, f"{stem}_input.jpg"), quality=92
            )
            Image.fromarray(label).save(os.path.join(patch_dir, f"{stem}_label.png"))

            pair = (f"{stem}_input.jpg", f"{stem}_label.png")
            (tumorable if is_tumor else non_tumorable).append(pair)

    _write_fold_npys(data_dir, tumorable, non_tumorable, n_folds)


def _write_fold_npys(data_dir: str, tumorable, non_tumorable, n_folds: int) -> None:
    for class_name, pairs in (("tumorable", tumorable), ("non_tumorable", non_tumorable)):
        for i in range(n_folds):
            fold_pairs = pairs[i::n_folds]
            if not fold_pairs:  # keep npy 2-D even when a fold is empty
                arr = np.empty((0, 2), dtype="<U64")
            else:
                arr = np.array(fold_pairs)
            np.save(os.path.join(data_dir, f"{i + 1}-fold_{class_name}_data.npy"), arr)
