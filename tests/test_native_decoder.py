"""Native C++ decoder tests: build, decode parity with PIL, error paths,
dataset integration, and a loader throughput sanity run."""

import os
import time

import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.data import (
    PatchDataset,
    PatchLoader,
    construct_test,
    write_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.data import native_decoder


@pytest.fixture(scope="module")
def patch_tree(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_data")
    write_synthetic_patch_tree(str(d), n_slides=2, patches_per_slide=10, patch_size=64)
    return str(d)


needs_native = pytest.mark.skipif(
    not native_decoder.available(), reason="native decoder not buildable here"
)


class TestNativeDecoder:
    @needs_native
    def test_decode_matches_pil(self, patch_tree):
        test = construct_test(patch_tree, test_fold=1)
        ds_pil = PatchDataset(patch_tree, test, patch_size=64, decoder="pil")
        ds_nat = PatchDataset(patch_tree, test, patch_size=64, decoder="native")
        for i in range(min(4, len(ds_pil))):
            a, b = ds_pil[i], ds_nat[i]
            # JPEG decoders may differ by a few ULP of IDCT rounding; labels
            # are PNG (lossless) and must match exactly
            np.testing.assert_allclose(b["input"], a["input"], atol=2.5 / 255.0)
            np.testing.assert_array_equal(b["label"], a["label"])
            assert b["input"].dtype == np.float32
            assert b["label"].dtype == np.uint8

    @needs_native
    def test_size_mismatch_raises(self, patch_tree):
        test = construct_test(patch_tree, test_fold=1)
        ds = PatchDataset(patch_tree, test, patch_size=64)
        inp = os.path.join(ds.patch_dir, ds.input_list[0])
        lab = os.path.join(ds.patch_dir, ds.label_list[0])
        with pytest.raises(RuntimeError, match="code -4"):
            native_decoder.decode_patch_pair(inp, lab, 32)

    @needs_native
    def test_missing_file_raises(self):
        with pytest.raises(RuntimeError, match="code -2"):
            native_decoder.decode_patch_pair("/nonexistent.jpg", "/nonexistent.png", 64)

    @needs_native
    def test_corrupt_png_mid_read_raises(self, patch_tree, tmp_path):
        """A PNG truncated inside its IDAT stream errors out of png_read_row
        via longjmp; the decoder must report -6 cleanly (and free its row
        buffer — the historical leak was once per corrupt file). Loop to
        exercise the longjmp cleanup path repeatedly."""
        from PIL import Image

        rng = np.random.default_rng(0)
        # noisy mask so the IDAT stream is large enough to truncate mid-data
        noisy = (rng.integers(0, 2, (64, 64)) * 255).astype(np.uint8)
        good_png = tmp_path / "good_label.png"
        Image.fromarray(noisy).save(good_png)
        raw = good_png.read_bytes()
        bad_png = tmp_path / "bad_label.png"
        bad_png.write_bytes(raw[: int(len(raw) * 0.6)])

        test = construct_test(patch_tree, test_fold=1)
        ds = PatchDataset(patch_tree, test, patch_size=64)
        inp = os.path.join(ds.patch_dir, ds.input_list[0])
        for _ in range(20):
            with pytest.raises(RuntimeError, match="code -6"):
                native_decoder.decode_patch_pair(inp, str(bad_png), 64)
        # a good pair still decodes after repeated error recoveries
        native_decoder.decode_patch_pair(
            inp, os.path.join(ds.patch_dir, ds.label_list[0]), 64
        )

    @needs_native
    def test_auto_dataset_uses_native_and_falls_back(self, patch_tree, tmp_path):
        """'auto' must survive an undecodable file by falling back to PIL —
        here a patch whose real size disagrees with patch_size still loads
        via PIL (native refuses with -4)."""
        from PIL import Image

        d = tmp_path / "odd"
        pd = d / "200x_64"
        pd.mkdir(parents=True)
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(pd / "s_0_0_input.jpg")
        Image.fromarray(np.zeros((32, 32), np.uint8)).save(pd / "s_0_0_label.png")
        ds = PatchDataset(
            str(d), [("s_0_0_input.jpg", "s_0_0_label.png")], patch_size=64, decoder="auto"
        )
        sample = ds[0]  # PIL fallback returns the true 32x32 size
        assert sample["input"].shape == (32, 32, 3)

    @needs_native
    def test_loader_end_to_end_native(self, patch_tree):
        test = construct_test(patch_tree, test_fold=1)
        ds = PatchDataset(patch_tree, test, patch_size=64, decoder="native")
        loader = PatchLoader(ds, batch_size=4, num_workers=4)
        batches = list(loader)
        assert sum(b["nvalid"] for b in batches) == len(ds)

    def test_pil_mode_always_works(self, patch_tree):
        test = construct_test(patch_tree, test_fold=1)
        ds = PatchDataset(patch_tree, test, patch_size=64, decoder="pil")
        assert ds[0]["input"].shape == (64, 64, 3)


class TestReviewRegressions:
    @needs_native
    def test_rgb_color_label_matches_pil(self, patch_tree, tmp_path):
        """An RGB (color-typed) binary mask decodes through the rgb_to_gray
        path with ITU-601 weights — identical to PIL convert('L') for the
        0/255 masks this pipeline stores."""
        from PIL import Image

        h = w = 64
        rng = np.random.default_rng(0)
        mask = (rng.random((h, w)) > 0.5).astype(np.uint8) * 255
        rgb = np.stack([mask] * 3, axis=-1)
        lab_path = str(tmp_path / "rgb_label.png")
        Image.fromarray(rgb, mode="RGB").save(lab_path)
        ds = PatchDataset(patch_tree, construct_test(patch_tree, 1),
                          patch_size=64)
        inp_path = os.path.join(ds.patch_dir, ds.input_list[0])
        _, lab = native_decoder.decode_patch_pair(inp_path, lab_path, 64)
        pil = (np.asarray(Image.open(lab_path).convert("L")) / 255.0
               ).astype(np.uint8)
        np.testing.assert_array_equal(lab, pil)

    @needs_native
    def test_label_failure_names_label_path(self, patch_tree, tmp_path):
        """PNG-stage error codes (-5..-8) must point the user at the label
        file, not the JPEG."""
        ds = PatchDataset(patch_tree, construct_test(patch_tree, 1),
                          patch_size=64)
        inp_path = os.path.join(ds.patch_dir, ds.input_list[0])
        missing = str(tmp_path / "nope_label.png")
        with pytest.raises(RuntimeError, match="nope_label.png"):
            native_decoder.decode_patch_pair(inp_path, missing, 64)

    @needs_native
    def test_stale_library_is_refused_when_rebuild_fails(self, monkeypatch):
        """A stale .so after a failed rebuild must degrade to PIL with a
        warning — silently serving outdated native code can produce wrong
        pixels with no error."""
        import warnings as _warnings

        src = os.path.join(native_decoder._NATIVE_DIR, "patch_decoder.cpp")
        so = native_decoder._SO_PATH
        old_lib, old_failed = native_decoder._lib, native_decoder._build_failed
        st = os.stat(so)
        try:
            native_decoder._lib = None
            native_decoder._build_failed = False
            os.utime(so, (st.st_atime, os.path.getmtime(src) - 10))
            monkeypatch.setattr(native_decoder, "_build", lambda: False)
            with pytest.warns(RuntimeWarning, match="stale"):
                assert native_decoder._load() is None
            assert native_decoder._build_failed
        finally:
            os.utime(so, (st.st_atime, st.st_mtime))
            native_decoder._lib = old_lib
            native_decoder._build_failed = old_failed

    @needs_native
    def test_build_is_atomic_no_droppings(self, tmp_path):
        """_build publishes via temp-file + os.replace; no .build.* leftovers
        remain next to the library."""
        leftovers = [f for f in os.listdir(native_decoder._NATIVE_DIR)
                     if ".build." in f]
        assert leftovers == []
