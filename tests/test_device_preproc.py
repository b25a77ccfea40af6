"""Device-side preprocessing path: uint8 transfer + on-device normalize/flip.

Equivalence contract: for the same decoded pixels and the same flip decisions,
the device path (raw uint8 -> device_preprocess) must produce exactly the
tensors the host path (PIL float /255 -> Normalization -> RandomFlip ->
ToArray) produces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
from selectivenet_for_semantic_segmentation_binary_tpu.data import (
    Compose,
    Normalization,
    PatchDataset,
    PatchLoader,
    RandomFlip,
    ToArray,
    construct_test,
    construct_train_valid,
    write_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.parallel import make_mesh
from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
    device_preprocess,
    make_loaders,
    train,
)


@pytest.fixture(scope="module")
def patch_tree(tmp_path_factory):
    d = tmp_path_factory.mktemp("devpre")
    write_synthetic_patch_tree(str(d), n_slides=2, patches_per_slide=12, patch_size=32)
    return str(d)


class TestDevicePreprocessMath:
    def test_normalize_matches_host(self, rng):
        raw = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8)
        x, _ = device_preprocess({
            "input": jnp.asarray(raw),
            "label": jnp.zeros((2, 16, 16), jnp.uint8),
        })
        expected = (raw.astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-6, atol=1e-7)

    @pytest.mark.parametrize("flips", [(0, 0), (1, 0), (0, 1), (1, 1)])
    def test_flips_match_host_randomflip(self, rng, flips):
        raw = rng.integers(0, 256, (1, 8, 8, 3)).astype(np.uint8)
        lab = rng.integers(0, 2, (1, 8, 8)).astype(np.uint8)
        x, y = device_preprocess({
            "input": jnp.asarray(raw),
            "label": jnp.asarray(lab),
            "flips": jnp.asarray(np.array([flips], np.uint8)),
        })
        # host reference: same decisions applied with numpy flips
        e = (raw[0].astype(np.float32) / 255.0 - 0.5) / 0.5
        el = lab[0].astype(np.int32)
        if flips[0]:
            e, el = np.fliplr(e), np.fliplr(el)
        if flips[1]:
            e, el = np.flipud(e), np.flipud(el)
        np.testing.assert_allclose(np.asarray(x[0]), e, rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(y[0]), el)

    def test_float_batches_pass_through(self, rng):
        f = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
        x, y = device_preprocess({
            "input": jnp.asarray(f), "label": jnp.zeros((1, 8, 8), jnp.int32)
        })
        np.testing.assert_array_equal(np.asarray(x), f)


class TestRawLoader:
    def test_batch_contract(self, patch_tree):
        test = construct_test(patch_tree, test_fold=1)
        ds = PatchDataset(patch_tree, test, patch_size=32)
        loader = PatchLoader(ds, batch_size=4, device_preproc=True, random_flip=True,
                             num_workers=2, drop_last=False)
        b = next(iter(loader))
        assert b["input"].dtype == np.uint8
        assert b["label"].dtype == np.uint8
        assert b["flips"].shape == (4, 2)
        assert b["input"].shape == (4, 32, 32, 3)

    def test_raw_pixels_match_host_pipeline(self, patch_tree):
        """uint8 + device math == host float pipeline for the same sample."""
        test = construct_test(patch_tree, test_fold=1)
        ds_raw = PatchDataset(patch_tree, test, patch_size=32)
        tf = Compose([Normalization(0.5, 0.5), ToArray()])
        ds_host = PatchDataset(patch_tree, test, patch_size=32, transform=tf)

        raw_inp, raw_lab = ds_raw.get_raw(0)
        x, y = device_preprocess({
            "input": jnp.asarray(raw_inp[None]),
            "label": jnp.asarray(raw_lab[None]),
        })
        host = ds_host.__getitem__(0, rng=np.random.default_rng(0))
        np.testing.assert_allclose(np.asarray(x[0]), host["input"], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(y[0]), host["label"])

    def test_padding_uses_255(self, patch_tree):
        test = construct_test(patch_tree, test_fold=1)
        ds = PatchDataset(patch_tree, test, patch_size=32)
        loader = PatchLoader(ds, batch_size=5, device_preproc=True, num_workers=2)
        last = list(loader)[-1]
        if last["nvalid"] < 5:
            assert np.all(np.asarray(last["label"][last["nvalid"]:]) == 255)


class TestEndToEnd:
    def test_train_device_preproc_smoke(self, patch_tree, tmp_path):
        cfg = TrainConfig(
            data_dir=patch_tree, model_dir=str(tmp_path / "m"), fold=1,
            patch_size=32, batch_size=8, n_epoch=2, model_arch="UNet_B",
            loss="BCElogit", selective=True, s_lamb=2.0, compute_dtype="float32",
            num_workers=2, local_rank=[0, 1], device_preproc=True,
        )
        result = train(cfg, verbose=False)
        assert np.isfinite(result["train"].loss)
        assert result["train"].sel_loss >= 0.0

    def test_make_loaders_falls_back_for_gh(self, patch_tree, tmp_path):
        """GH stain math needs host floats -> raw mode must auto-disable."""
        cfg = TrainConfig(data_dir=patch_tree, model_dir=str(tmp_path / "m2"),
                          fold=1, patch_size=32, batch_size=8, input_type="GH",
                          device_preproc=True)
        mesh = make_mesh(1)
        lt, lv = make_loaders(cfg, mesh)
        assert lt.device_preproc is False

    def test_eval_device_preproc(self, patch_tree, tmp_path):
        from selectivenet_for_semantic_segmentation_binary_tpu.config import EvalConfig
        from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import evaluate
        import glob, shutil

        cfg = TrainConfig(
            data_dir=patch_tree, model_dir=str(tmp_path / "m3"), fold=1,
            patch_size=32, batch_size=8, n_epoch=1, model_arch="UNet_B",
            loss="BCElogit", selective=True, compute_dtype="float32",
            num_workers=2, device_preproc=True,
        )
        train(cfg, verbose=False)
        single = tmp_path / "single"
        single.mkdir()
        shutil.copy(sorted(glob.glob(f"{cfg.ckpt_dir}/*.ckpt"))[-1], single)

        ecfg = EvalConfig(
            data_dir=patch_tree, test_fold=1, patch_size=32, batch_size=8,
            model_dir=str(single), model_arch=["UNet_B"], selective=True,
            select_eval=True, compute_dtype="float32", num_workers=2,
            device_preproc=True,
        )
        results = evaluate(ecfg, verbose=False)
        assert np.isfinite(results["accuracy"]) or results["confusion_matrix"].sum() == 0

    def test_device_vs_host_pipeline_same_eval_metrics(self, patch_tree, tmp_path):
        """Same checkpoint, evaluated through the raw-uint8 and host-float
        pipelines, must produce identical confusion matrices."""
        from selectivenet_for_semantic_segmentation_binary_tpu.config import EvalConfig
        from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import evaluate
        import glob, shutil

        cfg = TrainConfig(
            data_dir=patch_tree, model_dir=str(tmp_path / "m4"), fold=1,
            patch_size=32, batch_size=8, n_epoch=1, model_arch="UNet_B",
            loss="BCElogit", selective=False, compute_dtype="float32",
            num_workers=2,
        )
        train(cfg, verbose=False)
        single = tmp_path / "single4"
        single.mkdir()
        shutil.copy(sorted(glob.glob(f"{cfg.ckpt_dir}/*.ckpt"))[-1], single)

        base = dict(
            data_dir=patch_tree, test_fold=1, patch_size=32, batch_size=8,
            model_dir=str(single), model_arch=["UNet_B"], selective=False,
            compute_dtype="float32", num_workers=2,
        )
        r_dev = evaluate(EvalConfig(**base, device_preproc=True), verbose=False)
        r_host = evaluate(EvalConfig(**base, device_preproc=False), verbose=False)
        np.testing.assert_array_equal(
            r_dev["confusion_matrix"], r_host["confusion_matrix"]
        )
