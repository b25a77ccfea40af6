"""Predictor (serving API) tests: checkpoint -> folded jitted inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.predictor import Predictor
from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture(scope="module")
def ckpt_selective(tmp_path_factory):
    d = tmp_path_factory.mktemp("pred_ckpt")
    model = build_model("UNet_B", selective=True, compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    variables = jax.device_get(variables)
    save_checkpoint(str(d), {"net": {
        "params": variables["params"], "batch_stats": variables["batch_stats"],
    }, "epoch": 1}, 1)
    return str(d) + "/model_epoch1.ckpt", variables


class TestPredictor:
    def test_predict_shapes_and_ranges(self, ckpt_selective, rng):
        path, _ = ckpt_selective
        p = Predictor(path, selective=True, compute_dtype="float32")
        imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
        out = p.predict(imgs)
        assert out["prob"].shape == (2, 32, 32)
        assert out["pred"].dtype == np.uint8
        assert set(np.unique(out["pred"])) <= {0, 1}
        assert out["selection"].shape == (2, 32, 32)
        assert 0.0 <= out["prob"].min() and out["prob"].max() <= 1.0

    def test_folded_matches_unfolded(self, ckpt_selective, rng):
        path, _ = ckpt_selective
        imgs = rng.random((1, 32, 32, 3)).astype(np.float32)
        folded = Predictor(path, selective=True, compute_dtype="float32", fold_bn=True)
        unfolded = Predictor(path, selective=True, compute_dtype="float32", fold_bn=False)
        np.testing.assert_allclose(
            folded.predict(imgs)["prob"], unfolded.predict(imgs)["prob"],
            rtol=1e-3, atol=1e-4,
        )

    def test_predict_wsi(self, ckpt_selective, rng):
        path, _ = ckpt_selective
        p = Predictor(path, selective=True, compute_dtype="float32")
        image = rng.random((128, 128, 3)).astype(np.float32)
        out = p.predict_wsi(image, tile=(64, 64))
        assert out["prob"].shape == (128, 128)
        assert out["selection"].shape == (128, 128)

    def test_cutoffs_respected(self, ckpt_selective, rng):
        path, _ = ckpt_selective
        imgs = rng.random((1, 32, 32, 3)).astype(np.float32)
        lo = Predictor(path, selective=True, compute_dtype="float32", cut_off=0.01)
        hi = Predictor(path, selective=True, compute_dtype="float32", cut_off=0.99)
        assert lo.predict(imgs)["pred"].sum() >= hi.predict(imgs)["pred"].sum()

    def test_uncertainty_with_dropout(self, ckpt_selective, rng):
        path, _ = ckpt_selective
        p = Predictor(path, selective=True, compute_dtype="float32",
                      dropout_rate=0.3, fold_bn=True)
        imgs = rng.random((1, 32, 32, 3)).astype(np.float32)
        out = p.predict_with_uncertainty(imgs, n_iter=6)
        assert out["confidence"].shape == (1, 32, 32)
        assert float(out["variance"].max()) > 0.0
