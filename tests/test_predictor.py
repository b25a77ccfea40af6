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


@pytest.fixture(scope="module")
def ckpt_ce(tmp_path_factory):
    """Multi-class CE-head UNet checkpoint (reference model.py:106-191)."""
    d = tmp_path_factory.mktemp("pred_ckpt_ce")
    model = build_model("UNet", n_cls=3, selective=False,
                        compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    variables = jax.device_get(variables)
    save_checkpoint(str(d), {"net": {
        "params": variables["params"], "batch_stats": variables["batch_stats"],
    }, "epoch": 1}, 1)
    return str(d) + "/model_epoch1.ckpt"


class TestPredictCompact:
    """predict_compact: on-device threshold + 1/255 prob quantization, all
    outputs uint8 (the D2H-lean serving path)."""

    def test_matches_full_selective(self, ckpt_selective, rng):
        path, _ = ckpt_selective
        p = Predictor(path, selective=True, compute_dtype="float32")
        imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
        full = p.predict(imgs)
        comp = p.predict_compact(imgs)
        assert set(comp) == {"pred", "prob_u8", "selection",
                             "selection_prob_u8"}
        for k, v in comp.items():
            assert v.dtype == np.uint8, k
        np.testing.assert_array_equal(comp["pred"], full["pred"])
        np.testing.assert_array_equal(comp["selection"], full["selection"])
        # quantized prob reconstructs the float prob within half a step
        for u8_key, f_key in (("prob_u8", "prob"),
                              ("selection_prob_u8", "selection_prob")):
            rec = comp[u8_key].astype(np.float32) / 255.0
            assert np.abs(rec - full[f_key].astype(np.float32)).max() \
                <= 0.5 / 255.0 + 1e-6

    def test_matches_full_multiclass(self, ckpt_ce, rng):
        p = Predictor(ckpt_ce, model_arch="UNet", n_cls=3, selective=False,
                      compute_dtype="float32")
        imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
        full = p.predict(imgs)
        comp = p.predict_compact(imgs)
        assert set(comp) == {"pred", "prob_u8"}
        np.testing.assert_array_equal(comp["pred"], full["pred"])
        rec = comp["prob_u8"].astype(np.float32) / 255.0
        assert np.abs(rec - full["prob"].astype(np.float32)).max() \
            <= 0.5 / 255.0 + 1e-6

    def test_uint8_ingest_and_cutoffs(self, ckpt_selective, rng):
        """uint8 batches ship as bytes into the SAME compact graph, and the
        constructor cutoffs drive the on-device thresholds."""
        path, _ = ckpt_selective
        u8 = (rng.random((2, 32, 32, 3)) * 255).astype(np.uint8)
        lo = Predictor(path, selective=True, compute_dtype="float32",
                       cut_off=0.01)
        hi = Predictor(path, selective=True, compute_dtype="float32",
                       cut_off=0.99)
        a, b = lo.predict_compact(u8), hi.predict_compact(u8)
        assert a["pred"].sum() >= b["pred"].sum()
        np.testing.assert_array_equal(a["pred"],
                                      lo.predict(u8)["pred"])

    def test_int8_lazy_calibration(self, ckpt_selective, rng):
        """predict_compact on an uncalibrated int8 Predictor calibrates off
        the first batch (same contract as logits()/predict())."""
        path, _ = ckpt_selective
        imgs = rng.random((1, 32, 32, 3)).astype(np.float32)
        pq = Predictor(path, selective=True, compute_dtype="float32",
                       quantize="int8")
        comp = pq.predict_compact(imgs)
        full = pq.predict(imgs)  # now-calibrated graph
        np.testing.assert_array_equal(comp["pred"], full["pred"])
        np.testing.assert_array_equal(comp["selection"], full["selection"])

    def test_recalibration_rebuilds_compact_graph(self, ckpt_selective, rng):
        """calibrate() after a compact forward must invalidate the cached
        compact graph (stale scales would silently serve wrong outputs)."""
        path, _ = ckpt_selective
        imgs = rng.random((1, 32, 32, 3)).astype(np.float32)
        pq = Predictor(path, selective=True, compute_dtype="float32",
                       quantize="int8", calibration_images=imgs)
        first = pq.predict_compact(imgs)
        assert pq._compact is not None
        # widen the scales: the cached graph must be dropped and rebuilt
        pq.calibrate((rng.random((1, 32, 32, 3)) * 4 - 1.5)
                     .astype(np.float32).clip(0, 1))
        assert pq._compact is None
        again = pq.predict_compact(imgs)
        assert first["pred"].shape == again["pred"].shape

    def test_bf16_compute_nonrepresentable_cutoff(self, ckpt_selective, rng):
        """Masks bit-match predict() on the DEFAULT serving dtype (bfloat16)
        even for cutoffs with no exact bf16 representation.

        Regression (round-5 ADVICE): predict() used to threshold the host
        bf16 prob against the Python float in float64 while the compact graph
        compared against a bf16-rounded cutoff — a bf16 prob value landing
        between the two cutoff roundings (e.g. 0.369140625 vs cut 0.3685)
        made the two paths disagree. Both now compare float32(prob) >
        float32(cut)."""
        path, _ = ckpt_selective
        # 0.3685 rounds to 0.369140625 in bf16: any prob equal to that bf16
        # value flips depending on which precision the comparison runs in
        p = Predictor(path, selective=True, compute_dtype="bfloat16",
                      cut_off=0.3685, s_cut_off=0.4985)
        imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
        full = p.predict(imgs)
        comp = p.predict_compact(imgs)
        np.testing.assert_array_equal(comp["pred"], full["pred"])
        np.testing.assert_array_equal(comp["selection"], full["selection"])
        # the host threshold itself must quantize like the device one: a
        # synthetic prob plane holding exactly the adversarial bf16 value
        bf16_val = np.float32(jnp.asarray(0.3685, jnp.bfloat16))
        assert (np.float32(bf16_val) > np.float32(0.3685)) == \
            bool(jnp.asarray(bf16_val, jnp.float32) > jnp.float32(0.3685))

    def test_masks_only(self, ckpt_selective, rng):
        """want_prob=False returns just the uint8 masks (half the D2H) and
        they equal the full-precision path's."""
        path, _ = ckpt_selective
        p = Predictor(path, selective=True, compute_dtype="float32")
        imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
        masks = p.predict_compact(imgs, want_prob=False)
        assert set(masks) == {"pred", "selection"}
        full = p.predict(imgs)
        np.testing.assert_array_equal(masks["pred"], full["pred"])
        np.testing.assert_array_equal(masks["selection"], full["selection"])
        # both graph variants stay cached side by side
        both = p.predict_compact(imgs)
        assert set(both) == {"pred", "prob_u8", "selection",
                             "selection_prob_u8"}
        assert set(p._compact) == {True, False}
