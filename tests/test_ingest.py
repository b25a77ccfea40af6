"""uint8 serving ingest: byte transfer + on-device normalize (ops/ingest.py).

Equivalence contract: serving a raw uint8 image must match serving the host
float decode of the same pixels to 1 ulp of the input normalization (the
device uses *(1/255), the host decode /255 — max input delta 6e-8 over all
256 byte values), and the whole surface (Predictor, wsi_mask, predict CLI
loader, PredictionService) must preserve uint8 through padding/batching so
the H2D transfer actually ships 1 byte/pixel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.ops.ingest import (
    device_ingest,
    normalize_raw,
    to_unit_float,
)
from selectivenet_for_semantic_segmentation_binary_tpu.predictor import Predictor
from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
    save_checkpoint,
)

# (x-0.5)/0.5 doubles the <=6e-8 /255-vs-*(1/255) input delta
NORM_ATOL = 2.5e-7


@pytest.fixture(scope="module")
def sel_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest_ckpt")
    model = build_model("UNet_B", selective=True, compute_dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    variables = jax.device_get(variables)
    save_checkpoint(str(d), {"net": {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }, "epoch": 1}, 1)
    return str(d) + "/model_epoch1.ckpt"


@pytest.fixture(scope="module")
def u8_batch():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)


class TestHelpers:
    def test_normalize_raw_matches_host_for_all_bytes(self):
        """Every byte value: device formula vs the host decode pipeline
        (np.float32 / 255.0 then Normalization's (x-0.5)/0.5)."""
        v = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
        host = (np.asarray(v, np.float32) / 255.0 - 0.5) / 0.5
        dev = np.asarray(normalize_raw(jnp.asarray(v)))
        assert dev.dtype == np.float32
        np.testing.assert_allclose(dev, host, rtol=0, atol=NORM_ATOL)

    def test_normalize_raw_float_passthrough(self):
        x = np.linspace(0, 1, 64, dtype=np.float32).reshape(1, 8, 8, 1)
        np.testing.assert_array_equal(np.asarray(normalize_raw(jnp.asarray(x))),
                                      (x - 0.5) / 0.5)

    def test_device_ingest_preserves_uint8_and_coerces_floats(self):
        u8 = np.zeros((1, 8, 8, 3), np.uint8)
        assert device_ingest(u8).dtype == jnp.uint8
        f64 = np.zeros((1, 8, 8, 3), np.float64)
        assert device_ingest(f64).dtype == jnp.float32
        assert device_ingest(f64.astype(np.float32)).dtype == jnp.float32

    def test_normalize_raw_traces_per_dtype(self):
        """Inside jit the dtype branch is static: one program per dtype,
        both correct."""
        f = jax.jit(normalize_raw)
        u8 = np.full((2, 2), 255, np.uint8)
        np.testing.assert_allclose(np.asarray(f(u8)), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(f(np.ones((2, 2), np.float32))),
                                   1.0)

    def test_to_unit_float(self):
        u8 = np.array([0, 128, 255], np.uint8)
        f = to_unit_float(u8)
        assert f.dtype == np.float32
        np.testing.assert_allclose(f, [0.0, 128 / 255.0, 1.0], atol=1e-7)
        # float input: coerced, not rescaled
        np.testing.assert_array_equal(to_unit_float(f), f)


class TestPredictorIngest:
    def test_uint8_matches_float_path(self, sel_ckpt, u8_batch):
        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32")
        host = u8_batch.astype(np.float32) / 255.0
        a = p.predict(u8_batch)
        b = p.predict(host)
        np.testing.assert_allclose(a["prob"], b["prob"], rtol=0, atol=1e-5)
        np.testing.assert_array_equal(a["pred"], b["pred"])
        np.testing.assert_array_equal(a["selection"], b["selection"])

    def test_uint8_wsi_matches_float(self, sel_ckpt, u8_batch):
        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32")
        img = np.repeat(np.repeat(u8_batch[0], 2, 0), 2, 1)  # 64x64
        a = p.predict_wsi(img, tile=(32, 32))
        b = p.predict_wsi(img.astype(np.float32) / 255.0, tile=(32, 32))
        np.testing.assert_allclose(a["prob"], b["prob"], rtol=0, atol=1e-5)

    def test_uint8_int8_quantized_serving(self, sel_ckpt, u8_batch):
        """uint8 ingest composes with the int8 serving graph, including
        LAZY calibration off the first uint8 batch."""
        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                      quantize="int8")
        a = p.predict(u8_batch)  # first batch calibrates
        q = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                      quantize="int8",
                      calibration_images=u8_batch.astype(np.float32) / 255.0)
        b = q.predict(u8_batch.astype(np.float32) / 255.0)
        # scales differ by <=1 ulp of the activations; outputs track closely
        np.testing.assert_allclose(a["prob"], b["prob"], rtol=0, atol=1e-4)

    def test_uint8_uncertainty(self, sel_ckpt, u8_batch):
        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                      dropout_rate=0.3)
        a = p.predict_with_uncertainty(u8_batch[:1], n_iter=4, seed=3)
        b = p.predict_with_uncertainty(
            u8_batch[:1].astype(np.float32) / 255.0, n_iter=4, seed=3)
        np.testing.assert_allclose(a["mean_prob"], b["mean_prob"],
                                   rtol=0, atol=1e-5)


class TestToolIngest:
    def test_load_image_dtype_routing(self, tmp_path):
        from PIL import Image

        from selectivenet_for_semantic_segmentation_binary_tpu.tools.predict import (
            _load_image,
        )

        rng = np.random.default_rng(3)
        raw = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        path = str(tmp_path / "img.png")
        Image.fromarray(raw).save(path)

        rgb = _load_image(path, "RGB")
        assert rgb.dtype == np.uint8
        np.testing.assert_array_equal(rgb, raw)
        # host float transforms force the float path
        assert _load_image(path, "GH").dtype == np.float32
        assert _load_image(path, "H_RGB").dtype == np.float32
        assert _load_image(path, "RGB", blankfield=True).dtype == np.float32

    def test_predict_image_uint8_matches_float(self, sel_ckpt):
        from selectivenet_for_semantic_segmentation_binary_tpu.tools.predict import (
            predict_image,
        )

        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32")
        rng = np.random.default_rng(11)
        raw = rng.integers(0, 256, (36, 44, 3), dtype=np.uint8)  # pads to grid
        a = predict_image(p, raw)
        b = predict_image(p, raw.astype(np.float32) / 255.0)
        assert a["prob"].shape == (36, 44)
        np.testing.assert_allclose(a["prob"], b["prob"], rtol=0, atol=1e-5)
        np.testing.assert_array_equal(a["pred"], b["pred"])

    def test_wsi_mask_uint8(self, sel_ckpt):
        from selectivenet_for_semantic_segmentation_binary_tpu.tools.tiled_inference import (
            wsi_mask,
        )

        model = build_model("UNet_B", selective=True, compute_dtype="float32")
        variables = model.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, 32, 32, 3)), train=False)
        rng = np.random.default_rng(5)
        raw = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        a = wsi_mask(model, variables, raw, selective=True, tile=(32, 32))
        b = wsi_mask(model, variables, raw.astype(np.float32) / 255.0,
                     selective=True, tile=(32, 32))
        np.testing.assert_allclose(a["prob"], b["prob"], rtol=0, atol=1e-5)


class TestServiceIngest:
    def test_service_preserves_uint8_through_batching(self, sel_ckpt):
        """The micro-batcher must not silently upcast: padding, stacking and
        occupancy fill all stay uint8 so the device transfer ships bytes."""
        from selectivenet_for_semantic_segmentation_binary_tpu.tools.serve import (
            PredictionService,
        )

        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32")
        seen = []
        orig = p.predict

        def spy(batch):
            seen.append((batch.dtype, batch.shape))
            return orig(batch)

        p.predict = spy
        svc = PredictionService(p, max_batch=2, batch_window_ms=1)
        try:
            rng = np.random.default_rng(9)
            raw = rng.integers(0, 256, (36, 44, 3), dtype=np.uint8)
            got = svc.predict_one(raw)
            want = p.predict(np.pad(raw, ((0, 4), (0, 4), (0, 0)),
                                    mode="edge")[None])
            assert seen[0][0] == np.uint8
            # bit-identical: both sides take the uint8 device path
            np.testing.assert_array_equal(got["prob"],
                                          want["prob"][0, :36, :44])
        finally:
            svc.close()

    def test_warmup_dtype_param(self, sel_ckpt):
        from selectivenet_for_semantic_segmentation_binary_tpu.tools.serve import (
            PredictionService,
        )

        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32")
        svc = PredictionService(p, max_batch=1, batch_window_ms=1)
        try:
            svc.warmup(32, 32, 3, dtype=np.uint8)  # must not raise
        finally:
            svc.close()

    def test_mixed_dtype_requests_never_share_a_batch(self, sel_ckpt):
        """A float request arriving inside a uint8 group's window must be
        deferred to its own batch, not upcast-stacked (np.stack would
        silently promote and serve the uint8 rows double-normalized)."""
        import threading

        from selectivenet_for_semantic_segmentation_binary_tpu.tools.serve import (
            PredictionService,
        )

        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32")
        dtypes = []
        orig = p.predict

        def spy(batch):
            dtypes.append(np.dtype(batch.dtype))
            return orig(batch)

        p.predict = spy
        svc = PredictionService(p, max_batch=4, batch_window_ms=200)
        try:
            rng = np.random.default_rng(13)
            raw = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
            flt = raw.astype(np.float32) / 255.0
            results = {}

            def call(name, img):
                results[name] = svc.predict_one(img)

            threads = [threading.Thread(target=call, args=("u8", raw)),
                       threading.Thread(target=call, args=("f32", flt))]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert sorted(map(str, dtypes)) == ["float32", "uint8"]
            np.testing.assert_allclose(results["u8"]["prob"],
                                       results["f32"]["prob"],
                                       rtol=0, atol=1e-5)
        finally:
            svc.close()
