"""int8 (W8A8) quantized-serving tests (ops/quant.py, models quantize path,
Predictor(quantize='int8'), --quantize on the eval/predict/wsi/serve CLIs).

The reference has no quantization story — this is a TPU-native serving
extension (measured 1.27x over the bf16 folded forward on v5e,
docs/RESULTS.md "int8 (W8A8) quantized serving"). The tests pin:

* the quantization arithmetic itself (per-output-channel symmetric int8,
  exact on integer-representable values);
* the fold -> calibrate -> quantize pipeline against the float folded
  forward (bounded sigmoid error);
* calibration semantics (lazy first-batch == eager, multi-batch scale
  merging only widens);
* every refuse-loudly guard (the repo policy that experiment flags never
  silently no-op);
* the public surfaces: evaluate(quantize='int8') incl. ensembles, and the
  predict / wsi CLI flags.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from selectivenet_for_semantic_segmentation_binary_tpu.config import EvalConfig
from selectivenet_for_semantic_segmentation_binary_tpu.data import (
    write_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import evaluate
from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.models.unet import CBR
from selectivenet_for_semantic_segmentation_binary_tpu.ops import quant
from selectivenet_for_semantic_segmentation_binary_tpu.ops.fold_bn import (
    fold_batchnorm,
)
from selectivenet_for_semantic_segmentation_binary_tpu.predictor import Predictor
from selectivenet_for_semantic_segmentation_binary_tpu.tools import (
    predict as predict_cli,
)
from selectivenet_for_semantic_segmentation_binary_tpu.tools import wsi as wsi_cli
from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
    save_checkpoint,
)


def _init_variables(selective=True, in_ch=3, arch="UNet_B"):
    model = build_model(arch, selective=selective, compute_dtype="float32")
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, in_ch)),
                   train=False)
    return jax.device_get(v)


def _make_ckpt(d, selective=True, seed=0, arch="UNet_B"):
    model = build_model(arch, selective=selective, compute_dtype="float32")
    v = jax.device_get(model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)), train=False))
    save_checkpoint(str(d), {"net": {
        "params": v["params"], "batch_stats": v["batch_stats"],
    }, "epoch": 1}, 1)
    return os.path.join(str(d), "model_epoch1.ckpt")


@pytest.fixture(scope="module")
def sel_ckpt(tmp_path_factory):
    return _make_ckpt(tmp_path_factory.mktemp("quant_ckpt"), selective=True)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(1)
    return rng.random((2, 32, 32, 3)).astype(np.float32)


class TestQuantizeKernel:
    def test_integer_representable_roundtrip_is_exact(self):
        # values that are exact multiples of each channel's scale survive the
        # quantize/dequantize roundtrip bit-exactly
        rng = np.random.default_rng(0)
        q_true = rng.integers(-127, 128, (3, 3, 4, 8)).astype(np.float32)
        scale_true = np.float32(10.0) ** rng.uniform(-3, 1, 8).astype(np.float32)
        # force each channel's absmax to 127 so scale recovery is exact
        q_true[0, 0, 0, :] = 127.0
        kernel = q_true * scale_true[None, None, None, :]
        kq, ks = quant.quantize_kernel(kernel)
        np.testing.assert_allclose(ks, scale_true, rtol=1e-6)
        np.testing.assert_array_equal(kq.astype(np.float32), q_true)

    def test_per_channel_scales_are_independent(self):
        # a 1000x larger channel must not crush the small channel's precision
        kernel = np.zeros((3, 3, 2, 2), np.float32)
        kernel[..., 0] = 1000.0
        kernel[1, 1, 0, 1] = 0.001
        kq, ks = quant.quantize_kernel(kernel)
        deq = kq.astype(np.float32) * ks[None, None, None, :]
        np.testing.assert_allclose(deq[1, 1, 0, 1], 0.001, rtol=1e-2)

    def test_zero_kernel_channel_yields_no_nan(self):
        kernel = np.zeros((3, 3, 2, 2), np.float32)
        kq, ks = quant.quantize_kernel(kernel)
        assert np.all(np.isfinite(ks)) and np.all(ks > 0)
        assert np.all(kq == 0)


class TestQuantizedCBR:
    def test_exact_integer_arithmetic(self):
        """Inputs that quantize exactly + integer weights -> the quantized CBR
        equals the float conv of the dequantized weights bit-for-bit (int32
        accumulation is exact; the dequant multiply is one f32 rounding)."""
        rng = np.random.default_rng(2)
        a = np.float32(0.25)
        x = (rng.integers(-127, 128, (2, 8, 8, 3)) * a).astype(np.float32)
        kq = rng.integers(-127, 128, (3, 3, 3, 4)).astype(np.int8)
        ks = np.float32(10.0) ** rng.uniform(-2, 0, 4).astype(np.float32)
        b = rng.standard_normal(4).astype(np.float32)

        params = {"conv": {"kernel_q": jnp.asarray(kq),
                           "kernel_scale": jnp.asarray(ks),
                           "act_scale": jnp.asarray(a),
                           "bias": jnp.asarray(b)}}
        mod = CBR(features=4, dtype=jnp.float32, folded=True, quantize=True)
        y = mod.apply({"params": params}, jnp.asarray(x), train=False)

        deq_w = kq.astype(np.float32) * ks[None, None, None, :]
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(deq_w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref = jnp.maximum(ref + b, 0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestPipeline:
    def test_fold_calibrate_quantize_tracks_float(self, images):
        v = _init_variables(selective=True)
        folded = fold_batchnorm(v)["params"]
        x = (jnp.asarray(images) - 0.5) / 0.5

        mf = build_model("UNet_B", selective=True, compute_dtype="float32",
                         folded=True)
        ref = mf.apply({"params": folded}, x, train=False)

        mc = build_model("UNet_B", selective=True, compute_dtype="float32",
                         folded=True, quant_calibrate=True)
        _, calib = mc.apply({"params": folded}, x, train=False,
                            mutable=["quant_calib"])
        scales = quant.extract_act_scales(calib)
        qp = quant.quantize_folded(folded, scales)
        assert len(quant.quantized_layer_names(qp)) == 14  # all trunk CBRs

        mq = build_model("UNet_B", selective=True, compute_dtype="float32",
                         folded=True, quantize="int8")
        out = mq.apply({"params": qp}, x, train=False)
        for a, b in zip(ref, out):
            sa = 1 / (1 + np.exp(-np.asarray(a, np.float64)))
            sb = 1 / (1 + np.exp(-np.asarray(b, np.float64)))
            assert np.abs(sa - sb).max() < 5e-3

    def test_quantize_folded_requires_calibrated_scales(self):
        v = _init_variables(selective=False)
        folded = fold_batchnorm(v)["params"]
        with pytest.raises(ValueError, match="no calibrated activation scale"):
            quant.quantize_folded(folded, {})

    def test_quantize_folded_rejects_degenerate_scales(self):
        """A zero (all-constant calibration input) or non-finite activation
        scale must raise, not silently garbage every downstream layer."""
        v = _init_variables(selective=False)
        folded = fold_batchnorm(v)["params"]
        x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 3)),
                        jnp.float32)
        calib_model = build_model("UNet_B", selective=False,
                                  compute_dtype="float32", folded=True,
                                  quant_calibrate=True)
        _, calib = calib_model.apply({"params": folded}, x, train=False,
                                     mutable=["quant_calib"])
        scales = quant.extract_act_scales(calib)
        # (all-zero calibration inputs are clamped to EPS at extraction; the
        # quantize_folded guard defends against CORRUPT trees — a stored 0.0
        # or NaN loaded from a bad artifact must raise, not divide)
        for bad in (0.0, float("nan"), float("inf")):
            def poison(node, bad=bad):
                return {k: (poison(v_) if isinstance(v_, dict) else bad)
                        for k, v_ in node.items()}

            with pytest.raises(ValueError,
                               match="degenerate activation scale"):
                quant.quantize_folded(folded, poison(scales))

    def test_merge_act_scales_elementwise_max(self):
        a = {"trunk": {"enc1_1": 0.1, "enc1_2": 0.5}}
        b = {"trunk": {"enc1_1": 0.3, "enc1_2": 0.2}}
        assert quant.merge_act_scales(a, b) == {
            "trunk": {"enc1_1": 0.3, "enc1_2": 0.5}}
        with pytest.raises(ValueError, match="disagree"):
            quant.merge_act_scales(a, {"trunk": {"enc1_1": 0.3}})


class TestBuildModelGuards:
    def test_quantize_requires_folded(self):
        with pytest.raises(ValueError, match="BN-folded"):
            build_model("UNet_B", quantize="int8")

    def test_calibrate_requires_folded(self):
        with pytest.raises(ValueError, match="BN-folded"):
            build_model("UNet_B", quant_calibrate=True)

    def test_quantize_and_calibrate_exclusive(self):
        with pytest.raises(ValueError, match="exclusive"):
            build_model("UNet_B", folded=True, quantize="int8",
                        quant_calibrate=True)

    def test_quantize_rejects_dropout(self):
        with pytest.raises(ValueError, match="dropout"):
            build_model("UNet_B", folded=True, quantize="int8",
                        dropout_rate=0.3)

    def test_unknown_quantize_value(self):
        with pytest.raises(ValueError, match="unknown quantize"):
            build_model("UNet_B", folded=True, quantize="int4")


class TestPredictorInt8:
    def test_lazy_first_batch_equals_eager_calibration(self, sel_ckpt, images):
        eager = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                          quantize="int8", calibration_images=images)
        lazy = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                         quantize="int8")
        qe = eager.predict(images)
        ql = lazy.predict(images)
        np.testing.assert_array_equal(np.asarray(qe["prob"]),
                                      np.asarray(ql["prob"]))

    def test_calibration_chunking_is_exact(self, sel_ckpt, rng):
        """Calibration batches are processed in <= 8-example eager chunks
        (an unchunked 128 @ 256px first batch OOMs a v5e, round 5): the
        chunked scales must equal a per-example calibration sequence exactly
        (absmax of a union == max of chunk absmaxes)."""
        big = rng.random((20, 32, 32, 3)).astype(np.float32)
        chunked = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                            quantize="int8", calibration_images=big)
        seq = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                        quantize="int8")
        for i in range(big.shape[0]):
            seq.calibrate(big[i:i + 1])
        flat_a = jax.tree_util.tree_leaves_with_path(chunked._act_scales)
        flat_b = jax.tree_util.tree_leaves_with_path(seq._act_scales)
        assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
        for (p, a), (_, b) in zip(flat_a, flat_b):
            assert a == pytest.approx(b, rel=1e-6), p

    def test_tracks_float_predictor(self, sel_ckpt, images):
        pf = Predictor(sel_ckpt, selective=True, compute_dtype="float32")
        pq = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                       quantize="int8", calibration_images=images)
        ref, out = pf.predict(images), pq.predict(images)
        assert sorted(out) == ["pred", "prob", "selection", "selection_prob"]
        assert np.abs(ref["prob"] - out["prob"]).max() < 0.01
        assert (ref["pred"] == out["pred"]).mean() > 0.99

    def test_wsi_center_crop_calibrates_lazily(self, sel_ckpt):
        rng = np.random.default_rng(3)
        img = rng.random((64, 64, 3)).astype(np.float32)
        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                      quantize="int8")
        out = p.predict_wsi(img, tile=(32, 32), batch_size=2)
        assert out["pred"].shape == (64, 64)
        assert p.variables is not None  # calibrated + quantized

    def test_recalibration_only_widens_scales(self, sel_ckpt, images):
        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                      quantize="int8", calibration_images=images)

        def scales(pred):
            out = {}

            def walk(node, path):
                for k, v in node.items():
                    if k == "conv" and "act_scale" in v:
                        out[path] = float(v["act_scale"])
                    elif isinstance(v, dict):
                        walk(v, f"{path}/{k}")

            walk(pred.variables["params"], "")
            return out

        before = scales(p)
        # the merge is an elementwise max: no scale may ever SHRINK, however
        # the new batch's activations distribute
        p.calibrate(images * 0.1)
        mid = scales(p)
        assert all(mid[k] >= before[k] for k in before)
        # a wider-range batch must widen at least the input layer's scale
        p.calibrate(np.concatenate([images, images * 3.0 - 1.0]))
        after = scales(p)
        assert all(after[k] >= mid[k] for k in mid)
        assert after["/trunk/enc1_1"] > before["/trunk/enc1_1"]

    def test_guards(self, sel_ckpt, images):
        with pytest.raises(ValueError, match="fold_bn"):
            Predictor(sel_ckpt, selective=True, quantize="int8", fold_bn=False)
        with pytest.raises(ValueError, match="dropout"):
            Predictor(sel_ckpt, selective=True, quantize="int8",
                      dropout_rate=0.3)
        with pytest.raises(ValueError, match="unknown quantize"):
            Predictor(sel_ckpt, selective=True, quantize="fp8")
        p = Predictor(sel_ckpt, selective=True, compute_dtype="float32",
                      quantize="int8", calibration_images=images)
        with pytest.raises(ValueError, match="bf16 folded"):
            p.predict_with_uncertainty(images, n_iter=2)
        pf = Predictor(sel_ckpt, selective=True, compute_dtype="float32")
        with pytest.raises(ValueError, match="only meaningful"):
            pf.calibrate(images)


@pytest.fixture(scope="module")
def patch_tree(tmp_path_factory):
    d = tmp_path_factory.mktemp("quant_data")
    write_synthetic_patch_tree(str(d), n_slides=2, patches_per_slide=6,
                               patch_size=32, seed=0)
    return str(d)


class TestEvalInt8:
    def _cfg(self, patch_tree, model_dir, **kw):
        base = dict(data_dir=patch_tree, test_fold=1, patch_size=32,
                    batch_size=4, num_workers=0, model_dir=model_dir,
                    compute_dtype="float32", info_print=False)
        base.update(kw)
        return EvalConfig(**base)

    def test_eval_quantize_tracks_bf16(self, patch_tree, tmp_path):
        md = tmp_path / "m"
        md.mkdir()
        _make_ckpt(md, selective=True)
        kw = dict(selective=True, select_eval=True)
        r_f = evaluate(self._cfg(patch_tree, str(md), **kw), verbose=False)
        r_q = evaluate(self._cfg(patch_tree, str(md), quantize="int8", **kw),
                       verbose=False)
        assert abs(r_f["accuracy"] - r_q["accuracy"]) < 0.02
        assert r_q["confusion_matrix"].sum() > 0

    def test_eval_int8_ensemble(self, patch_tree, tmp_path):
        md = tmp_path / "ens"
        md.mkdir()
        for seed, epoch in ((0, 1), (1, 2)):
            model = build_model("UNet_B", selective=False,
                                compute_dtype="float32")
            v = jax.device_get(model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3)),
                train=False))
            save_checkpoint(str(md), {"net": {
                "params": v["params"], "batch_stats": v["batch_stats"],
            }, "epoch": epoch}, epoch)
        r = evaluate(self._cfg(patch_tree, str(md), quantize="int8"),
                     verbose=False)
        assert r["n_models"] == 2
        assert np.isfinite(r["mIoU"])

    def test_eval_calib_patches_flag(self, patch_tree, tmp_path, capsys):
        """--calib_patches widens the int8 calibration sample; metrics stay
        within the bf16 envelope at both widths and 0 is rejected."""
        md = tmp_path / "mcal"
        md.mkdir()
        _make_ckpt(md, selective=True)
        kw = dict(selective=True, select_eval=True, quantize="int8")
        r8 = evaluate(self._cfg(patch_tree, str(md), calib_patches=2, **kw),
                      verbose=True)
        out = capsys.readouterr().out
        assert "calibrated on 2 patches" in out
        r64 = evaluate(self._cfg(patch_tree, str(md), calib_patches=64, **kw),
                       verbose=True)
        out = capsys.readouterr().out
        # dataset fold has < 64 patches: clamped to the fold size, not crash
        assert "calibrated on" in out
        assert abs(r8["accuracy"] - r64["accuracy"]) < 0.05
        with pytest.raises(ValueError, match="calib_patches"):
            evaluate(self._cfg(patch_tree, str(md), calib_patches=0, **kw),
                     verbose=False)

    def test_eval_rejects_unknown_quantize(self, patch_tree, tmp_path):
        md = tmp_path / "m2"
        md.mkdir()
        _make_ckpt(md, selective=False)
        with pytest.raises(ValueError, match="unknown --quantize"):
            evaluate(self._cfg(patch_tree, str(md), quantize="int4"),
                     verbose=False)


class TestCLI:
    @pytest.fixture(scope="class")
    def image_file(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("quant_imgs")
        rng = np.random.default_rng(0)
        arr = (rng.random((36, 44, 3)) * 255).astype(np.uint8)
        path = os.path.join(str(d), "tile.png")
        Image.fromarray(arr).save(path)
        return path

    def test_predict_cli_int8(self, sel_ckpt, image_file, tmp_path):
        out = tmp_path / "out"
        predict_cli.main([image_file, "--model_path", sel_ckpt,
                          "--selective", "1", "--compute_dtype", "float32",
                          "--quantize", "int8", "--heatmap", "0",
                          "--save_dir", str(out)])
        assert (out / "tile_pred.png").exists()
        assert (out / "tile_selection.png").exists()

    def test_predict_cli_int8_validation(self, sel_ckpt, image_file):
        with pytest.raises(SystemExit):
            predict_cli.main([image_file, "--model_path", sel_ckpt,
                              "--quantize", "int8", "--fold_bn", "0"])
        with pytest.raises(SystemExit):
            predict_cli.main([image_file, "--model_path", sel_ckpt,
                              "--quantize", "int8", "--uncertainty", "4",
                              "--dropout_rate", "0.3"])

    def test_wsi_cli_int8(self, patch_tree, tmp_path, capsys):
        md = tmp_path / "m"
        md.mkdir()
        ckpt = _make_ckpt(md, selective=False)
        out = tmp_path / "wsi_out"
        wsi_cli.main(["--data_dir", patch_tree, "--test_fold", "1",
                      "--model_path", ckpt, "--patch_size", "32",
                      "--nrow", "2", "--batch_size", "4",
                      "--num_workers", "1", "--compute_dtype", "float32",
                      "--quantize", "int8", "--save_dir", str(out)])
        captured = capsys.readouterr().out
        assert "int8 serving trunk" in captured
        assert "nanmean" in captured

    def test_serve_cli_int8_requires_calib_images(self, sel_ckpt):
        from selectivenet_for_semantic_segmentation_binary_tpu.tools import (
            serve as serve_cli,
        )

        with pytest.raises(SystemExit):
            serve_cli.main(["--model_path", sel_ckpt, "--quantize", "int8"])
        with pytest.raises(SystemExit):
            serve_cli.main(["--model_path", sel_ckpt,
                            "--calib_images", "/nonexistent"])


class TestServeInt8:
    def test_http_round_trip_matches_direct_int8_predictor(
            self, sel_ckpt, images, tmp_path):
        """A live server over an int8 predictor serves the same predictions
        the predictor gives directly (the micro-batcher and HTTP layers are
        quantization-agnostic)."""
        import io
        import json
        import threading
        import urllib.request

        from selectivenet_for_semantic_segmentation_binary_tpu.tools.serve import (
            PredictionService,
            make_server,
        )

        predictor = Predictor(sel_ckpt, selective=True,
                              compute_dtype="float32", quantize="int8",
                              calibration_images=images)
        service = PredictionService(predictor, max_batch=2,
                                    batch_window_ms=5.0,
                                    request_timeout_s=300.0)
        server = make_server(service, "127.0.0.1", 0,
                             model_info={"quantize": "int8"})
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            arr = (images[0] * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            url = f"http://127.0.0.1:{server.server_address[1]}"
            req = urllib.request.Request(f"{url}/predict", data=buf.getvalue(),
                                         method="POST")
            with urllib.request.urlopen(req, timeout=180) as r:
                assert r.status == 200
                body = json.loads(r.read())
            direct = predictor.predict((arr.astype(np.float32) / 255.0)[None])
            assert body["tumor_fraction"] == pytest.approx(
                float(direct["pred"].mean()), abs=1e-6)
        finally:
            server.shutdown()
            server.server_close()
            service.close()
