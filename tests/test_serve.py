"""snet-serve tests: the warm inference HTTP server (tools/serve.py).

The reference has no serving story (inference is notebook cells,
u-net_testing.ipynb); the server is a framework extension. These tests drive
the real HTTP surface end to end on CPU with a random-init checkpoint, and
pin the micro-batcher's grouping/occupancy-bucket semantics with a fake
predictor whose timing is controlled.
"""

import io
import json
import os
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.predictor import Predictor
from selectivenet_for_semantic_segmentation_binary_tpu.tools.predict import (
    _pad_to_grid,
)
from selectivenet_for_semantic_segmentation_binary_tpu.tools.serve import (
    PredictionService,
    ServerBusyError,
    _bucket,
    make_server,
)
from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
    save_checkpoint,
)


def _make_ckpt(d: str, selective: bool) -> str:
    model = build_model("UNet_B", selective=selective, compute_dtype="float32")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    variables = jax.device_get(variables)
    save_checkpoint(str(d), {"net": {
        "params": variables["params"], "batch_stats": variables["batch_stats"],
    }, "epoch": 1}, 1)
    return os.path.join(str(d), "model_epoch1.ckpt")


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _request(url, method="GET", data=None):
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req, timeout=180) as r:
            return r.status, r.read(), r.headers.get("Content-Type", "")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type", "")


@pytest.fixture(scope="module")
def image_arr():
    rng = np.random.default_rng(0)
    return (rng.random((36, 44, 3)) * 255).astype(np.uint8)  # off the 8-grid


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """(base_url, service, predictor) — a live selective server on a free port."""
    ckpt = _make_ckpt(tmp_path_factory.mktemp("serve_ckpt"), selective=True)
    predictor = Predictor(ckpt, selective=True, compute_dtype="float32")
    service = PredictionService(predictor, max_batch=4, batch_window_ms=10.0,
                                request_timeout_s=300.0)
    server = make_server(service, "127.0.0.1", 0,
                         model_info={"model_arch": "UNet_B", "selective": True})
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, service, predictor
    server.shutdown()
    server.server_close()
    service.close()


class TestBucket:
    def test_powers_of_two_capped(self):
        assert _bucket(1, 8) == 1
        assert _bucket(2, 8) == 2
        assert _bucket(3, 8) == 4
        assert _bucket(5, 8) == 8
        assert _bucket(8, 8) == 8
        assert _bucket(9, 8) == 8  # cap
        assert _bucket(3, 1) == 1


class TestEndpoints:
    def test_healthz(self, served):
        url, _, _ = served
        code, body, ctype = _request(url + "/healthz")
        assert code == 200 and ctype == "application/json"
        payload = json.loads(body)
        assert payload["status"] == "ok"
        assert payload["backend"] == jax.default_backend()
        assert payload["uptime_s"] >= 0

    def test_info_reports_model_and_stats(self, served):
        url, _, _ = served
        code, body, _ = _request(url + "/info")
        assert code == 200
        payload = json.loads(body)
        assert payload["model"]["selective"] is True
        assert payload["model"]["max_batch"] == 4
        for key in ("n_requests", "n_batches", "mean_occupancy", "shapes_seen"):
            assert key in payload["stats"]

    def test_unknown_paths_404(self, served):
        url, _, _ = served
        assert _request(url + "/nope")[0] == 404
        assert _request(url + "/nope", method="POST", data=b"x")[0] == 404

    def test_predict_json_matches_direct_predictor(self, served, image_arr):
        url, _, predictor = served
        code, body, _ = _request(url + "/predict", method="POST",
                                 data=_png_bytes(image_arr))
        assert code == 200
        payload = json.loads(body)
        assert payload["shape"] == [36, 44]
        assert 0.0 <= payload["tumor_fraction"] <= 1.0
        assert 0.0 <= payload["coverage"] <= 1.0

        # oracle: the same image through the Predictor directly (pad + crop)
        img = image_arr.astype(np.float32) / 255.0
        padded = np.pad(img, ((0, 4), (0, 4), (0, 0)), mode="edge")
        direct = predictor.predict(padded[None])
        assert payload["tumor_fraction"] == pytest.approx(
            float(direct["pred"][0, :36, :44].mean()), abs=1e-6)
        assert payload["coverage"] == pytest.approx(
            float(direct["selection"][0, :36, :44].mean()), abs=1e-6)

    def test_predict_png_pred_and_selection(self, served, image_arr):
        url, _, _ = served
        for output in ("pred", "selection"):
            code, body, ctype = _request(
                url + f"/predict?format=png&output={output}", method="POST",
                data=_png_bytes(image_arr))
            assert code == 200 and ctype == "image/png"
            mask = np.asarray(Image.open(io.BytesIO(body)))
            assert mask.shape == (36, 44)  # cropped back from padded 40x48
            assert set(np.unique(mask)) <= {0, 255}

    def test_predict_npz_full_maps(self, served, image_arr):
        url, _, predictor = served
        code, body, ctype = _request(url + "/predict?format=npz",
                                     method="POST", data=_png_bytes(image_arr))
        assert code == 200 and ctype == "application/octet-stream"
        maps = np.load(io.BytesIO(body))
        assert set(maps.files) == {"prob", "pred", "selection_prob",
                                   "selection"}
        assert maps["prob"].shape == (36, 44)
        assert maps["prob"].dtype == np.float32
        img = image_arr.astype(np.float32) / 255.0
        padded = np.pad(img, ((0, 4), (0, 4), (0, 0)), mode="edge")
        direct = predictor.predict(padded[None])
        np.testing.assert_allclose(maps["prob"],
                                   direct["prob"][0, :36, :44], atol=1e-5)

    def test_bad_requests(self, served):
        url, _, _ = served
        # undecodable body
        code, body, _ = _request(url + "/predict", method="POST",
                                 data=b"not an image")
        assert code == 400 and b"could not decode" in body
        # empty body
        assert _request(url + "/predict", method="POST", data=b"")[0] == 400
        # unknown format / output
        assert _request(url + "/predict?format=bmp", method="POST",
                        data=b"x")[0] == 400
        assert _request(url + "/predict?output=prob", method="POST",
                        data=b"x")[0] == 400

    def test_stats_accumulate(self, served, image_arr):
        url, service, _ = served
        before = service.stats.n_requests
        code, _, _ = _request(url + "/predict", method="POST",
                              data=_png_bytes(image_arr))
        assert code == 200
        assert service.stats.n_requests == before + 1
        assert (40, 48) in service.stats.shapes


class TestNonSelective:
    def test_selection_png_rejected_json_has_no_coverage(self, tmp_path,
                                                         image_arr):
        ckpt = _make_ckpt(tmp_path, selective=False)
        predictor = Predictor(ckpt, selective=False, compute_dtype="float32")
        service = PredictionService(predictor, max_batch=1)
        server = make_server(service, "127.0.0.1", 0)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            code, body, _ = _request(url + "/predict", method="POST",
                                     data=_png_bytes(image_arr))
            assert code == 200
            payload = json.loads(body)
            assert "coverage" not in payload
            code, body, _ = _request(url + "/predict?format=png&output=selection",
                                     method="POST", data=_png_bytes(image_arr))
            assert code == 400 and b"selective checkpoint" in body
        finally:
            server.shutdown()
            server.server_close()
            service.close()


class _FakePredictor:
    """Deterministic, timing-controlled stand-in: records batch shapes."""

    def __init__(self, forward_s: float = 0.0, fail: bool = False):
        self.forward_s = forward_s
        self.fail = fail
        self.batches = []

    def predict(self, batch):
        self.batches.append(batch.shape)
        if self.fail:
            raise RuntimeError("synthetic forward failure")
        time.sleep(self.forward_s)
        n, h, w = batch.shape[:3]
        return {"prob": np.full((n, h, w), 0.75, np.float32),
                "pred": np.ones((n, h, w), np.uint8)}


class TestMicroBatcher:
    def test_concurrent_requests_share_a_forward(self):
        # window 50 ms, forward 300 ms: request 0's window expires before
        # requests 1-3 arrive (t=200 ms), so they queue up while the worker
        # is inside request 0's forward and form ONE group afterwards
        fake = _FakePredictor(forward_s=0.3)
        service = PredictionService(fake, max_batch=4, batch_window_ms=50.0)
        try:
            img = np.zeros((16, 16, 3), np.float32)
            results = [None] * 4

            def call(i):
                results[i] = service.predict_one(img)

            threads = [threading.Thread(target=call, args=(0,))]
            threads[0].start()
            time.sleep(0.2)  # worker is now inside the first forward
            for i in (1, 2, 3):
                threads.append(threading.Thread(target=call, args=(i,)))
                threads[-1].start()
            for t in threads:
                t.join(timeout=30)
            assert all(r is not None for r in results)
            assert all(r["prob"].shape == (16, 16) for r in results)
            # first request ran alone; the other three were grouped into ONE
            # batch, padded to the power-of-two bucket 4
            assert service.stats.n_batches == 2
            assert fake.batches == [(1, 16, 16, 3), (4, 16, 16, 3)]
            assert service.stats.occupancy_sum == 4   # 1 + 3 real requests
            assert service.stats.padded_sum == 5      # 1 + 4 device rows
        finally:
            service.close()

    def test_mixed_shapes_are_split_not_dropped(self):
        # warm's 50 ms window expires before s1/b1/s2 arrive; they queue in a
        # deterministic order while the worker is inside the warm forward,
        # then group as [s1, s2] (b1 mismatches -> leftover, served next)
        fake = _FakePredictor(forward_s=0.3)
        service = PredictionService(fake, max_batch=4, batch_window_ms=50.0)
        try:
            small = np.zeros((16, 16, 3), np.float32)
            big = np.zeros((24, 24, 3), np.float32)
            results = {}

            def call(name, img):
                results[name] = service.predict_one(img)

            threads = [threading.Thread(target=call, args=("warm", small))]
            threads[0].start()
            time.sleep(0.15)
            for name, img in [("s1", small), ("b1", big), ("s2", small)]:
                threads.append(threading.Thread(target=call, args=(name, img)))
                threads[-1].start()
                time.sleep(0.03)
            for t in threads:
                t.join(timeout=30)
            assert results["s1"]["prob"].shape == (16, 16)
            assert results["s2"]["prob"].shape == (16, 16)
            assert results["b1"]["prob"].shape == (24, 24)
            # the 16s grouped together; the 24 went through its own batch
            shapes = sorted(s[1] for s in fake.batches)
            assert shapes == [16, 16, 24]
        finally:
            service.close()

    def test_forward_error_is_delivered_and_worker_survives(self):
        fake = _FakePredictor(fail=True)
        service = PredictionService(fake, max_batch=2, batch_window_ms=1.0)
        try:
            img = np.zeros((16, 16, 3), np.float32)
            with pytest.raises(RuntimeError, match="synthetic forward"):
                service.predict_one(img)
            assert service.stats.n_errors == 1
            fake.fail = False
            out = service.predict_one(img)  # worker thread still alive
            assert out["pred"].shape == (16, 16)
        finally:
            service.close()

    def test_warmup_compiles_every_bucket(self):
        fake = _FakePredictor()
        service = PredictionService(fake, max_batch=4)
        try:
            service.warmup(16, 16, 3)
            assert sorted(s[0] for s in fake.batches) == [1, 2, 4]
        finally:
            service.close()

    def test_rejects_bad_max_batch(self):
        with pytest.raises(ValueError, match="max_batch"):
            PredictionService(_FakePredictor(), max_batch=0)


class TestBackpressure:
    """--max_queue: floods are shed fast (ServerBusyError / HTTP 503)."""

    def test_rejects_when_pending_at_cap(self):
        fake = _FakePredictor(forward_s=0.5)
        service = PredictionService(fake, max_batch=2, batch_window_ms=1.0,
                                    max_queue=1)
        try:
            img = np.zeros((16, 16, 3), np.float32)
            results = {}

            def call():
                results["a"] = service.predict_one(img)

            t = threading.Thread(target=call)
            t.start()
            time.sleep(0.15)  # A accepted and inside the forward (pending=1)
            with pytest.raises(ServerBusyError, match="max_queue=1"):
                service.predict_one(img)
            assert service.stats.n_rejected == 1
            t.join(timeout=30)
            assert results["a"]["prob"].shape == (16, 16)
            # capacity freed: the next request is accepted again
            out = service.predict_one(img)
            assert out["prob"].shape == (16, 16)
            assert service.stats.n_rejected == 1  # unchanged
        finally:
            service.close()

    def test_rejects_bad_max_queue(self):
        with pytest.raises(ValueError, match="max_queue"):
            PredictionService(_FakePredictor(), max_queue=-1)

    def test_pre_enqueue_failure_releases_slot(self):
        """A request that dies before enqueueing (unconvertible input) must
        release its reserved pending slot, or max_queue capacity leaks away
        one bad request at a time until the server rejects everything."""
        service = PredictionService(_FakePredictor(), max_batch=2,
                                    batch_window_ms=1.0, max_queue=1)
        try:
            bad = [["not-an-image"]]  # np.asarray(..., float32) raises
            for _ in range(3):  # > max_queue: any leak would trip the cap
                with pytest.raises(ValueError):
                    service.predict_one(bad)
            with service._stats_lock:
                assert service._pending == 0
            out = service.predict_one(np.zeros((16, 16, 3), np.float32))
            assert out["prob"].shape == (16, 16)
            assert service.stats.n_rejected == 0
        finally:
            service.close()

    def test_http_503_with_retry_after(self, image_arr):
        fake = _FakePredictor(forward_s=1.0)
        service = PredictionService(fake, max_batch=2, batch_window_ms=1.0,
                                    max_queue=1)
        server = make_server(service, "127.0.0.1", 0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            body = _png_bytes(image_arr)
            first = {}

            def post():
                first["resp"] = _request(f"{url}/predict", "POST", body)

            t = threading.Thread(target=post)
            t.start()
            time.sleep(0.4)  # first request is inside the slow forward
            req = urllib.request.Request(f"{url}/predict", data=body,
                                         method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=60)
            assert ei.value.code == 503
            assert ei.value.headers.get("Retry-After") == "1"
            assert b"max_queue" in ei.value.read()
            t.join(timeout=30)
            assert first["resp"][0] == 200
        finally:
            server.shutdown()
            server.server_close()
            service.close()


class TestGracefulShutdown:
    def test_shutdown_completes_inflight_request(self, image_arr):
        """The drain sequence (shutdown -> server_close joins handler threads
        -> service.close) must deliver an in-flight request, not drop it."""
        fake = _FakePredictor(forward_s=0.5)
        service = PredictionService(fake, max_batch=2, batch_window_ms=1.0)
        server = make_server(service, "127.0.0.1", 0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        result = {}

        def post():
            result["resp"] = _request(f"{url}/predict", "POST",
                                      _png_bytes(image_arr))

        t = threading.Thread(target=post)
        t.start()
        deadline = time.time() + 10
        while time.time() < deadline:  # wait until the request is accepted
            with service._stats_lock:
                if service._pending >= 1:
                    break
            time.sleep(0.02)
        else:
            pytest.fail("request never reached the service")
        server.shutdown()
        server.server_close()  # joins the in-flight handler thread
        service.close()
        t.join(timeout=30)
        assert result["resp"][0] == 200

    def test_sigterm_drains_and_exits_zero(self, tmp_path):
        """SIGTERM (the orchestrator stop signal) must drain and exit 0, not
        die abruptly — an abrupt kill mid-device-execution can wedge the TPU
        tunnel's device claim (CLAUDE.md hazard) and drops accepted requests."""
        import signal
        import subprocess
        import sys

        ckpt = _make_ckpt(tmp_path, selective=False)
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu');\n"
            "from selectivenet_for_semantic_segmentation_binary_tpu.tools."
            "serve import main;\n"
            f"main(['--model_path', {str(ckpt)!r}, '--port', '0', "
            "'--compute_dtype', 'float32'])"
        )
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        p = subprocess.Popen([sys.executable, "-c", code],
                             stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, env=env, text=True)
        lines = []
        started = threading.Event()

        def _read():
            for line in p.stdout:
                lines.append(line)
                if "serving UNet_B" in line:
                    started.set()

        reader = threading.Thread(target=_read, daemon=True)
        reader.start()
        try:
            assert started.wait(180), f"server never started: {lines}"
            time.sleep(0.2)
            p.send_signal(signal.SIGTERM)
            assert p.wait(timeout=60) == 0
            reader.join(timeout=10)
            out = "".join(lines)
            assert "draining in-flight requests" in out
            assert "drained, bye" in out
        finally:
            if p.poll() is None:
                p.kill()


class TestMetricsEndpoint:
    def test_prometheus_counters_match_info(self, served, image_arr):
        url, service, _ = served
        _request(f"{url}/predict", "POST", _png_bytes(image_arr))
        code, body, ctype = _request(f"{url}/metrics")
        assert code == 200 and ctype.startswith("text/plain")
        text = body.decode()
        metrics = {}
        for line in text.splitlines():
            if line and not line.startswith("#"):
                k, v = line.split()
                metrics[k] = float(v)
        with service._stats_lock:
            stats = service.stats.as_dict()
        assert metrics["snet_requests_total"] == stats["n_requests"]
        assert metrics["snet_batches_total"] == stats["n_batches"]
        assert metrics["snet_errors_total"] == stats["n_errors"]
        assert metrics["snet_rejected_total"] == stats["n_rejected"]
        assert metrics["snet_pending_requests"] == 0
        assert metrics["snet_uptime_seconds"] > 0
        # HELP/TYPE lines present for every metric (prometheus exposition)
        for name in metrics:
            assert f"# TYPE {name} " in text


class TestShardChips:
    """--shard_chips: batches shard over the (virtual 8-device CPU) mesh."""

    def test_buckets_round_up_to_mesh_size(self):
        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
            make_mesh,
        )

        fake = _FakePredictor()
        service = PredictionService(fake, max_batch=4, mesh=make_mesh())
        try:
            n_dev = len(jax.devices())
            assert service._padded_size(1) == n_dev
            out = service.predict_one(np.zeros((16, 16, 3), np.float32))
            assert out["prob"].shape == (16, 16)
            # the device batch was padded to a full even shard
            assert fake.batches[-1][0] == n_dev
        finally:
            service.close()

    def test_sharded_matches_single_chip(self, served, image_arr):
        """Same checkpoint, mesh on vs off: identical probability maps."""
        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
            make_mesh,
        )

        _, _, predictor = served
        img = image_arr.astype(np.float32) / 255.0
        sharded = PredictionService(predictor, max_batch=4, mesh=make_mesh())
        try:
            got = sharded.predict_one(img)
        finally:
            sharded.close()
        padded = np.pad(img, ((0, 4), (0, 4), (0, 0)), mode="edge")
        want = predictor.predict(padded[None])
        np.testing.assert_allclose(got["prob"], want["prob"][0, :36, :44],
                                   atol=1e-5)
        np.testing.assert_array_equal(got["pred"], want["pred"][0, :36, :44])


class TestCompactOutput:
    """--compact_output: uint8 D2H, identical masks, 1/255-quantized probs,
    unchanged response schema."""

    def test_service_matches_full_precision(self, served, image_arr):
        url, _, predictor = served
        compact = PredictionService(predictor, max_batch=4,
                                    batch_window_ms=10.0,
                                    request_timeout_s=300.0,
                                    compact_output=True)
        try:
            img = image_arr.astype(np.float32) / 255.0
            padded, h, w = _pad_to_grid(img)
            full = predictor.predict(padded[None])
            res = compact.predict_one(padded)
            assert set(res) == {"prob", "pred", "selection_prob", "selection"}
            assert res["prob"].dtype == np.float32
            np.testing.assert_array_equal(res["pred"], full["pred"][0])
            np.testing.assert_array_equal(res["selection"],
                                          full["selection"][0])
            assert np.abs(res["prob"] - full["prob"][0].astype(np.float32)
                          ).max() <= 0.5 / 255.0 + 1e-6
        finally:
            compact.close()

    def test_masks_only_requests_skip_prob(self, served, image_arr):
        """want_prob=False on a compact service ships just the masks (the
        measured masks-only D2H path) and they match the prob variant's."""
        _, _, predictor = served
        compact = PredictionService(predictor, max_batch=4,
                                    batch_window_ms=10.0,
                                    request_timeout_s=300.0,
                                    compact_output=True)
        try:
            img = image_arr.astype(np.float32) / 255.0
            masks = compact.predict_one(img, want_prob=False)
            assert set(masks) == {"pred", "selection"}
            both = compact.predict_one(img)  # default keeps the full schema
            assert set(both) == {"prob", "pred", "selection_prob", "selection"}
            np.testing.assert_array_equal(masks["pred"], both["pred"])
            np.testing.assert_array_equal(masks["selection"],
                                          both["selection"])
        finally:
            compact.close()

    def test_full_precision_service_ignores_want_prob(self, served, image_arr):
        """On a non-compact service the hint is a no-op: prob always ships."""
        _, _, predictor = served
        service = PredictionService(predictor, max_batch=2,
                                    batch_window_ms=5.0,
                                    request_timeout_s=300.0)
        try:
            img = image_arr.astype(np.float32) / 255.0
            res = service.predict_one(img, want_prob=False)
            assert "prob" in res and "selection_prob" in res
        finally:
            service.close()

    def test_http_json_rides_masks_only(self, image_arr, tmp_path):
        """End-to-end HTTP on a compact server: format=json (masks-only
        graph) agrees with format=npz (prob graph) on the summary scalars."""
        ckpt = _make_ckpt(str(tmp_path), selective=True)
        predictor = Predictor(ckpt, selective=True, compute_dtype="float32")
        service = PredictionService(predictor, max_batch=2,
                                    batch_window_ms=5.0,
                                    request_timeout_s=300.0,
                                    compact_output=True)
        server = make_server(service, "127.0.0.1", 0,
                             model_info={"compact_output": True})
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            code, body, _ = _request(url + "/predict?format=json",
                                     method="POST",
                                     data=_png_bytes(image_arr))
            assert code == 200
            summary = json.loads(body)
            code, body, _ = _request(url + "/predict?format=npz",
                                     method="POST",
                                     data=_png_bytes(image_arr))
            assert code == 200
            maps = np.load(io.BytesIO(body))
            assert summary["tumor_fraction"] == pytest.approx(
                float(maps["pred"].mean()))
            assert summary["coverage"] == pytest.approx(
                float(maps["selection"].mean()))
        finally:
            server.shutdown()
            server.server_close()
            service.close()

    def test_http_server_serves_compact(self, image_arr, tmp_path):
        """End-to-end HTTP: compact server's npz maps match the direct
        Predictor within the 1/255 quantization step."""
        ckpt = _make_ckpt(str(tmp_path), selective=True)
        predictor = Predictor(ckpt, selective=True, compute_dtype="float32")
        service = PredictionService(predictor, max_batch=2,
                                    batch_window_ms=5.0,
                                    request_timeout_s=300.0,
                                    compact_output=True)
        server = make_server(service, "127.0.0.1", 0,
                             model_info={"compact_output": True})
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            code, body, _ = _request(url + "/predict?format=npz",
                                     method="POST",
                                     data=_png_bytes(image_arr))
            assert code == 200
            maps = np.load(io.BytesIO(body))
            img = image_arr.astype(np.float32) / 255.0
            padded, h, w = _pad_to_grid(img)
            direct = predictor.predict(padded[None])
            np.testing.assert_array_equal(maps["pred"],
                                          direct["pred"][0, :h, :w])
            assert np.abs(maps["prob"]
                          - direct["prob"][0, :h, :w].astype(np.float32)
                          ).max() <= 0.5 / 255.0 + 1e-6
        finally:
            server.shutdown()
            server.server_close()
            service.close()
