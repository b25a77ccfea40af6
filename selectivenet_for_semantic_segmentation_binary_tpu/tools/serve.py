"""Warm inference HTTP server (``snet-serve``).

The reference has no deployment story at all — inference lives in notebook
cells (u-net_testing.ipynb cells 6-8, 64-74) that rebuild the model and pay
the full startup cost per run. This module is the production-serving
counterpart: one process loads a checkpoint once, keeps the jitted BN-folded
forward warm on the chip, and serves predictions over HTTP for as long as it
runs.

TPU-native design points (all static-shape discipline):

* **Micro-batching with occupancy buckets.** Concurrent requests whose images
  pad to the same pool-grid shape are grouped into one device batch. The
  batch dimension is padded up to the next power of two (capped at
  ``--max_batch``), so XLA compiles at most ``log2(max_batch)+1`` programs
  per image shape instead of one per occupancy — critical over the axon
  tunnel where each fresh compile costs 24 s-19 min (docs/RESULTS.md).
* **One worker thread owns the device.** HTTP handler threads only decode
  and enqueue; a single batcher thread runs every forward, so device
  execution is serialized without a lock and batching happens naturally
  under load.
* **Warmup at startup** (``--warmup H W``): pays the first compile before
  the server accepts traffic, so the first request is served at steady-state
  latency.
* **Multi-chip serving** (``--shard_chips 1``): device batches are sharded
  on dim 0 over a 1-D mesh of all visible chips (data-parallel requests,
  zero cross-chip communication — the same regime as
  ``snet-predict --shard_windows``); occupancy buckets round up to a
  multiple of the mesh size so shards stay even.

Endpoints:

* ``GET /healthz`` — liveness + device backend.
* ``GET /info`` — model/server config and serving statistics (requests,
  batches, mean occupancy, shapes seen).
* ``GET /metrics`` — the same counters in Prometheus text format (plus a
  pending-requests gauge), scrape-ready.
* ``POST /predict`` — request body is a JPEG/PNG image. Query parameters:
  ``format=json|png|npz`` (default ``json``) and for ``png`` which map to
  render: ``output=pred|selection`` (default ``pred``). ``json`` returns the
  scalar summary (tumor_fraction, coverage); ``npz`` returns the full
  ``prob``/``pred`` (and ``selection_prob``/``selection``) arrays. With
  ``--max_queue N`` set, floods past N pending requests are shed with 503 +
  ``Retry-After`` (backpressure) instead of growing latency unboundedly.

Images of any size work: each is edge-padded to the pool grid (dims
divisible by 8) exactly like ``snet-predict`` (tools/predict.py) and the
outputs are cropped back. GH stain conversion and blank-field correction are
applied server-side when the checkpoint was trained that way
(``--input_type GH`` / ``--blankfield 1``).
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from .predict import _load_image, _pad_to_grid
from .tiled_inference import GRID


def _bucket(n: int, max_batch: int) -> int:
    """Smallest power of two >= n, capped at max_batch."""
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class ServerBusyError(RuntimeError):
    """Raised by :meth:`PredictionService.predict_one` when the pending queue
    is at ``max_queue`` — the HTTP layer maps it to 503 + ``Retry-After`` so a
    flood degrades into fast rejections instead of unbounded latency."""


@dataclass
class _Request:
    image: np.ndarray          # (H, W, C) uint8 [0,255] or float32 [0,1], grid-padded
    orig_hw: Tuple[int, int]   # crop target
    want_prob: bool = True     # False (compact servers only): masks suffice
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[Dict[str, np.ndarray]] = None
    error: Optional[BaseException] = None


@dataclass
class ServeStats:
    n_requests: int = 0
    n_batches: int = 0
    n_errors: int = 0
    n_rejected: int = 0  # backpressure 503s (max_queue exceeded)
    occupancy_sum: int = 0
    padded_sum: int = 0
    shapes: set = field(default_factory=set)

    def as_dict(self) -> Dict:
        batches = max(self.n_batches, 1)
        return {
            "n_requests": self.n_requests,
            "n_batches": self.n_batches,
            "n_errors": self.n_errors,
            "n_rejected": self.n_rejected,
            "mean_occupancy": self.occupancy_sum / batches,
            "mean_padded_batch": self.padded_sum / batches,
            "shapes_seen": sorted(list(self.shapes)),
        }


class PredictionService:
    """Micro-batching wrapper around the serving :class:`~..predictor.Predictor`.

    ``predict_one(image)`` blocks the calling thread until its request has
    been served as part of a device batch; it is safe to call from many
    threads concurrently (that is the point — concurrent callers share a
    forward).
    """

    def __init__(self, predictor, max_batch: int = 8,
                 batch_window_ms: float = 5.0,
                 request_timeout_s: float = 1800.0, mesh=None,
                 max_queue: int = 0, compact_output: bool = False):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        if max_queue < 0:
            raise ValueError(f"max_queue must be >= 0, got {max_queue}")
        self.predictor = predictor
        # compact_output: the device thresholds + quantizes on-chip and the
        # whole response ships D2H as uint8 (Predictor.predict_compact) —
        # masks identical, probabilities quantized to 1/255 (reconstructed
        # as prob_u8/255 when requested). Requests that declare
        # want_prob=False (the HTTP json/png formats) skip the prob planes
        # entirely and ride the masks-only graph when the whole micro-batch
        # agrees.
        self.compact_output = bool(compact_output)
        self.max_batch = int(max_batch)
        # backpressure: > 0 caps the pending-request depth; predict_one then
        # fails fast with ServerBusyError (HTTP 503) instead of queueing into
        # unbounded latency. 0 = unbounded (the in-process API default).
        self.max_queue = int(max_queue)
        self.batch_window_s = float(batch_window_ms) / 1000.0
        self.request_timeout_s = float(request_timeout_s)
        # optional 1-D device mesh: the device batch is sharded on dim 0
        # across its chips (data-parallel requests, zero cross-chip
        # communication — the same regime as tiled_inference --shard_windows)
        self.mesh = mesh
        self._n_dev = int(mesh.devices.size) if mesh is not None else 1
        if mesh is not None:
            from ..parallel.mesh import batch_sharding

            self._sharding = batch_sharding(mesh)
        self.stats = ServeStats()
        self._stats_lock = threading.Lock()
        self._pending = 0  # accepted but not yet completed (guarded by _stats_lock)
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._leftover: List[_Request] = []  # wrong-shape items pulled early
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="snet-serve-batcher")
        self._worker.start()

    # -- public ---------------------------------------------------------------
    def predict_one(self, image: np.ndarray,
                    want_prob: bool = True) -> Dict[str, np.ndarray]:
        """One (H, W, C) raw image (float [0, 1] or uint8 [0, 255] — uint8
        ships to the device as bytes, ops/ingest.py) -> {'prob', 'pred'[,
        'selection_prob', 'selection']}, each cropped back to (H, W).

        ``want_prob=False`` (only meaningful on a ``compact_output`` service)
        declares that the caller reads masks only: if every request in the
        micro-batch agrees, the device ships just the uint8 masks — half the
        D2H again over compact (the measured masks-only path,
        docs/RESULTS.md) — and the result has no ``prob``/``selection_prob``.
        A full-precision service ignores the hint (prob is free there)."""
        with self._stats_lock:
            if self.max_queue and self._pending >= self.max_queue:
                self.stats.n_rejected += 1
                raise ServerBusyError(
                    f"{self._pending} requests already pending "
                    f"(max_queue={self.max_queue}); retry shortly")
            self._pending += 1
        try:
            padded, h, w = _pad_to_grid(np.asarray(image))
            req = _Request(image=padded, orig_hw=(h, w),
                           want_prob=bool(want_prob) or not self.compact_output)
        except BaseException:
            # the slot was reserved above; a pre-enqueue failure must release
            # it or max_queue capacity leaks away one request at a time
            with self._stats_lock:
                self._pending -= 1
            raise
        self._queue.put(req)
        if not req.done.wait(self.request_timeout_s):
            raise TimeoutError(
                f"prediction not served within {self.request_timeout_s:.0f}s "
                "(a first-time compile on the tunnel can be slow; retry or "
                "raise --request_timeout_s)")
        if req.error is not None:
            raise req.error
        return req.result

    def warmup(self, h: int, w: int, channels: int,
               dtype=np.float32) -> None:
        """Pay the compile for (h, w) at every occupancy bucket. ``dtype``
        must match the traffic's ingest dtype (uint8 for plain-RGB servers,
        float32 when a host transform runs) — jit specializes per dtype, so
        a mismatch would push the compile onto the first request."""
        img = np.zeros((h, w, channels), dtype)
        # compact servers run TWO jitted variants (prob + masks-only, keyed
        # by the requests' want_prob); warm both so neither lands the compile
        # on the first json/png vs npz request
        variants = (True, False) if self.compact_output else (True,)
        for b in sorted({self._padded_size(n)
                         for n in range(1, self.max_batch + 1)}):
            for wp in variants:
                self._forward_group([_Request(image=_pad_to_grid(img)[0],
                                              orig_hw=(h, w), want_prob=wp)
                                     for _ in range(b)])

    def close(self) -> None:
        self._queue.put(None)
        self._worker.join(timeout=30.0)

    # -- worker ---------------------------------------------------------------
    def _take(self, timeout: Optional[float]) -> Optional[_Request]:
        """Next pending request: leftovers first, then the queue."""
        if self._leftover:
            return self._leftover.pop(0)
        try:
            return self._queue.get(timeout=timeout)
        except queue.Empty:
            return None

    def _run(self) -> None:
        while True:
            first = self._take(timeout=None)
            if first is None:  # close() sentinel
                return
            group = [first]
            deadline = time.monotonic() + self.batch_window_s
            mismatched: List[_Request] = []
            while len(group) < self.max_batch:
                rem = deadline - time.monotonic()
                if rem <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=rem)
                except queue.Empty:
                    break
                if nxt is None:
                    self._queue.put(None)  # re-arm the sentinel, drain group
                    break
                if (nxt.image.shape == first.image.shape
                        and nxt.image.dtype == first.image.dtype):
                    group.append(nxt)
                else:
                    mismatched.append(nxt)
            # wrong-shape requests go to the FRONT of the next iteration so a
            # steady same-shape stream cannot starve them
            self._leftover.extend(mismatched)
            try:
                self._forward_group(group)
            except BaseException as e:  # noqa: BLE001 — delivered per request
                with self._stats_lock:
                    self.stats.n_errors += len(group)
                for r in group:
                    r.error = e
                    r.done.set()
            finally:
                with self._stats_lock:
                    self._pending -= len(group)

    def _padded_size(self, n: int) -> int:
        """Device rows for n requests: the power-of-two occupancy bucket,
        rounded up to a multiple of the mesh size so shards stay even."""
        b = _bucket(n, self.max_batch)
        if self._n_dev > 1:
            b = ((b + self._n_dev - 1) // self._n_dev) * self._n_dev
        return b

    def _forward_group(self, group: List[_Request]) -> None:
        batch = np.stack([r.image for r in group])
        n = len(group)
        b = self._padded_size(n)
        if b > n:  # occupancy padding: same compiled program for 1..b requests
            pad = np.zeros((b - n,) + batch.shape[1:], batch.dtype)
            batch = np.concatenate([batch, pad], axis=0)
        if self.mesh is not None:
            import jax

            batch = jax.device_put(batch, self._sharding)
        if self.compact_output:
            # masks-only only when EVERY request in the group agrees — a
            # mixed group upgrades to the prob graph (supersets the answer)
            want_prob = any(r.want_prob for r in group)
            out = self.predictor.predict_compact(batch, want_prob=want_prob)
        else:
            out = self.predictor.predict(batch)
        with self._stats_lock:
            self.stats.n_requests += n
            self.stats.n_batches += 1
            self.stats.occupancy_sum += n
            self.stats.padded_sum += b
            self.stats.shapes.add(batch.shape[1:3])
        for i, r in enumerate(group):
            h, w = r.orig_hw
            res = {k: v[i, :h, :w] for k, v in out.items()}
            if self.compact_output:  # same response schema, 1/255-quantized
                if "prob_u8" in res:
                    res["prob"] = res.pop("prob_u8").astype(np.float32) / 255.0
                if "selection_prob_u8" in res:
                    res["selection_prob"] = (
                        res.pop("selection_prob_u8").astype(np.float32) / 255.0)
            else:
                res["prob"] = np.asarray(res["prob"], np.float32)
                if "selection_prob" in res:
                    res["selection_prob"] = np.asarray(res["selection_prob"],
                                                       np.float32)
            r.result = res
            r.done.set()


# -- HTTP layer ----------------------------------------------------------------

def make_server(service: PredictionService, host: str, port: int,
                input_type: str = "RGB", blankfield: bool = False,
                max_body_mb: float = 64.0, model_info: Optional[Dict] = None):
    """Build (not start) a ThreadingHTTPServer serving ``service``."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    started = time.monotonic()
    max_body = int(max_body_mb * 1024 * 1024)
    info = dict(model_info or {})
    info.update({"input_type": input_type, "blankfield": bool(blankfield),
                 "max_batch": service.max_batch,
                 "max_queue": service.max_queue,
                 "batch_window_ms": service.batch_window_s * 1000.0,
                 "n_chips": service._n_dev})

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        # default logging writes every request to stderr; keep it quiet unless
        # the server was built verbose
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send(self, code: int, body: bytes, ctype: str,
                  headers: Optional[Dict[str, str]] = None) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj: Dict) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802 — http.server API
            path = urlparse(self.path).path
            if path == "/healthz":
                import jax

                self._send_json(200, {
                    "status": "ok",
                    "backend": jax.default_backend(),
                    "uptime_s": round(time.monotonic() - started, 3),
                })
            elif path == "/info":
                with service._stats_lock:
                    stats = service.stats.as_dict()
                self._send_json(200, {"model": info, "stats": stats})
            elif path == "/metrics":
                with service._stats_lock:
                    s = service.stats
                    pending = service._pending
                    lines = [
                        "# HELP snet_requests_total requests served",
                        "# TYPE snet_requests_total counter",
                        f"snet_requests_total {s.n_requests}",
                        "# HELP snet_batches_total device batches executed",
                        "# TYPE snet_batches_total counter",
                        f"snet_batches_total {s.n_batches}",
                        "# HELP snet_errors_total requests failed in the forward",
                        "# TYPE snet_errors_total counter",
                        f"snet_errors_total {s.n_errors}",
                        "# HELP snet_rejected_total requests shed by max_queue backpressure",
                        "# TYPE snet_rejected_total counter",
                        f"snet_rejected_total {s.n_rejected}",
                        "# HELP snet_batch_occupancy_sum real requests summed over batches",
                        "# TYPE snet_batch_occupancy_sum counter",
                        f"snet_batch_occupancy_sum {s.occupancy_sum}",
                        "# HELP snet_batch_padded_sum padded device rows summed over batches",
                        "# TYPE snet_batch_padded_sum counter",
                        f"snet_batch_padded_sum {s.padded_sum}",
                        "# HELP snet_pending_requests accepted, not yet completed",
                        "# TYPE snet_pending_requests gauge",
                        f"snet_pending_requests {pending}",
                        "# HELP snet_uptime_seconds time since server build",
                        "# TYPE snet_uptime_seconds gauge",
                        f"snet_uptime_seconds {time.monotonic() - started:.3f}",
                    ]
                self._send(200, ("\n".join(lines) + "\n").encode(),
                           "text/plain; version=0.0.4")
            else:
                self._send_json(404, {"error": f"unknown path {path}"})

        def do_POST(self):  # noqa: N802
            url = urlparse(self.path)
            if url.path != "/predict":
                self.close_connection = True
                self._send_json(404, {"error": f"unknown path {url.path}"})
                return
            q = parse_qs(url.query)
            fmt = q.get("format", ["json"])[0]
            output = q.get("output", ["pred"])[0]
            # any rejection issued before the body is consumed must close the
            # connection, or the unread bytes corrupt the next keep-alive
            # request on this socket (we are HTTP/1.1)
            if fmt not in ("json", "png", "npz"):
                self.close_connection = True
                self._send_json(400, {"error": f"unknown format {fmt!r} "
                                               "(json|png|npz)"})
                return
            if output not in ("pred", "selection"):
                self.close_connection = True
                self._send_json(400, {"error": f"unknown output {output!r} "
                                               "(pred|selection)"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                length = 0
            if length <= 0:
                self.close_connection = True
                self._send_json(400, {"error": "empty request body "
                                               "(POST the image bytes)"})
                return
            if length > max_body:
                self.close_connection = True
                self._send_json(413, {"error": f"body {length} B exceeds "
                                               f"limit {max_body} B"})
                return
            body = self.rfile.read(length)
            try:
                # PIL accepts file objects, so the predict-CLI loader works on
                # the request body unchanged (decode + stain + blankfield)
                image = _load_image(io.BytesIO(body), input_type, blankfield)
            except Exception as e:  # noqa: BLE001 — client error
                self._send_json(400, {"error": f"could not decode image: {e}"})
                return
            try:
                # json/png responses read only the masks, so compact servers
                # can ship the masks-only uint8 planes (half the D2H); npz
                # exposes the probability arrays and needs the prob graph
                out = service.predict_one(image, want_prob=(fmt == "npz"))
            except ServerBusyError as e:
                self._send(503, json.dumps({"error": str(e)}).encode(),
                           "application/json", headers={"Retry-After": "1"})
                return
            except TimeoutError as e:
                self._send_json(504, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001
                self._send_json(500, {"error": f"prediction failed: {e}"})
                return
            self._respond(out, fmt, output, image.shape)

        def _respond(self, out: Dict[str, np.ndarray], fmt: str,
                     output: str, shape) -> None:
            if fmt == "json":
                resp = {
                    "shape": [int(shape[0]), int(shape[1])],
                    "tumor_fraction": float(out["pred"].mean()),
                }
                if "selection" in out:
                    resp["coverage"] = float(out["selection"].mean())
                self._send_json(200, resp)
            elif fmt == "png":
                if output == "selection" and "selection" not in out:
                    self._send_json(400, {"error": "output=selection needs a "
                                                   "selective checkpoint"})
                    return
                from PIL import Image

                # space CE-head class ids evenly over gray levels; binary
                # (n_cls=2) keeps the 0/255 convention. Plain *255 would wrap
                # in uint8 for class ids >= 2 (2 -> 254, 3 -> 253).
                scale = (255 // max(int(info.get("n_cls", 2)) - 1, 1)
                         if output == "pred" else 255)
                arr = (out[output].astype(np.uint8) * np.uint8(scale))
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="PNG")
                self._send(200, buf.getvalue(), "image/png")
            else:  # npz
                buf = io.BytesIO()
                np.savez_compressed(buf, **{k: np.asarray(v)
                                            for k, v in out.items()})
                self._send(200, buf.getvalue(), "application/octet-stream")

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> None:
    """CLI: python -m selectivenet_for_semantic_segmentation_binary_tpu.tools.serve"""
    import argparse

    from ..config import parse_bool

    parser = argparse.ArgumentParser(
        description="warm inference HTTP server over the serving Predictor "
                    "(micro-batched, static-shape, BN-folded forward)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8500)
    parser.add_argument("--model_path", default=None,
                        help="one specific .ckpt/.pth checkpoint")
    parser.add_argument("--model_dir", default=None,
                        help="checkpoint dir: the digit-latest model_epoch{N} "
                             "file is used (reference resume convention)")
    parser.add_argument("--model_arch", default="UNet_B",
                        choices=["UNet", "UNet_B"])
    parser.add_argument("--n_cls", type=int, default=2)
    parser.add_argument("--selective", type=parse_bool, default=False)
    parser.add_argument("--input_type", default="RGB", choices=["RGB", "GH"])
    parser.add_argument("--blankfield", type=parse_bool, default=False)
    parser.add_argument("--compute_dtype", default="bfloat16")
    parser.add_argument("--cut_off", type=float, default=0.5)
    parser.add_argument("--s_cut_off", type=float, default=0.5)
    parser.add_argument("--fold_bn", type=parse_bool, default=True)
    parser.add_argument("--quantize", default="none", choices=["none", "int8"],
                        help="int8: W8A8 quantized serving trunk (measured "
                             "1.27x over the bf16 folded forward, "
                             "docs/RESULTS.md); requires --calib_images")
    parser.add_argument("--calib_images", nargs="+", default=None,
                        metavar="PATH",
                        help="representative images (files or directories) "
                             "that calibrate the int8 activation scales "
                             "BEFORE warmup/traffic — lazy first-request "
                             "calibration would invalidate the warmup "
                             "compile; preprocessed exactly like requests "
                             "(--input_type / --blankfield)")
    parser.add_argument("--max_batch", type=int, default=8,
                        help="micro-batch cap; occupancies are padded to "
                             "powers of two up to this")
    parser.add_argument("--shard_chips", type=parse_bool, default=False,
                        help="shard device batches across all visible chips "
                             "(data-parallel requests; buckets round up to "
                             "a multiple of the chip count)")
    parser.add_argument("--batch_window_ms", type=float, default=5.0,
                        help="how long the batcher waits to fill a batch "
                             "after the first request arrives")
    parser.add_argument("--max_queue", type=int, default=0,
                        help="backpressure: cap on accepted-but-unserved "
                             "requests; past it /predict fails fast with 503 "
                             "+ Retry-After instead of queueing into "
                             "unbounded latency. 0 = unbounded (default); "
                             "a good production value is 4*max_batch")
    parser.add_argument("--compact_output", type=parse_bool, default=False,
                        help="threshold + quantize on-device and ship every "
                             "response plane D2H as uint8 "
                             "(Predictor.predict_compact): pred/selection "
                             "masks identical, prob/selection_prob "
                             "quantized to 1/255; npz responses keep their "
                             "schema, while json/png requests ride the "
                             "masks-only graph (no prob planes at all — "
                             "half the D2H again, docs/RESULTS.md). Cuts "
                             "the output-transfer term of serving latency")
    parser.add_argument("--request_timeout_s", type=float, default=1800.0)
    parser.add_argument("--max_body_mb", type=float, default=64.0)
    parser.add_argument("--warmup", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="compile the forward for this image size (every "
                             "occupancy bucket) before accepting traffic — "
                             "recommended: --warmup 256 256")
    a = parser.parse_args(argv)

    if a.max_batch < 1:
        parser.error(f"--max_batch must be >= 1, got {a.max_batch}")

    from ..utils.checkpoint import resolve_checkpoint

    try:
        ckpt = resolve_checkpoint(a.model_path, a.model_dir)
    except ValueError as e:
        parser.error(str(e))

    from ..predictor import Predictor

    if a.quantize == "int8":
        if not a.calib_images:
            parser.error("--quantize int8 requires --calib_images: the "
                         "server must calibrate activation scales before "
                         "warmup/traffic (lazy first-request calibration "
                         "would recompile after warmup)")
        if not a.fold_bn:
            parser.error("--quantize int8 requires --fold_bn 1 (the int8 "
                         "trunk consumes BN-folded weights, ops/quant.py)")
    elif a.calib_images:
        parser.error("--calib_images without --quantize int8 has no effect")

    predictor = Predictor(
        ckpt, model_arch=a.model_arch, n_cls=a.n_cls, selective=a.selective,
        compute_dtype=a.compute_dtype, cut_off=a.cut_off,
        s_cut_off=a.s_cut_off, fold_bn=a.fold_bn, quantize=a.quantize,
    )
    if a.quantize == "int8":
        from .predict import _collect_inputs

        paths = _collect_inputs(a.calib_images)
        calib = [_pad_to_grid(_load_image(p, a.input_type, a.blankfield))[0]
                 for p in paths]
        predictor.calibrate(calib)
        print(f"int8 serving trunk: calibrated on {len(calib)} images",
              flush=True)
    mesh = None
    if a.shard_chips:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"sharding device batches over {mesh.devices.size} chips",
              flush=True)
    service = PredictionService(predictor, max_batch=a.max_batch,
                                batch_window_ms=a.batch_window_ms,
                                request_timeout_s=a.request_timeout_s,
                                mesh=mesh, max_queue=a.max_queue,
                                compact_output=a.compact_output)
    channels = 2 if a.input_type == "GH" else 3
    # plain-RGB servers ingest uint8 (tools/predict._load_image fast path);
    # host-transformed inputs (GH/H_RGB stain, blankfield) arrive float32
    traffic_dtype = (np.uint8 if a.input_type == "RGB" and not a.blankfield
                     else np.float32)
    if a.warmup:
        h, w = a.warmup
        print(f"warming up {h}x{w} (buckets up to {a.max_batch})...",
              flush=True)
        t0 = time.monotonic()
        service.warmup(h, w, channels, dtype=traffic_dtype)
        print(f"warmup done in {time.monotonic() - t0:.1f}s", flush=True)

    model_info = {
        "checkpoint": ckpt, "model_arch": a.model_arch, "n_cls": a.n_cls,
        "selective": bool(a.selective), "compute_dtype": a.compute_dtype,
        "cut_off": a.cut_off, "s_cut_off": a.s_cut_off,
        "fold_bn": bool(a.fold_bn), "quantize": a.quantize,
        "compact_output": bool(a.compact_output),
    }
    server = make_server(service, a.host, a.port, input_type=a.input_type,
                         blankfield=a.blankfield, max_body_mb=a.max_body_mb,
                         model_info=model_info)
    print(f"serving {a.model_arch} (selective={bool(a.selective)}) "
          f"on http://{a.host}:{server.server_address[1]}  "
          f"(POST /predict, GET /healthz, GET /info, GET /metrics)",
          flush=True)

    # Graceful SIGTERM (the orchestrator stop signal): stop accepting, let
    # in-flight requests finish (server_close joins handler threads), drain
    # the batcher, exit 0. The default abrupt death would kill the process
    # mid-device-execution — which can wedge the TPU tunnel's device claim
    # for minutes (CLAUDE.md hazard) — and drop accepted requests on the
    # floor. shutdown() must run off the serve_forever thread or it
    # deadlocks, hence the helper thread.
    import signal

    def _graceful(signum, frame):  # noqa: ARG001 — signal API
        print("SIGTERM: draining in-flight requests...", flush=True)
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("shutting down", flush=True)
    finally:
        server.server_close()   # joins in-flight handler threads
        service.close()         # drains the micro-batcher worker
        print("drained, bye", flush=True)


if __name__ == "__main__":
    main()
