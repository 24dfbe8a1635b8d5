"""Production HTTP serving for trained detection models.

The reference has no serving story at all (inference exists only inside its
validation loops); this module turns a trained run — or an AOT-exported
StableHLO artifact — into a long-lived batching prediction service:

- **Request batching onto one compiled shape**: incoming requests queue and
  a single dispatcher thread gathers up to ``batch_size`` of them (waiting
  at most ``max_delay_ms`` after the first), pads the batch to exactly
  ``batch_size`` (static shapes — one XLA executable reused forever), and
  runs one device dispatch for the whole group. Throughput scales with the
  chip's batch sweet spot (bench.py: batch 128 saturates a v5e) while
  single-request latency is bounded by the delay budget.
- **Stateless HTTP/JSON API** (stdlib http.server, threading): POST
  ``/v1/predict`` with base64-PNG ``pre``/``post``; masks come back as
  base64 PNGs. ``GET /healthz`` reports readiness and config.
- **Raw binary wire format** (the production fast path): POST the same
  endpoint with ``Content-Type: application/octet-stream``, headers
  ``X-Height``/``X-Width``, and a body of exactly ``2*H*W*3`` uint8 bytes
  (pre then post, HWC, already in the task's channel order — RGB except
  BDA's BGR). Send ``Accept: application/octet-stream`` to get the masks
  back as one concatenated uint8 body described by an ``X-Parts`` header
  (``name:height:width,...``). This skips PNG codec + base64 + JSON on
  both directions — on a host with few cores the JSON path is codec-bound
  long before the chip saturates (tests/manual_serve_bench.py --wire
  measures the difference); the values are byte-identical to what the
  JSON path's PNGs decode to.
- **Tiled mode**: ``tiled=True`` serves native-resolution scenes through
  :class:`~change3d_tpu.inference.TiledPredictor` (per-request windowing,
  no cross-request batching).

Channel order matches the training data pins (`data/datasets.py`): BCD/SCD
decode to RGB, BDA stays BGR — send PNGs as saved on disk and the server
handles it (raw bodies skip that convenience; PredictClient.predict_raw
restores it client-side).
"""

from __future__ import annotations

import base64
import json
import queue
import signal
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Deque, Dict, List, Optional, Tuple

import numpy as np

# Largest accepted request body (two base64 PNGs; 256 MB covers ~90 MP
# scenes with headroom). Module-level so deployments can raise it.
MAX_BODY_BYTES = 256 * 1024 * 1024


class _Stats:
    """Lock-guarded serving counters + a latency ring buffer (seconds)."""

    def __init__(self, window: int = 1024):
        self._lock = threading.Lock()
        self._window = window
        self.reset()

    def reset(self):
        """Zero every counter (e.g. after warmup, so /metrics reflects only
        real traffic). Safe to call concurrently with recording."""
        with self._lock:
            self.requests_total = 0
            self.errors_total = 0
            self.batches_total = 0
            self.batched_requests_total = 0
            self._latencies: Deque[float] = deque(maxlen=self._window)

    def record_request(self, seconds: float, ok: bool):
        with self._lock:
            self.requests_total += 1
            if not ok:
                self.errors_total += 1
            self._latencies.append(seconds)

    def record_batch(self, fill: int):
        with self._lock:
            self.batches_total += 1
            self.batched_requests_total += fill

    def snapshot(self) -> dict:
        import math

        with self._lock:
            lat = sorted(self._latencies)
            # Nearest-rank percentile: ceil(p*n)-1 (int(p*n) overshoots —
            # p50 of [a, b] must be a, not b).
            q = lambda p: (
                round(lat[max(0, math.ceil(p * len(lat)) - 1)], 4) if lat else None
            )
            return {
                "requests_total": self.requests_total,
                "errors_total": self.errors_total,
                "batches_total": self.batches_total,
                "mean_batch_fill": (
                    round(self.batched_requests_total / self.batches_total, 2)
                    if self.batches_total else None
                ),
                "latency_s": {"p50": q(0.50), "p90": q(0.90), "p99": q(0.99)},
            }


def _normalize(img: np.ndarray) -> np.ndarray:
    from change3d_tpu.data.transforms import eval_normalize

    return eval_normalize(img)


def _normalize_cc(img: np.ndarray) -> np.ndarray:
    """Captioning normalization: /255 then ImageNet mean/std
    (ref: /root/reference/scripts/train_CC.py:466-469)."""
    from change3d_tpu.data.datasets import CaptionDataset

    return (img.astype(np.float32) / 255.0 - CaptionDataset.MEAN) / CaptionDataset.STD


def decode_image(b64: str, *, to_rgb: bool) -> np.ndarray:
    import cv2

    raw = np.frombuffer(base64.b64decode(b64, validate=True), np.uint8)
    img = cv2.imdecode(raw, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("not a decodable image")
    return img[:, :, ::-1] if to_rgb else img


def encode_mask(mask: np.ndarray) -> str:
    import cv2

    ok, buf = cv2.imencode(".png", np.ascontiguousarray(mask.astype(np.uint8)))
    if not ok:
        raise ValueError("png encode failed")
    return base64.b64encode(buf.tobytes()).decode("ascii")


def masks_to_arrays(task: str, out: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Hardened per-image maps -> the uint8 arrays the response carries
    (exactly the pixel values the JSON path's PNGs encode; the same
    per-task files cli predict writes)."""
    u8 = lambda a: np.ascontiguousarray(np.asarray(a).astype(np.uint8))
    if task == "bcd":
        return {"change": u8(out["change"] * 255)}
    if task == "scd":
        change = out["change"]
        return {
            "pre": u8(out["pre"] * change),
            "post": u8(out["post"] * change),
            "change": u8(change * 255),
        }
    return {"loc": u8(out["loc"] * 255), "cls": u8(out["cls"])}


def masks_to_payload(task: str, out: Dict[str, np.ndarray]) -> Dict[str, str]:
    """Hardened per-image maps -> base64-PNG response fields. CC returns
    plain text."""
    if task == "cc":
        return {"caption": str(out["caption"])}
    return {k: encode_mask(v) for k, v in masks_to_arrays(task, out).items()}


class _Batcher:
    """Gathers requests into fixed-size device batches.

    One dispatcher thread owns the device: it blocks on the first pending
    request, then drains up to ``batch_size`` (waiting at most ``max_delay``
    seconds for stragglers), pads to exactly ``batch_size`` by repeating the
    last pair, and runs ``predict_batch`` once for the group.

    **Pipelined mode** (``predict_async``/``finalize`` given): the
    dispatcher only LAUNCHES each batch (JAX dispatch is asynchronous) and
    hands the device handles to a completer thread that blocks on the
    device->host fetch and distributes results. The fetch of batch N then
    overlaps the transfer+compute of batch N+1 — decisive when the chip is
    behind a slow link, where the result download otherwise serializes
    with compute. A bounded in-flight queue (2 batches) provides
    backpressure so device memory stays fixed.

    **Bucketed batching** (``buckets``): a partial group pads only to the
    smallest compiled bucket that fits, not to ``batch_size`` — under
    partial load the host->device transfer and compute scale with actual
    traffic instead of paying the full-batch padding tax (XLA compiles one
    executable per bucket; the service warms them all up at startup).
    """

    def __init__(self, predict_batch, batch_size: int, max_delay: float,
                 stats: Optional[_Stats] = None,
                 predict_async=None, finalize=None,
                 buckets: Optional[Tuple[int, ...]] = None):
        self._predict_batch = predict_batch
        self.batch_size = batch_size
        self.buckets = tuple(sorted(buckets or (batch_size,)))
        if self.buckets[-1] != batch_size:
            raise ValueError(
                f"largest bucket {self.buckets[-1]} must equal batch_size "
                f"{batch_size}")
        self.max_delay = max_delay
        self._stats = stats
        self._lock = threading.Condition()
        self._pending: List[dict] = []
        self._closed = False
        self._predict_async = predict_async if finalize is not None else None
        self._finalize = finalize
        self._inflight: Optional[queue.Queue] = None
        self._completer: Optional[threading.Thread] = None
        if self._predict_async is not None:
            self._inflight = queue.Queue(maxsize=2)
            self._completer = threading.Thread(target=self._complete, daemon=True)
            self._completer.start()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, np.ndarray]:
        """Blocks until the request's batch has been served; returns this
        request's hardened maps (or raises the batch's failure)."""
        return self.submit_many([(pre, post)])[0]

    def submit_many(self, pairs) -> List[Dict[str, np.ndarray]]:
        """Enqueue many (pre, post) pairs at once and block until all are
        served. One handler thread carrying N pairs costs N events, not N
        HTTP round trips — the bulk wire's device-side half. Pairs from
        concurrent bulk (and single) submitters coalesce into shared
        batches exactly like single submissions."""
        items = [
            {"pre": p, "post": q, "event": threading.Event()} for p, q in pairs
        ]
        with self._lock:
            if self._closed:
                raise RuntimeError("server is shut down")
            self._pending.extend(items)
            self._lock.notify()
        for item in items:
            item["event"].wait()
        for item in items:
            if "error" in item:
                raise item["error"]
        return [item["result"] for item in items]

    def close(self):
        with self._lock:
            self._closed = True
            self._lock.notify()
        self._thread.join(timeout=5)
        if self._completer is not None:
            self._completer.join(timeout=5)

    def _take_batch(self) -> List[dict]:
        with self._lock:
            while not self._pending and not self._closed:
                self._lock.wait()
            if self._closed and not self._pending:
                return []
            deadline = time.monotonic() + self.max_delay
            while len(self._pending) < self.batch_size and not self._closed:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._lock.wait(timeout=remaining)
            batch, self._pending = (
                self._pending[: self.batch_size],
                self._pending[self.batch_size :],
            )
            return batch

    @staticmethod
    def _fail(batch: List[dict], e: Exception):
        for item in batch:
            item["error"] = e
            item["event"].set()

    @classmethod
    def _distribute(cls, batch: List[dict], out: Dict[str, np.ndarray]):
        try:
            results = [{k: v[i] for k, v in out.items()} for i in range(len(batch))]
        except Exception as e:  # noqa: BLE001 — never leave a waiter hanging
            cls._fail(batch, e)
            return
        for item, res in zip(batch, results):
            item["result"] = res
            item["event"].set()

    def _run(self):
        while True:
            batch = self._take_batch()
            if not batch:
                if self._inflight is not None:
                    self._inflight.put(None)
                return
            n = len(batch)
            if self._stats:
                self._stats.record_batch(n)
            try:
                pre = np.stack([b["pre"] for b in batch])
                post = np.stack([b["post"] for b in batch])
                bucket = min(b for b in self.buckets if b >= n)
                pad = bucket - n
                if pad:
                    pre = np.concatenate([pre, np.repeat(pre[-1:], pad, 0)])
                    post = np.concatenate([post, np.repeat(post[-1:], pad, 0)])
                if self._predict_async is not None:
                    # Launch only; the completer fetches. Blocks (bounded
                    # queue) when 2 batches are already in flight.
                    handles = self._predict_async(pre, post)
                    self._inflight.put((batch, handles))
                    continue
                out = self._predict_batch(pre, post)
            except Exception as e:  # noqa: BLE001 — failures propagate per request
                self._fail(batch, e)
                continue
            self._distribute(batch, out)

    def _complete(self):
        while True:
            entry = self._inflight.get()
            if entry is None:
                return
            batch, handles = entry
            try:
                out = self._finalize(handles)
            except Exception as e:  # noqa: BLE001 — failures propagate per request
                self._fail(batch, e)
                continue
            self._distribute(batch, out)


class PredictService:
    """Task-aware request handling over a Predictor / exported artifact."""

    def __init__(
        self,
        task: str,
        predictor,
        *,
        batch_size: int = 16,
        max_delay_ms: float = 10.0,
        tiled: bool = False,
        tile_overlap: int = 32,
        warmup: bool = False,
        buckets=None,
    ):
        self.task = task
        self.to_rgb = task != "bda"  # BDA trains on raw-cv2 BGR
        self.tiled = tiled
        self.batch_size = batch_size
        self.stats = _Stats()
        fixed = getattr(predictor, "fixed_batch", None)
        if fixed is not None and fixed != batch_size:
            raise ValueError(
                f"artifact was exported with a pinned batch of {fixed}; "
                f"serve it with --batch_size {fixed} (got {batch_size})"
            )
        # Bucketed batching: partial groups pad to the smallest compiled
        # shape that fits instead of the full batch — transfer and compute
        # then track actual load. Detection live predictors default to a
        # {1/4, 1/2, 1}x ladder; pinned-batch artifacts and cc (whose beam
        # decode is expensive to compile per shape) stay single-bucket.
        if buckets is None:
            if fixed is not None or task == "cc" or tiled:
                buckets = (batch_size,)
            else:
                buckets = tuple(sorted(
                    {max(1, batch_size // 4), max(1, batch_size // 2),
                     batch_size}))
        else:
            buckets = tuple(sorted(set(int(b) for b in buckets)))
            if not buckets or buckets[0] < 1 or buckets[-1] != batch_size:
                raise ValueError(
                    f"buckets {buckets} must be positive and include "
                    f"batch_size {batch_size} as the largest")
        # Sharded predictors need every dispatched shape divisible by the
        # device count.
        divisor = getattr(predictor, "batch_divisor", 1)
        if batch_size % divisor != 0:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by the sharded "
                f"predictor's device count ({divisor})")
        kept = tuple(b for b in buckets if b % divisor == 0)
        if kept != buckets:
            dropped = sorted(set(buckets) - set(kept))
            print(
                f"[serving] dropping buckets {dropped}: not divisible by the "
                f"sharded predictor's device count ({divisor}); keeping {kept}",
                flush=True,
            )
        buckets = kept or (batch_size,)
        self.buckets = buckets
        self.in_hw: Optional[Tuple[int, int]] = (
            (predictor.model.in_height, predictor.model.in_width)
            if getattr(predictor, "model", None) is not None
            else None
        )
        if tiled:
            if task == "cc":
                raise ValueError("tiled serving applies to detection tasks only")
            from change3d_tpu.inference import TiledPredictor

            self._tiled = TiledPredictor(
                predictor, overlap=tile_overlap, batch_size=batch_size
            )
            # One scene at a time: handler threads must not drive the device
            # (and materialize tile stacks) concurrently — in batched mode
            # the single dispatcher thread provides this serialization.
            self._tiled_lock = threading.Lock()
            self._batcher = None
            self._u8 = False  # tile blending needs the soft float maps
        else:
            self._tiled = None
            # Transfer-lean path: live Predictors take raw uint8 and run the
            # normalize + harden inside the jitted forward, so the
            # host<->device link carries uint8 pixels and bool/uint8 masks
            # instead of fp32 images and fp32 probability maps (4-30x fewer
            # bytes — decisive when the chip is behind a tunnel). Artifact
            # predictors keep the float path (their forward is baked).
            if task == "cc":
                self._u8 = hasattr(predictor, "caption_u8")
                caption_fn = predictor.caption_u8 if self._u8 else predictor.caption

                def predict_batch(pre, post):
                    caps = caption_fn(pre, post)
                    return {"caption": np.array(caps, dtype=object)}
            else:
                self._u8 = hasattr(predictor, "predict_u8")
                predict_batch = predictor.predict_u8 if self._u8 else predictor.predict
            # Detection u8 predictors expose the async launch/fetch split;
            # the batcher then pipelines (fetch of batch N overlaps compute
            # of N+1). CC's token outputs are tiny — sync is fine.
            pa = getattr(predictor, "predict_u8_async", None) if (
                self._u8 and task != "cc") else None
            fin = getattr(predictor, "finalize_u8", None)
            self._predict_batch = predict_batch
            self._batcher = _Batcher(
                predict_batch, batch_size, max_delay_ms / 1000.0,
                stats=self.stats,
                predict_async=pa, finalize=fin if pa is not None else None,
                buckets=self.buckets,
            )
        if warmup and not tiled and self.in_hw:
            # Compile every bucket's executable at startup so the first
            # real client pays serving latency, not a cold XLA compile
            # (minutes on a cold cache), then run one request through the
            # normal batcher/dispatch path.
            dt = np.uint8 if self._u8 else np.float32
            for b in self.buckets:
                zb = np.zeros((b,) + self.in_hw + (3,), dt)
                self._predict_batch(zb, zb)
            z = np.zeros(self.in_hw + (3,), dt)
            self._batcher.submit(z, z)
            self.stats.reset()  # don't count the warmup in /metrics

    def _norm(self, img: np.ndarray) -> np.ndarray:
        """uint8 HWC in the task's channel order -> what the predictor eats
        (passthrough when normalization runs on device)."""
        if self._u8:
            return np.ascontiguousarray(img)
        return (_normalize_cc if self.task == "cc" else _normalize)(img)

    def _predict_maps(self, pre: np.ndarray, post: np.ndarray) -> Dict[str, np.ndarray]:
        """Normalized (or raw-u8) inputs -> hardened per-image maps."""
        if pre.shape != post.shape:
            raise _BadRequest(f"pre {pre.shape} != post {post.shape}")
        if self.tiled:
            with self._tiled_lock:
                return self._tiled.predict_scene(pre, post)
        if self.in_hw and pre.shape[:2] != self.in_hw:
            raise _BadRequest(
                f"image is {pre.shape[:2]}, model expects {self.in_hw} "
                "(start the server with --tiled for native-size scenes)"
            )
        return self._batcher.submit(pre, post)

    def handle(self, body: dict) -> Dict[str, str]:
        try:
            pre = self._norm(decode_image(body["pre"], to_rgb=self.to_rgb))
            post = self._norm(decode_image(body["post"], to_rgb=self.to_rgb))
        except (KeyError, ValueError, TypeError) as e:
            raise _BadRequest(f"bad pre/post image: {e}") from e
        return masks_to_payload(self.task, self._predict_maps(pre, post))

    def handle_raw(self, raw: bytes, headers):
        """Raw-wire request body -> per-task uint8 arrays (or
        ``{"caption": str}`` for cc). The body is ``2*H*W*3`` uint8 bytes,
        pre then post, HWC, ALREADY in the task's channel order (RGB except
        BDA) — no codec, no color convenience; see the module docstring.

        Bulk mode (``X-Count: N``): the body carries N pairs back to back
        (pair 0 pre, pair 0 post, pair 1 pre, ...) and the response arrays
        gain a leading N axis (cc returns ``{"caption": [str, ...]}``).
        One request then pays one HTTP parse + one handler thread for N
        samples — on few-core serving hosts the per-request host CPU, not
        the device, is the throughput ceiling (BENCH_SERVE.json), and bulk
        is the production answer for offline/bulk scoring."""
        try:
            h = int(headers.get("X-Height", ""))
            w = int(headers.get("X-Width", ""))
            n = int(headers.get("X-Count", "1"))
        except ValueError as e:
            raise _BadRequest(
                "raw requests need integer X-Height/X-Width (and optional "
                "X-Count) headers"
            ) from e
        if h <= 0 or w <= 0 or n <= 0:
            raise _BadRequest(f"bad raw dims {n}x{h}x{w}")
        if len(raw) != n * 2 * h * w * 3:
            prefix = f"{n}*" if "X-Count" in headers else ""
            raise _BadRequest(
                f"raw body is {len(raw)} bytes, expected {prefix}2*{h}*{w}*3 "
                f"= {n * 2 * h * w * 3} (per pair: pre then post, uint8 HWC)"
            )
        bulk = "X-Count" in headers
        if bulk and self.tiled:
            raise _BadRequest(
                "bulk (X-Count) is for the batched endpoint; tiled servers "
                "take one scene per request"
            )
        pairs = np.frombuffer(raw, np.uint8).reshape(n, 2, h, w, 3)
        if not bulk:
            out = self._predict_maps(self._norm(pairs[0, 0]),
                                     self._norm(pairs[0, 1]))
            if self.task == "cc":
                return {"caption": str(out["caption"])}
            return masks_to_arrays(self.task, out)
        if self.in_hw and (h, w) != self.in_hw:
            raise _BadRequest(
                f"images are {(h, w)}, model expects {self.in_hw}")
        outs = self._batcher.submit_many(
            (self._norm(pairs[i, 0]), self._norm(pairs[i, 1]))
            for i in range(n)
        )
        if self.task == "cc":
            return {"caption": [str(o["caption"]) for o in outs]}
        per_pair = [masks_to_arrays(self.task, o) for o in outs]
        return {
            k: np.stack([p[k] for p in per_pair]) for k in per_pair[0]
        }

    def health(self) -> dict:
        return {
            "status": "ok",
            "task": self.task,
            "batch_size": self.batch_size,
            "buckets": list(self.buckets),
            "tiled": self.tiled,
            "input_hw": list(self.in_hw) if self.in_hw else None,
        }

    def close(self):
        if self._batcher:
            self._batcher.close()


class _BadRequest(ValueError):
    pass


def make_server(service: PredictService, host: str = "0.0.0.0", port: int = 8000):
    """Build (not start) a ThreadingHTTPServer around a PredictService."""

    class Handler(BaseHTTPRequestHandler):
        # Socket-op timeout: a half-open connection (port scan, stalled
        # client) must not pin a non-daemon handler thread forever — that
        # would hang the SIGTERM drain, which joins handler threads. Compute
        # waits (batcher.submit) are not socket ops and are unaffected.
        timeout = 120
        # Keep-alive: clients reuse one connection for many requests
        # (Content-Length is set on every reply). Without it each request
        # pays TCP setup + a fresh handler thread — measurable against the
        # batcher's fill rate on small hosts.
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, payload: dict):
            data = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _reply_raw(self, arrays: Dict[str, np.ndarray]):
            # One concatenated uint8 body; X-Parts names each segment in
            # order: "name:d0:d1[:d2],..." (2-D height:width per mask, or
            # count:height:width for bulk responses).
            parts = ",".join(
                f"{k}:" + ":".join(str(d) for d in v.shape)
                for k, v in arrays.items()
            )
            data = b"".join(v.tobytes() for v in arrays.values())
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("X-Parts", parts)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path == "/healthz":
                self._reply(200, service.health())
            elif self.path == "/metrics":
                self._reply(200, service.stats.snapshot())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/v1/predict":
                # The body stays unread: drop the connection so keep-alive
                # doesn't misparse it as the next request line (mirrors the
                # 413 handling below).
                self.close_connection = True
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            t0 = time.monotonic()
            ok = False
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > MAX_BODY_BYTES:
                    # The body stays unread on the socket: drop the
                    # connection instead of letting keep-alive misparse it
                    # as the next request.
                    self.close_connection = True
                    self._reply(413, {"error": (
                        f"body {length} bytes exceeds the {MAX_BODY_BYTES} "
                        "limit (tile large scenes client-side, or raise "
                        "serving.MAX_BODY_BYTES)")})
                    return
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if ctype.strip() == "application/octet-stream":
                    out = service.handle_raw(self.rfile.read(length), self.headers)
                    accept = self.headers.get("Accept", "")
                    if ("application/octet-stream" in accept
                            and "caption" not in out):
                        ok = True
                        self._reply_raw(out)
                    elif "caption" in out:
                        ok = True
                        self._reply(200, out)
                    elif any(v.ndim > 2 for v in out.values()):
                        # Bulk masks have a leading N axis PNG can't carry.
                        self._reply(400, {"error": (
                            "bulk (X-Count) detection responses are raw "
                            "only — send Accept: application/octet-stream"
                        )})
                    else:
                        payload = {k: encode_mask(v) for k, v in out.items()}
                        ok = True
                        self._reply(200, payload)
                    return
                body = json.loads(self.rfile.read(length))
                payload = service.handle(body)
                ok = True
                self._reply(200, payload)
            except _BadRequest as e:
                self._reply(400, {"error": str(e)})
            except json.JSONDecodeError as e:
                self._reply(400, {"error": f"bad JSON: {e}"})
            except Exception as e:  # noqa: BLE001 — 500 with reason
                # Socket state is unknown after an unexpected failure — do
                # not let keep-alive reuse this connection.
                self.close_connection = True
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            finally:
                service.stats.record_request(time.monotonic() - t0, ok)

        def log_message(self, fmt, *args):  # quiet; health checks are chatty
            pass

    class Server(ThreadingHTTPServer):
        # Default listen backlog (5) resets connections under the bursty
        # many-client load the batcher is built for. Handler threads are
        # non-daemonic so server_close() joins them: responses whose compute
        # finished are fully written before shutdown completes.
        request_queue_size = 1024
        daemon_threads = False

    return Server((host, port), Handler)


def serve_forever(service: PredictService, host: str, port: int):
    httpd = make_server(service, host, port)
    # SIGTERM (the orchestrator's stop signal) drains cleanly like Ctrl-C:
    # stop accepting, finish in-flight batches, release the device.
    signal.signal(signal.SIGTERM, lambda *_: threading.Thread(
        target=httpd.shutdown, daemon=True).start())
    print(f"serving {service.task} on http://{host}:{port} "
          f"(batch {service.batch_size}, tiled={service.tiled})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        # Join in-flight handler threads (their batches complete via the
        # dispatcher, which is still running), THEN stop the dispatcher.
        httpd.server_close()
        service.close()
        print("server stopped")
