"""Minimal production-serving front-end: HTTP matting service.

The reference has no serving story (it only exists inside ComfyUI); this is
the standalone deployment surface: one process owns the chip, requests are
serialized onto it (SPMD batch serving rides parallel/ instead), metrics and
health endpoints included.

Endpoints:
  GET  /healthz            -> {"status": "ok", "backend": ..., "device": ...}
  GET  /metrics            -> utils.observability metrics summary (JSON)
  POST /v1/matte           -> JSON request:
        {"image": <base64 PNG>, "trimap": <base64 PNG>,
         "inference_size": 1024, "output_mode": "alpha_only",
         "mask_refine": true, "trimap_constraint": 0.8,
         "is_transparent": false}
      response: {"alpha": <base64 PNG>, "matted": <base64 PNG>, "ms": float}

Concurrency model: requests are NOT lock-serialized one at a time — a
micro-batching queue coalesces concurrent requests that share a batchable
key (input size + options) into ONE pipeline call, because the chip runs a
batch-8 matte ~1.7x more efficiently per image than batch-1
(bench.py sweeps; VERDICT round 1 item 9).  A lone request still dispatches
immediately after at most ``batch_window_ms`` of coalescing delay.

Run: python -m sdmatte_tpu.api.serve --ckpt SDMatte.safetensors --port 8700
     (--random-weights for a weight-less smoke deployment)
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..pipeline import MattingPipeline, PipelineOptions
from ..utils.observability import METRICS, get_logger

_log = get_logger("sdmatte_tpu.serve")


def _png_to_array(b64: str, channels: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(b64)))
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    if channels == 3:
        if arr.shape[-1] == 4:
            arr = arr[..., :3]
        elif arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, -1)
    elif channels == 1:
        arr = arr[..., :1]
    return arr


def _array_to_png_b64(arr: np.ndarray) -> str:
    from PIL import Image
    buf = io.BytesIO()
    a = np.clip(np.asarray(arr), 0, 1)
    Image.fromarray((a * 255.0 + 0.5).astype(np.uint8).squeeze()).save(
        buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class _Pending:
    """One queued request: inputs + a completion event the worker signals."""

    __slots__ = ("img", "tri", "key", "opts", "done", "alpha", "matted", "err")

    def __init__(self, img, tri, key, opts):
        self.img, self.tri, self.key, self.opts = img, tri, key, opts
        self.done = threading.Event()
        self.alpha = self.matted = self.err = None


class MicroBatcher:
    """Coalesces concurrent requests into batched pipeline calls.

    A single worker thread owns the device.  Arriving requests append to a
    queue; the worker takes the oldest request, waits up to ``window_ms`` for
    more requests with the SAME batch key — (H, W, PipelineOptions), the
    stacking precondition — stacks them, runs ONE pipeline call, and
    distributes the per-image results.  Non-matching requests stay queued for
    the next cycle, so mixed traffic degrades to FIFO, never starves.
    """

    def __init__(self, pipeline, *, window_ms: float = 10.0,
                 max_batch: int = 8):
        self.pipeline = pipeline
        self.window_s = window_ms / 1e3
        self.max_batch = max_batch
        self._queue: list[_Pending] = []
        self._cv = threading.Condition()
        self._stop = False
        self.batch_calls = 0          # observability: pipeline invocations
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, img: np.ndarray, tri: np.ndarray,
               opts: PipelineOptions):
        """Blocking: returns (alpha, matted) numpy arrays for ONE image."""
        item = _Pending(img, tri, (img.shape[0], img.shape[1], opts), opts)
        with self._cv:
            self._queue.append(item)
            self._cv.notify()
        item.done.wait()
        if item.err is not None:
            raise item.err
        return item.alpha, item.matted

    def shutdown(self):
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._worker.join(timeout=5)

    # -- worker ----------------------------------------------------------

    def _take_batch(self) -> list[_Pending]:
        with self._cv:
            while not self._queue and not self._stop:
                self._cv.wait()
            if self._stop and not self._queue:
                return []
            head = self._queue[0]
            deadline = time.monotonic() + self.window_s
            while (len([x for x in self._queue if x.key == head.key])
                   < self.max_batch and not self._stop):
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                self._cv.wait(timeout=left)
            batch = []
            rest = []
            for x in self._queue:
                if x.key == head.key and len(batch) < self.max_batch:
                    batch.append(x)
                else:
                    rest.append(x)
            self._queue[:] = rest
            return batch

    def _run(self):
        while True:
            batch = self._take_batch()
            if not batch:
                if self._stop:
                    return
                continue
            try:
                imgs = np.stack([x.img for x in batch])
                tris = np.stack([x.tri for x in batch])
                # pad the batch up to a power-of-two bucket: XLA compiles one
                # heavy graph per batch SIZE, and traffic-dependent sizes
                # (3, 5, 7...) would each pay a full model recompile at
                # request time; buckets bound that to log2(max_batch) graphs
                n = len(batch)
                bucket = 1
                while bucket < n:
                    bucket *= 2
                if bucket != n:
                    reps = bucket - n
                    imgs = np.concatenate(
                        [imgs, np.repeat(imgs[-1:], reps, axis=0)])
                    tris = np.concatenate(
                        [tris, np.repeat(tris[-1:], reps, axis=0)])
                alpha, matted = self.pipeline(imgs, tris,
                                              options=batch[0].opts)
                alpha = np.asarray(alpha)
                matted = np.asarray(matted)
                self.batch_calls += 1
                METRICS.count("batches")
                METRICS.observe_ms("batch_size", float(len(batch)))
                for i, x in enumerate(batch):
                    x.alpha, x.matted = alpha[i], matted[i]
                    x.done.set()
            except Exception as e:  # pragma: no cover - defensive
                for x in batch:
                    x.err = e
                    x.done.set()


class MattingService:
    """Owns the pipeline; requests coalesce through the micro-batcher."""

    def __init__(self, pipeline: MattingPipeline, *, window_ms: float = 10.0,
                 max_batch: int = 8):
        self.pipeline = pipeline
        self.batcher = MicroBatcher(pipeline, window_ms=window_ms,
                                    max_batch=max_batch)

    def matte(self, req: dict) -> dict:
        for field in ("image", "trimap"):
            if field not in req:
                raise KeyError(field)
        img = _png_to_array(req["image"], 3)
        tri = _png_to_array(req["trimap"], 1)[..., 0]
        opts = PipelineOptions(
            inference_size=int(req.get("inference_size", 1024)),
            is_transparent=bool(req.get("is_transparent", False)),
            output_mode=str(req.get("output_mode", "alpha_only")),
            mask_refine=bool(req.get("mask_refine", True)),
            trimap_constraint=float(req.get("trimap_constraint", 0.8)),
        )
        t0 = time.perf_counter()
        alpha_np, matted_np = self.batcher.submit(img, tri, opts)
        ms = (time.perf_counter() - t0) * 1e3
        METRICS.count("requests")
        METRICS.observe_ms("matte_e2e", ms)
        return {"alpha": _array_to_png_b64(alpha_np),
                "matted": _array_to_png_b64(matted_np),
                "ms": round(ms, 1)}


def make_handler(service: MattingService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax
                self._send(200, {"status": "ok",
                                 "backend": jax.default_backend(),
                                 "device": str(jax.devices()[0])})
            elif self.path == "/metrics":
                self._send(200, METRICS.summary())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/matte":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                self._send(200, service.matte(req))
            except KeyError as e:
                self._send(400, {"error": f"missing field {e}"})
            except Exception as e:  # pragma: no cover - defensive
                _log.exception("request failed")
                self._send(500, {"error": str(e)})

        def log_message(self, fmt, *args):
            _log.info("%s %s", self.address_string(), fmt % args)

    return Handler


def serve(pipeline: MattingPipeline, port: int = 8700, host: str = "127.0.0.1"):
    service = MattingService(pipeline)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    _log.info("serving on http://%s:%d", host, port)
    return httpd


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="SDMatte.safetensors")
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.random_weights:
        from ..configs import SDMatteConfig
        from ..core.dtypes import BF16, FP32
        from ..models import sdmatte
        cfg = SDMatteConfig()
        params = sdmatte.init(cfg, seed=0)
        pipe = MattingPipeline(params, cfg,
                               policy=FP32 if args.cpu else BF16,
                               attn_impl="xla" if args.cpu else "auto")
    else:
        from .node import get_pipeline
        pipe = get_pipeline(args.ckpt, force_cpu=args.cpu)
    serve(pipe, args.port, args.host).serve_forever()


if __name__ == "__main__":
    main()
