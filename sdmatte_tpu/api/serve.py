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


class MattingService:
    """Owns the pipeline; serializes device access across request threads."""

    def __init__(self, pipeline: MattingPipeline):
        self.pipeline = pipeline
        self._lock = threading.Lock()

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
        with self._lock:
            alpha, matted = self.pipeline(img, tri, options=opts)
            alpha_np = np.asarray(alpha)[0]
            matted_np = np.asarray(matted)[0]
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
