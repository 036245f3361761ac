"""HTTP serving front-end, driven through a real socket (tiny model)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from sdmatte_tpu.configs import SDMatteConfig
from sdmatte_tpu.models import sdmatte
from sdmatte_tpu.pipeline import MattingPipeline
from sdmatte_tpu.api import serve as serve_mod

PIL = pytest.importorskip("PIL.Image")


def _png_b64(arr):
    buf = io.BytesIO()
    PIL.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8).squeeze()).save(
        buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def server():
    cfg = SDMatteConfig.tiny()
    pipe = MattingPipeline(sdmatte.init(cfg, seed=0), cfg, attn_impl="xla")
    httpd = serve_mod.serve(pipe, port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    code, body = _get(server + "/healthz")
    assert code == 200 and body["status"] == "ok"


def test_matte_roundtrip(server, rng):
    img = rng.uniform(0, 1, (96, 80, 3)).astype(np.float32)
    tri = rng.choice([0.0, 0.5, 1.0], (96, 80)).astype(np.float32)
    code, body = _post(server + "/v1/matte", {
        "image": _png_b64(img), "trimap": _png_b64(tri),
        "inference_size": 64, "output_mode": "matted_rgba",
    })
    assert code == 200, body
    alpha = np.asarray(PIL.open(io.BytesIO(base64.b64decode(body["alpha"]))))
    assert alpha.shape == (96, 80)
    assert body["ms"] > 0

    code, metrics = _get(server + "/metrics")
    assert metrics["counters"]["requests"] >= 1


def test_matte_missing_field(server):
    code, body = _post(server + "/v1/matte", {"image": "aGk="})
    assert code == 400 and "trimap" in body["error"]


def test_unknown_route(server):
    code, _ = _post(server + "/v1/nope", {})
    assert code == 404
