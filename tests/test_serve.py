"""HTTP serving front-end, driven through a real socket (tiny model)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from sdmatte_tpu.configs import SDMatteConfig

# >60 s on the 1-core CI host: runs in the slow lane
# (fast lane: pytest -m "not slow" — see .github/workflows/test.yml)
pytestmark = pytest.mark.slow
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


# ---------------------------------------------------------------- batching --

class _StubPipeline:
    """Counts calls; sleeps a fixed 'device time' per CALL (not per image) —
    models the chip's economics where batch-8 costs ~ the same dispatch."""

    def __init__(self, per_call_s=0.05):
        self.calls = 0
        self.batch_sizes = []
        self.per_call_s = per_call_s

    def __call__(self, imgs, tris, *, options):
        self.calls += 1
        b = imgs.shape[0]
        self.batch_sizes.append(b)
        import time
        time.sleep(self.per_call_s)
        h, w = imgs.shape[1], imgs.shape[2]
        return np.zeros((b, h, w), np.float32), np.zeros((b, h, w, 3), np.float32)


def test_microbatch_coalesces_concurrent_requests():
    """4 concurrent same-key requests run as ~1 batched pipeline call and
    finish in well under 4x (target: <2x) the single-request latency."""
    import time as _t
    from sdmatte_tpu.api.serve import MicroBatcher
    from sdmatte_tpu.pipeline import PipelineOptions

    stub = _StubPipeline(per_call_s=0.08)
    mb = MicroBatcher(stub, window_ms=30.0, max_batch=8)
    opts = PipelineOptions(inference_size=64)
    img = np.zeros((32, 48, 3), np.float32)
    tri = np.zeros((32, 48), np.float32)

    # single-request latency (includes the coalescing window)
    t0 = _t.perf_counter()
    mb.submit(img, tri, opts)
    t_single = _t.perf_counter() - t0

    results = [None] * 4

    def worker(i):
        results[i] = mb.submit(img, tri, opts)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    t0 = _t.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    t_four = _t.perf_counter() - t0
    mb.shutdown()

    assert all(r is not None and r[0].shape == (32, 48) for r in results)
    # batched: the 4 concurrent requests used at most 2 pipeline calls
    assert stub.calls <= 3  # 1 single + <=2 for the burst
    assert max(stub.batch_sizes) >= 2
    assert t_four < 2 * t_single + 0.2


def test_microbatch_mixed_keys_fifo():
    """Different shapes/options never stack together but all complete."""
    from sdmatte_tpu.api.serve import MicroBatcher
    from sdmatte_tpu.pipeline import PipelineOptions

    stub = _StubPipeline(per_call_s=0.005)
    mb = MicroBatcher(stub, window_ms=5.0, max_batch=8)
    o1 = PipelineOptions(inference_size=64)
    o2 = PipelineOptions(inference_size=64, output_mode="matted_rgba")

    outs = []

    def worker(h, opts):
        img = np.zeros((h, 40, 3), np.float32)
        tri = np.zeros((h, 40), np.float32)
        outs.append(mb.submit(img, tri, opts))

    threads = [threading.Thread(target=worker, args=(h, o))
               for h, o in [(32, o1), (48, o1), (32, o2), (32, o1)]]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.shutdown()

    assert len(outs) == 4
    # 3 distinct keys -> at least 3 pipeline calls; the two (32, o1) may stack
    assert 3 <= stub.calls <= 4


def test_microbatch_pads_to_power_of_two_buckets():
    """A 3-request burst runs as one PADDED batch (bucket 4): traffic-sized
    batches would each compile a fresh heavy graph; buckets bound that to
    log2(max_batch) graphs.  Results must come from the unpadded rows."""
    from sdmatte_tpu.api.serve import MicroBatcher
    from sdmatte_tpu.pipeline import PipelineOptions

    class _Marking(_StubPipeline):
        def __call__(self, imgs, tris, *, options):
            out = super().__call__(imgs, tris, options=options)
            # mark each row with its index so slicing is observable
            alpha = out[0] + np.arange(imgs.shape[0],
                                       dtype=np.float32)[:, None, None]
            return alpha, out[1]

    stub = _Marking(per_call_s=0.01)
    mb = MicroBatcher(stub, window_ms=40.0, max_batch=8)
    opts = PipelineOptions(inference_size=64)
    img = np.zeros((16, 16, 3), np.float32)
    tri = np.zeros((16, 16), np.float32)

    results = [None] * 3

    def worker(i):
        results[i] = mb.submit(img, tri, opts)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.shutdown()

    assert stub.batch_sizes and all(
        b & (b - 1) == 0 for b in stub.batch_sizes), stub.batch_sizes
    got = sorted(float(r[0][0, 0]) for r in results)
    assert got == [0.0, 1.0, 2.0]   # each caller got a distinct real row


# ------------------------------------------------------------- hardening --


def test_batch_key_includes_trimap_shape():
    """Same image size + DIFFERENT trimap sizes must not stack into one
    np.stack call (the pipeline resizes them independently); both complete."""
    from sdmatte_tpu.api.serve import MicroBatcher
    from sdmatte_tpu.pipeline import PipelineOptions

    stub = _StubPipeline(per_call_s=0.01)
    mb = MicroBatcher(stub, window_ms=40.0, max_batch=8)
    opts = PipelineOptions(inference_size=64)
    img = np.zeros((32, 48, 3), np.float32)
    outs = []

    def worker(th, tw):
        outs.append(mb.submit(img, np.zeros((th, tw), np.float32), opts))

    threads = [threading.Thread(target=worker, args=s)
               for s in [(32, 48), (16, 24), (32, 48)]]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.shutdown()
    assert len(outs) == 3 and all(o[0].shape == (32, 48) for o in outs)
    assert stub.calls >= 2   # the odd trimap went in its own batch


def test_queue_overflow_raises_overloaded():
    from sdmatte_tpu.api.serve import MicroBatcher, ServiceOverloaded
    from sdmatte_tpu.pipeline import PipelineOptions

    stub = _StubPipeline(per_call_s=0.3)
    mb = MicroBatcher(stub, window_ms=1.0, max_batch=1, max_queue=2)
    opts = PipelineOptions(inference_size=64)
    img = np.zeros((16, 16, 3), np.float32)
    tri = np.zeros((16, 16), np.float32)

    errs = []

    def worker():
        try:
            mb.submit(img, tri, opts)
        except ServiceOverloaded as e:
            errs.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.shutdown()
    assert errs, "expected at least one ServiceOverloaded rejection"


def test_request_timeout():
    from sdmatte_tpu.api.serve import MicroBatcher, RequestTimeout
    from sdmatte_tpu.pipeline import PipelineOptions

    stub = _StubPipeline(per_call_s=5.0)   # far longer than the deadline
    mb = MicroBatcher(stub, window_ms=1.0, max_batch=1,
                      request_timeout_s=0.3)
    opts = PipelineOptions(inference_size=64)
    img = np.zeros((16, 16, 3), np.float32)
    tri = np.zeros((16, 16), np.float32)
    with pytest.raises(RequestTimeout):
        mb.submit(img, tri, opts)
    mb.shutdown()


def test_poisoned_request_does_not_wedge_batcher():
    """A request whose pipeline call raises fails ITS OWN batch with the
    error; the worker survives and subsequent requests still succeed."""
    from sdmatte_tpu.api.serve import MicroBatcher
    from sdmatte_tpu.pipeline import PipelineOptions

    class _Poisonable(_StubPipeline):
        def __call__(self, imgs, tris, *, options):
            if float(imgs.max()) > 0.5:
                raise ValueError("poisoned input")
            return super().__call__(imgs, tris, options=options)

    stub = _Poisonable(per_call_s=0.01)
    mb = MicroBatcher(stub, window_ms=1.0, max_batch=8,
                      request_timeout_s=5.0)
    opts = PipelineOptions(inference_size=64)
    tri = np.zeros((16, 16), np.float32)

    with pytest.raises(ValueError, match="poisoned"):
        mb.submit(np.ones((16, 16, 3), np.float32), tri, opts)
    alpha, matted = mb.submit(np.zeros((16, 16, 3), np.float32), tri, opts)
    assert alpha.shape == (16, 16)
    mb.shutdown()


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_worker_death_fails_fast_not_forever():
    """A BaseException escaping the pipeline kills the worker, but callers
    get prompt errors (liveness check), not an eternal done.wait()."""
    from sdmatte_tpu.api.serve import MicroBatcher
    from sdmatte_tpu.pipeline import PipelineOptions

    class _Lethal(_StubPipeline):
        def __call__(self, imgs, tris, *, options):
            raise SystemExit("simulated interpreter teardown")

    mb = MicroBatcher(_Lethal(), window_ms=1.0, max_batch=1,
                      request_timeout_s=30.0)
    opts = PipelineOptions(inference_size=64)
    img = np.zeros((16, 16, 3), np.float32)
    tri = np.zeros((16, 16), np.float32)

    with pytest.raises(RuntimeError, match="worker terminated"):
        mb.submit(img, tri, opts)
    mb._worker.join(timeout=5)
    import time as _t
    t0 = _t.perf_counter()
    with pytest.raises(RuntimeError, match="worker died"):
        mb.submit(img, tri, opts)
    assert _t.perf_counter() - t0 < 10   # bounded, not request_timeout_s


def test_service_validation_http(server):
    """Bad inference_size / output_mode / payload -> 400, not 500."""
    img = np.zeros((16, 16, 3), np.float32)
    tri = np.zeros((16, 16), np.float32)
    ok = {"image": _png_b64(img), "trimap": _png_b64(tri)}
    code, body = _post(server + "/v1/matte",
                       dict(ok, inference_size=123))
    assert code == 400 and "inference_size" in body["error"]
    code, body = _post(server + "/v1/matte",
                       dict(ok, output_mode="nope"))
    assert code == 400 and "output_mode" in body["error"]
    code, body = _post(server + "/v1/matte",
                       dict(ok, trimap_constraint=7.0))
    assert code == 400 and "trimap_constraint" in body["error"]
    code, body = _post(server + "/v1/matte",
                       {"image": "bm90YXBuZw==", "trimap": ok["trimap"]})
    assert code == 400 and "undecodable" in body["error"]


def test_exotic_png_modes_canonicalized(server):
    """LA/P-mode PNGs decode to canonical (H,W,3)/(H,W,1) — a surprise
    channel count would fail np.stack for a whole coalesced batch."""
    def b64(im):
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()
    la = PIL.new("LA", (24, 16), (128, 200))       # grayscale+alpha image
    pal = PIL.new("P", (24, 16), 3)                # palette trimap
    code, body = _post(server + "/v1/matte", {
        "image": b64(la), "trimap": b64(pal), "inference_size": 64,
    })
    assert code == 200, body
    alpha = np.asarray(PIL.open(io.BytesIO(base64.b64decode(body["alpha"]))))
    assert alpha.shape == (16, 24)


def test_non_numeric_params_are_400(server):
    img = np.zeros((16, 16, 3), np.float32)
    tri = np.zeros((16, 16), np.float32)
    ok = {"image": _png_b64(img), "trimap": _png_b64(tri)}
    code, body = _post(server + "/v1/matte", dict(ok, inference_size="big"))
    assert code == 400 and "inference_size" in body["error"]
    code, body = _post(server + "/v1/matte",
                       dict(ok, trimap_constraint=[0.5]))
    assert code == 400 and "trimap_constraint" in body["error"]


# ---- visual-prompt types over HTTP + coords batching ---------------------


def test_prompt_type_bbox_over_http(server, rng):
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    tri = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    code, body = _post(server + "/v1/matte", {
        "image": _png_b64(img), "trimap": _png_b64(tri),
        "inference_size": 64, "prompt_type": "bbox_mask",
        "coords": [0.1, 0.1, 0.9, 0.8]})
    assert code == 200 and "alpha" in body
    code, body = _post(server + "/v1/matte", {
        "image": _png_b64(img), "trimap": _png_b64(tri),
        "inference_size": 64, "prompt_type": "point_mask",
        "coords": [0.5, 0.5, 0.25, 0.75]})
    assert code == 200 and "alpha" in body


def test_prompt_type_validation_http(server, rng):
    img = _png_b64(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    tri = _png_b64(rng.uniform(0, 1, (32, 32)).astype(np.float32))
    base = {"image": img, "trimap": tri, "inference_size": 64}
    for bad in (
        {"prompt_type": "telepathy"},                       # unknown type
        {"prompt_type": "point_mask"},                      # missing coords
        {"prompt_type": "point_mask", "coords": [0.5]},     # odd length
        {"prompt_type": "bbox_mask", "coords": [0, 0, 1]},  # not 4 values
        {"coords": ["a", "b", "c", "d"]},                   # non-numeric
    ):
        code, body = _post(server + "/v1/matte", dict(base, **bad))
        assert code == 400, (bad, code, body)


def test_microbatch_coords_batch_as_data():
    """Same coords LENGTH coalesces into one call with per-request values;
    coords-free requests have a different key and never stack with them."""
    from sdmatte_tpu.api.serve import MicroBatcher
    from sdmatte_tpu.pipeline import PipelineOptions

    class _CoordStub(_StubPipeline):
        def __init__(self):
            super().__init__(per_call_s=0.02)
            self.coords_seen = []

        def __call__(self, imgs, tris, *, options, coords=None):
            self.coords_seen.append(None if coords is None
                                    else np.asarray(coords))
            return super().__call__(imgs, tris, options=options)

    stub = _CoordStub()
    mb = MicroBatcher(stub, window_ms=60.0, max_batch=8)
    opts = PipelineOptions(inference_size=64, aux_input="bbox_mask")
    img = np.zeros((32, 32, 3), np.float32)
    tri = np.zeros((32, 32), np.float32)
    c1 = np.asarray([0.0, 0.0, 1.0, 1.0], np.float32)
    c2 = np.asarray([0.2, 0.2, 0.8, 0.8], np.float32)

    results = [None] * 3

    def worker(i, coords):
        results[i] = mb.submit(img, tri, opts, coords=coords)

    threads = [threading.Thread(target=worker, args=(0, c1)),
               threading.Thread(target=worker, args=(1, c2)),
               threading.Thread(target=worker, args=(2, None))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    mb.shutdown()

    assert all(r is not None for r in results)
    assert stub.calls == 2      # coords pair coalesced; coords-free separate
    with_c = [c for c in stub.coords_seen if c is not None]
    assert len(with_c) == 1 and with_c[0].shape == (2, 4)
    assert {tuple(r) for r in with_c[0]} == {tuple(c1), tuple(c2)}
    assert [c for c in stub.coords_seen if c is None] == [None]
