"""bench.py contract tests (driven with a stubbed pipeline — no TPU).

The driver runs ``python bench.py`` unattended at the end of every round and
records its single JSON line; these tests pin the contract:

  * exactly one JSON object on stdout with the required keys/types
  * a transient failure at a non-headline measurement (512/768 probes)
    degrades that field to null instead of losing the whole record
  * a failure at the 1024 px headline still fails hard
"""

import contextlib
import io
import json
import sys
import types

import numpy as np
import pytest


@pytest.fixture()
def bench_with_stub(monkeypatch):
    """Import bench.py with sdmatte_tpu/jax stubbed so main() runs instantly;
    returns (bench_module, set_fail_sizes)."""
    fail_sizes = set()

    fake_jax = types.ModuleType("jax")
    fake_jax.default_backend = lambda: "stub"
    fake_jax.devices = lambda: ["stubdev"]
    fake_jax.block_until_ready = lambda x: x
    fake_jnp = types.ModuleType("jax.numpy")
    fake_jnp.asarray = lambda x: x
    fake_jnp.sum = lambda x: 1.0
    fake_jax.numpy = fake_jnp

    cfgmod = types.ModuleType("sdmatte_tpu.configs")
    cfgmod.SDMatteConfig = lambda: None
    dt = types.ModuleType("sdmatte_tpu.core.dtypes")
    dt.BF16 = "bf16"
    core = types.ModuleType("sdmatte_tpu.core")
    nnmod = types.ModuleType("sdmatte_tpu.core.nn")
    nnmod.UPSAMPLE2X_MODE = "base"
    core.nn = nnmod
    models = types.ModuleType("sdmatte_tpu.models")
    smod = types.ModuleType("sdmatte_tpu.models.sdmatte")
    smod.init = lambda cfg, seed=0: {}
    models.sdmatte = smod
    pl = types.ModuleType("sdmatte_tpu.pipeline")

    class FakePipe:
        params = {}

        def __init__(self, *a, **k):
            pass

        def __call__(self, img, tri, options=None):
            if options.inference_size in fail_sizes:
                raise RuntimeError("simulated tunnel flake")
            return np.zeros((1,)), None

    class FakeOpts:
        def __init__(self, inference_size=None, output_mode=None,
                     mask_refine=None):
            self.inference_size = inference_size

    pl.MattingPipeline = FakePipe
    pl.PipelineOptions = FakeOpts

    apipkg = types.ModuleType("sdmatte_tpu.api")
    servemod = types.ModuleType("sdmatte_tpu.api.serve")

    class FakeService:
        def __init__(self, pipe, window_ms=0.0):
            self.batcher = types.SimpleNamespace(shutdown=lambda: None)

        def matte(self, req):
            if "uv" in fail_sizes:
                raise RuntimeError("simulated serve failure")
            return {"ms": 1.0}

    servemod.MattingService = FakeService
    apipkg.serve = servemod

    pkg = types.ModuleType("sdmatte_tpu")
    stubs = {
        "jax": fake_jax, "jax.numpy": fake_jnp,
        "sdmatte_tpu": pkg, "sdmatte_tpu.configs": cfgmod,
        "sdmatte_tpu.core": core, "sdmatte_tpu.core.dtypes": dt,
        "sdmatte_tpu.core.nn": nnmod, "sdmatte_tpu.models": models,
        "sdmatte_tpu.models.sdmatte": smod, "sdmatte_tpu.pipeline": pl,
        "sdmatte_tpu.api": apipkg, "sdmatte_tpu.api.serve": servemod,
    }
    for name, mod in stubs.items():
        monkeypatch.setitem(sys.modules, name, mod)
    monkeypatch.delitem(sys.modules, "bench", raising=False)
    import bench
    yield bench, fail_sizes
    sys.modules.pop("bench", None)


def _run_main(bench):
    out, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        bench.main()
    lines = [l for l in out.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {lines}"
    return json.loads(lines[0]), err.getvalue()


def test_bench_json_contract(bench_with_stub):
    bench, _ = bench_with_stub
    res, _ = _run_main(bench)
    assert res["metric"] == "1024px_mattes_per_sec_per_chip"
    assert isinstance(res["value"], float) and res["value"] > 0
    assert res["unit"] == "mattes/s"
    assert isinstance(res["vs_baseline"], float)
    for k in ("p50_latency_512px_ms", "p50_latency_768px_rgba_ms",
              "p50_latency_1024px_ms"):
        assert isinstance(res[k], float), (k, res[k])
    assert res["best_batch"] in (1, 4, 8)
    # secondary user-visible (serving-path) latency rides the record
    assert isinstance(res["user_visible_p50_1024px_ms"], float)
    # secondary out-of-parity opt-in speed-mode throughput rides it too
    assert isinstance(res["speed_mode_fastest_mattes_per_sec"], float)


def test_bench_user_visible_failure_degrades_to_null(bench_with_stub):
    bench, fail_sizes = bench_with_stub
    fail_sizes.add("uv")
    res, err = _run_main(bench)
    assert res["user_visible_p50_1024px_ms"] is None
    assert isinstance(res["value"], float) and res["value"] > 0
    assert "simulated serve failure" in err


def test_bench_partial_failure_degrades_to_null(bench_with_stub):
    bench, fail_sizes = bench_with_stub
    fail_sizes.update({512, 768})
    res, err = _run_main(bench)
    assert res["p50_latency_512px_ms"] is None
    assert res["p50_latency_768px_rgba_ms"] is None
    assert isinstance(res["p50_latency_1024px_ms"], float)
    assert isinstance(res["value"], float) and res["value"] > 0
    assert "simulated tunnel flake" in err


def test_bench_headline_failure_is_fatal(bench_with_stub):
    bench, fail_sizes = bench_with_stub
    fail_sizes.add(1024)
    with pytest.raises(RuntimeError, match="simulated tunnel flake"):
        with contextlib.redirect_stdout(io.StringIO()), \
                contextlib.redirect_stderr(io.StringIO()):
            bench.main()
