"""Pallas conv3x3 kernel parity (interpret mode; on-TPU perf in
benchmarks/conv_check.py)."""

import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from sdmatte_tpu.ops.conv3x3 import conv3x3_same


def _ref(x, w, b=None):
    o = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return o if b is None else o + b


def test_conv3x3_parity(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_same(x, w, block_rows=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w)),
                               atol=2e-5, rtol=1e-4)


def test_conv3x3_ragged_rows_and_bias(rng):
    x = jnp.asarray(rng.standard_normal((2, 13, 24, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_same(x, w, b, block_rows=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w, b)),
                               atol=2e-5, rtol=1e-4)


def test_conv3x3_cout_tiling(rng):
    """Cout split across the third grid dimension (v3): window reuse across
    weight column blocks must not change results."""
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_same(x, w, b, block_rows=8, cout_block=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w, b)),
                               atol=2e-5, rtol=1e-4)


def test_conv3x3_fused_gn_silu_border_exact(rng):
    """Fused affine+SiLU prologue: conv(silu(x*a+d)) with NONZERO d — the
    zero-padding border must stay zero through the nonlinearity (a naive
    in-window affine would turn padding into silu(d))."""
    import jax
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(8), jnp.float32)
    a = jnp.asarray(rng.uniform(0.5, 2.0, (2, 8)), jnp.float32)
    d = jnp.asarray(rng.uniform(0.5, 1.5, (2, 8)), jnp.float32)  # d != 0!
    y = x * a[:, None, None] + d[:, None, None]
    ref = _ref(jnp.asarray(y * jax.nn.sigmoid(y)), w, bias)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_same(x, w, bias, affine=(a, d), block_rows=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_conv3x3_fused_residual(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    res = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    ref = _ref(x, w) + res
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_same(x, w, residual=res, block_rows=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gn_silu_conv2d_fallback_matches_composition(rng):
    """The fused helper's unfused fallback path == manual composition."""
    from sdmatte_tpu.core import nn as F
    from sdmatte_tpu.core.dtypes import FP32
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    pn = {"scale": jnp.asarray(rng.uniform(0.5, 2, 8), jnp.float32),
          "bias": jnp.asarray(rng.standard_normal(8), jnp.float32)}
    pc = {"kernel": jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1,
                                jnp.float32),
          "bias": jnp.zeros((8,), jnp.float32)}
    res = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    manual = F.conv2d(pc, F.silu(F.group_norm(pn, x, groups=4)),
                      policy=FP32) + res
    got = F.gn_silu_conv2d(pn, pc, x, groups=4, policy=FP32, residual=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual),
                               atol=1e-6, rtol=1e-6)


def test_conv3x3_csplit_matches_direct(rng):
    """Channel-split composition (both fuse_sum modes) == direct conv, with
    gn-affine and residual in play."""
    import jax
    from sdmatte_tpu.ops.conv3x3 import conv3x3_same_csplit
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)
    a = jnp.asarray(rng.uniform(0.5, 2.0, (1, 16)), jnp.float32)
    d = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 16)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    y = x * a[:, None, None] + d[:, None, None]
    ref = _ref(jnp.asarray(y * jax.nn.sigmoid(y)), w, b) + res
    with pltpu.force_tpu_interpret_mode():
        got1 = conv3x3_same_csplit(x, w, b, affine=(a, d), residual=res,
                                   block_rows=8, fuse_sum=True)
        got2 = conv3x3_same_csplit(x, w, b, affine=(a, d), residual=res,
                                   block_rows=8, fuse_sum=False)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_conv3x3_int8_parity(rng):
    """int8 kernel == XLA int8 conv (identical integer math, fp32 dequant)."""
    from sdmatte_tpu.ops.conv3x3 import conv3x3_same_int8
    xq = jnp.asarray(rng.integers(-127, 128, (1, 16, 24, 8)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, 8, 16)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (16,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(16), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_same_int8(xq, wq, scale, b, block_rows=8,
                                out_dtype=jnp.float32)
    ref = lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32) * scale + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-6)


def test_dispatch_pad_residency_guard(monkeypatch):
    """The residency veto applies only where the borderless v5 kernel can't
    run (v3's jnp.pad second copy OOM'd the b=8 throughput graph —
    ops/dispatch.py history).  With v5 eligible, big batches dispatch."""
    import jax as _jax
    from sdmatte_tpu.ops import dispatch as disp
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.setitem(disp.PALLAS_CONV_WINS, (16, 1024, 128, 128),
                        (9.9, 8, 128, False, False, 0))
    # v5-eligible (1024 % 8 == 0, >= 2 row blocks): dispatched despite size
    assert disp.pallas_conv3x3_config(16, 1024, 1024, 128, 128) is not None
    # forced onto the padded v3 path: the residency veto kicks in
    monkeypatch.setenv("SDMATTE_CONV_V3", "1")
    assert disp.pallas_conv3x3_config(16, 1024, 1024, 128, 128) is None
    monkeypatch.delenv("SDMATTE_CONV_V3")
    # small batches stay dispatched either way (pad copy ~0.5 GiB)
    assert disp.pallas_conv3x3_config(2, 1024, 1024, 128, 128) is not None


def test_svmem_overlay_only_inside_model_jit(monkeypatch):
    """The raised-scoped-VMEM dispatch tier (PALLAS_CONV_WINS_SVMEM) is
    visible only while a model_jit graph traces: its fused kernels fail to
    compile at XLA's default ~16 MB scoped-VMEM limit, so a raw jax.jit of
    model code must never pick them up (ops/dispatch.py)."""
    import jax as _jax
    from sdmatte_tpu.ops import dispatch as disp
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")

    shape = (2, 512, 256, 256)
    assert shape in disp.PALLAS_CONV_WINS_SVMEM
    base = disp.pallas_conv3x3_config(2, 512, 512, 256, 256)
    overlay = disp.PALLAS_CONV_WINS_SVMEM[shape][1:]
    assert base != overlay          # outside model_jit: base table only

    seen = {}

    def probe():
        seen["cfg"] = disp.pallas_conv3x3_config(2, 512, 512, 256, 256)
        return jnp.zeros(())

    # model_jit on "tpu": overlay active during trace...
    try:
        disp.model_jit(probe).lower()
    except Exception:
        pass  # lowering may fail without a real TPU; the trace ran
    assert seen.pop("cfg") == overlay
    # ...and the flag is restored after tracing
    assert disp._SVMEM_TRACING.get() is False
    probe()
    assert seen["cfg"] == base

    # ContextVar isolation: a concurrent thread tracing a raw jax.jit while
    # this thread is inside a model_jit trace must see the base table
    # (serve.py: HTTP worker thread + batcher thread; ADVICE r4)
    import threading
    other = {}

    def other_thread():
        other["cfg"] = disp.pallas_conv3x3_config(2, 512, 512, 256, 256)

    def probe_with_thread():
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
        return probe()

    try:
        disp.model_jit(probe_with_thread).lower()
    except Exception:
        pass
    assert seen.pop("cfg") == overlay   # model_jit trace saw the overlay
    assert other["cfg"] == base         # concurrent thread did not

    # escape hatch: SDMATTE_NO_SVMEM makes model_jit plain jax.jit
    monkeypatch.setenv("SDMATTE_NO_SVMEM", "1")
    try:
        disp.model_jit(probe).lower()
    except Exception:
        pass
    assert seen["cfg"] == base
