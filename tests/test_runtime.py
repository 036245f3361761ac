"""Native fast_safetensors reader: build, parse, zero-copy parity."""

import numpy as np
import pytest

safetensors_numpy = pytest.importorskip("safetensors.numpy")


@pytest.fixture(scope="module")
def sample_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("stf")
    p = str(d / "sample.safetensors")
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((4, 3, 2, 2)).astype(np.float32),
        "a.bias": rng.standard_normal((4,)).astype(np.float32),
        "emb": rng.standard_normal((10, 8)).astype(np.float16),
        "idx": np.arange(7, dtype=np.int64),
        "scalar": np.asarray(3.5, dtype=np.float32),
    }
    safetensors_numpy.save_file(tensors, p, metadata={"format": "pt"})
    return p, tensors


def test_fast_reader_parity(sample_file):
    try:
        from sdmatte_tpu.runtime import fast_safetensors
        got = fast_safetensors.read(sample_file[0])
    except (OSError, RuntimeError, Exception) as e:  # no g++ -> skip
        pytest.skip(f"native reader unavailable: {e}")
    ref = sample_file[1]
    assert set(got.keys()) == set(ref.keys())
    for k in ref:
        assert got[k].dtype == ref[k].dtype, k
        np.testing.assert_array_equal(got[k], ref[k])


def test_fast_reader_is_default_path(sample_file, monkeypatch):
    """checkpoint.loader.read_safetensors prefers the native reader."""
    from sdmatte_tpu.checkpoint import loader
    try:
        from sdmatte_tpu.runtime import fast_safetensors
        fast_safetensors.read(sample_file[0])
    except Exception as e:
        pytest.skip(f"native reader unavailable: {e}")
    out = loader.read_safetensors(sample_file[0])
    assert isinstance(out, fast_safetensors.StfDict)


def test_fast_reader_bad_file(tmp_path):
    from sdmatte_tpu.runtime import fast_safetensors
    p = str(tmp_path / "junk.safetensors")
    with open(p, "wb") as f:
        f.write(b"\xff" * 64)
    with pytest.raises(Exception):
        fast_safetensors.read(p)
