"""Network-free asset-manager tests (local-fetch injection — SURVEY.md §4.4)."""

import os

import pytest

from sdmatte_tpu.assets import manager


@pytest.fixture
def local_store(tmp_path):
    src = tmp_path / "store"
    (src / "sub").mkdir(parents=True)
    (src / "SDMatte.safetensors").write_bytes(b"FAKEWEIGHTS")
    for rel in manager.SD21_CONFIG_MANIFEST:
        p = src / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("{}")
    return str(src)


def test_download_model_local_fetch(local_store, tmp_path):
    fetch = manager.local_copy_fetch(local_store)
    urls = {"SDMatte.safetensors": "https://x/resolve/main/SDMatte.safetensors"}
    dst = str(tmp_path / "models")
    p = manager.download_model("SDMatte.safetensors", dst, model_urls=urls,
                               fetch=fetch)
    assert os.path.isfile(p) and open(p, "rb").read() == b"FAKEWEIGHTS"
    # second call finds the existing file without fetching
    def boom(url, dst):
        raise AssertionError("should not fetch")
    p2 = manager.download_model("SDMatte.safetensors", dst, model_urls=urls,
                                fetch=boom)
    assert p2 == p


def test_download_search_paths_priority(local_store, tmp_path):
    p = manager.download_model("SDMatte.safetensors", str(tmp_path / "unused"),
                               search_paths=[local_store],
                               fetch=lambda u, d: (_ for _ in ()).throw(AssertionError))
    assert p == os.path.join(local_store, "SDMatte.safetensors")


def test_unknown_model_raises(tmp_path):
    with pytest.raises(manager.AssetError):
        manager.download_model("nope.safetensors", str(tmp_path))


def test_atomic_cleanup_on_failure(tmp_path):
    def bad_fetch(url, dst):
        with open(dst, "wb") as f:
            f.write(b"partial")
        raise IOError("network died")
    urls = {"SDMatte.safetensors": "https://x/SDMatte.safetensors"}
    with pytest.raises(IOError):
        manager.download_model("SDMatte.safetensors", str(tmp_path),
                               model_urls=urls, fetch=bad_fetch)
    assert not os.path.exists(str(tmp_path / "SDMatte.safetensors.tmp"))
    assert not os.path.exists(str(tmp_path / "SDMatte.safetensors"))


def test_concurrent_winner_kept(tmp_path):
    target = tmp_path / "SDMatte.safetensors"

    def racing_fetch(url, dst):
        with open(dst, "wb") as f:
            f.write(b"mine")
        target.write_bytes(b"winner")  # another process finished first

    urls = {"SDMatte.safetensors": "https://x/SDMatte.safetensors"}
    p = manager.download_model("SDMatte.safetensors", str(tmp_path),
                               model_urls=urls, fetch=racing_fetch)
    assert open(p, "rb").read() == b"winner"
    assert not os.path.exists(str(target) + ".tmp")


def test_ensure_sd21_configs(local_store, tmp_path):
    fetch = manager.local_copy_fetch(local_store)
    base = str(tmp_path / "sd21")
    out = manager.ensure_sd21_configs(base, fetch=fetch)
    for rel in manager.SD21_CONFIG_MANIFEST:
        assert os.path.isfile(os.path.join(out, rel))


def test_ensure_sd21_partial_failure_nonfatal(tmp_path):
    calls = []

    def flaky(url, dst):
        calls.append(url)
        if "unet" in url:
            raise IOError("404")
        with open(dst, "w") as f:
            f.write("{}")

    out = manager.ensure_sd21_configs(str(tmp_path / "sd21"), fetch=flaky)
    assert os.path.isfile(os.path.join(out, "vae/config.json"))
    assert not os.path.exists(os.path.join(out, "unet/config.json"))
