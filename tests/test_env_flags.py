"""Strict boolean env-flag parsing (utils/env.py).

Guards the round-5 review finding: ``bool(os.environ.get(...))`` treats
``FLAG=0`` as ON.  Every SDMATTE_* boolean knob routes through env_flag so
an operator's ``=0`` / ``=false`` actually disables the feature.
"""

import pytest

from sdmatte_tpu.utils.env import env_flag


@pytest.mark.parametrize("val,expected", [
    ("1", True), ("true", True), ("TRUE", True), ("yes", True),
    ("on", True), (" 1 ", True),
    ("0", False), ("false", False), ("False", False), ("no", False),
    ("off", False), ("", False),
])
def test_env_flag_values(monkeypatch, val, expected):
    monkeypatch.setenv("SDMATTE_TEST_FLAG", val)
    assert env_flag("SDMATTE_TEST_FLAG") is expected


def test_env_flag_unset_uses_default(monkeypatch):
    monkeypatch.delenv("SDMATTE_TEST_FLAG", raising=False)
    assert env_flag("SDMATTE_TEST_FLAG") is False
    assert env_flag("SDMATTE_TEST_FLAG", default=True) is True


def test_env_flag_garbage_uses_default(monkeypatch):
    monkeypatch.setenv("SDMATTE_TEST_FLAG", "maybe")
    assert env_flag("SDMATTE_TEST_FLAG") is False
    assert env_flag("SDMATTE_TEST_FLAG", default=True) is True


def test_flag_consumers_treat_zero_as_off(monkeypatch):
    """The dispatch/attention escape hatches must read =0 as disabled."""
    from sdmatte_tpu.ops import dispatch

    monkeypatch.setenv("SDMATTE_NO_SVMEM", "0")
    # =0 means "do not disable": _svmem_enabled is then gated only by the
    # backend check (cpu here -> False), same as with the var unset.
    monkeypatch.delenv("SDMATTE_NO_SVMEM", raising=False)
    unset = dispatch._svmem_enabled()
    monkeypatch.setenv("SDMATTE_NO_SVMEM", "0")
    assert dispatch._svmem_enabled() == unset
    monkeypatch.setenv("SDMATTE_NO_SVMEM", "1")
    assert dispatch._svmem_enabled() is False
