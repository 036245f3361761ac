"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; standard JAX practice is to
emulate a mesh with XLA host devices (SURVEY.md §4.5).  Must run before jax
is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin prepends itself to jax_platforms at import, overriding
# the env var — force the config back to cpu so CI never rides the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

try:  # torch's default OpenMP threading fights JAX for the single CI core
    import torch
    torch.set_num_threads(1)
except ImportError:
    pass


@pytest.fixture
def rng():
    return np.random.default_rng(0)
