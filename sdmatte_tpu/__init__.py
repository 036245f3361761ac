"""sdmatte_tpu — a TPU-native (JAX/XLA/Pallas) interactive image-matting framework.

Re-implements, TPU-first, the full capability surface of the reference
ComfyUI-SDMatte plugin (reference: /root/reference, see SURVEY.md):

  * SD2.1 VAE / U-Net / CLIP text stack in pure-functional JAX (``models/``)
  * Pallas flash attention with additive per-key bias (``ops/``)
  * safetensors -> param-tree checkpoint loader (``checkpoint/``)
  * one jit-compiled end-to-end matting pipeline (``pipeline/``)
  * mesh/pjit batch + video sharding (``parallel/``)
  * asset management, ComfyUI node API and CLI (``assets/``, ``api/``)

The reference delegates ~99% of FLOPs to diffusers/transformers CUDA kernels;
here those components are first-class, implemented for the MXU/VPU and XLA's
compilation model (static shapes, bf16 matmuls, fused elementwise).
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA executable cache for every surface (CLI, node, serve,
    bench, tests).  jax 0.9 silently IGNORES the JAX_COMPILATION_CACHE_DIR
    env var — discovered in round 5 after four rounds of cold-recompiling
    every graph (~4-13 min each via the dev tunnel; the round-4 bench
    timeout's root cause).  The config key is the only channel that works,
    so set it here, once, at package import.  Honors an explicit env var,
    never overrides a user's own jax config, opt-out via
    SDMATTE_NO_COMPILE_CACHE=1."""
    import os

    from .utils.env import env_flag
    if env_flag("SDMATTE_NO_COMPILE_CACHE"):
        return
    import jax
    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get(
                    "JAX_COMPILATION_CACHE_DIR",
                    os.path.join(os.path.expanduser("~"), ".cache",
                                 "jax_comp_cache")))
    except Exception:
        pass  # unknown config key on a future jax: cache is best-effort


_enable_compilation_cache()
