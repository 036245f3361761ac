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
