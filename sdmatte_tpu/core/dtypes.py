"""Dtype policy for TPU compute.

The reference copes with memory via fp16 autocast (sdmatte_nodes.py:355-358 in
the reference); on TPU the idiomatic policy is bf16 compute with fp32
accumulation on the MXU and fp32 for normalization statistics / softmax.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy threaded through every module.

    param_dtype:   dtype parameters are stored in (HBM footprint).
    compute_dtype: dtype fed to matmuls / convs (MXU input).
    accum_dtype:   accumulation dtype for matmuls / convs (MXU output).
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return x.astype(self.compute_dtype) if x.dtype != self.compute_dtype else x


FP32 = Policy(jnp.float32, jnp.float32, jnp.float32)
# bf16 weights + bf16 MXU inputs, fp32 accumulate: the production TPU policy.
BF16 = Policy(jnp.bfloat16, jnp.bfloat16, jnp.float32)


def policy_for(name: str) -> Policy:
    return {"fp32": FP32, "float32": FP32, "bf16": BF16, "bfloat16": BF16}[name]
