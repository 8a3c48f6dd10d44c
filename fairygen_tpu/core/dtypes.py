"""Dtype policy for TPU execution.

The reference keeps per-model ``torch_dtype`` plumbing and a VRAM state
machine that casts weights per-state (reference:
``animation/diffsynth/core/vram/layers.py``).  On TPU the equivalent is a
simple policy object: parameters live in ``param_dtype`` (bf16 for big
models), compute runs in ``compute_dtype`` with fp32 accumulation inside
matmuls (``preferred_element_type``), and numerically sensitive ops (norms,
RoPE, softmax) are forced to fp32.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    # accumulation / sensitive-op dtype (norms, softmax, RoPE, time embeds)
    accum_dtype: jnp.dtype = jnp.float32

    def cast_params(self, params):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            params,
        )


def default_policy() -> DTypePolicy:
    return DTypePolicy()


# Full-precision policy for parity tests on CPU.
FP32 = DTypePolicy(jnp.float32, jnp.float32, jnp.float32)
BF16 = DTypePolicy(jnp.bfloat16, jnp.bfloat16, jnp.float32)
