"""Normalization / modulation primitives (fp32 internals, XLA-fused).

These are deliberately plain jnp: XLA fuses norm → modulate → matmul chains
into single HBM passes on TPU, so a hand-written Pallas kernel buys nothing
here; the flash-attention and (future) quantized-matmul paths are where
Pallas earns its keep.

Math parity:
  rms_norm      — animation/diffsynth/models/wan_video_dit.py:99-110
  t5_layer_norm — animation/diffsynth/models/wan_video_text_encoder.py:25-38
  modulate      — wan_video_dit.py:63-64 (x·(1+scale)+shift)
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x, weight, eps=1e-5):
    """x·rsqrt(mean(x²)+eps) in fp32, cast back to x.dtype, then ·weight."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    y = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(dtype) * weight


def t5_layer_norm(x, weight, eps=1e-6):
    """T5: no mean subtraction; fp32 rsqrt; cast to weight dtype then scale."""
    xf = x.astype(jnp.float32)
    y = x * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if weight.dtype in (jnp.float16, jnp.bfloat16):
        y = y.astype(weight.dtype)
    return weight * y


def layer_norm(x, eps=1e-6, weight=None, bias=None):
    """LayerNorm in fp32 (elementwise_affine optional)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y.astype(dtype)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


def modulate(x, shift, scale):
    return x * (1 + scale) + shift
