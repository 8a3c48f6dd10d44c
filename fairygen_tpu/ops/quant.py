"""Quantized matmul path — the TPU equivalent of the reference's FP8 linear.

The reference stores weights in fp8-e4m3 and computes
``torch._scaled_mm`` with dynamic per-row input scaling
(``animation/diffsynth/core/vram/layers.py:321-357``).  On v5e the fast
low-precision unit is INT8 (2× bf16 MXU throughput), so the native port is
W8A8: weights quantized per-OUTPUT-column (symmetric, static), activations
per-row (symmetric, dynamic — same granularity as the reference's
``input_float8`` rows), int32 accumulation, fused rescale.

Usage: ``qp = quantize_dense_params(p)`` then ``quantized_dense(qp, x)``;
``quantize_wan_dit_ffn(params)`` swaps the DiT FFN projections in place
(the FFN is ~55% of DiT FLOPs).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_weight_int8(w) -> Dict[str, Any]:
    """(in, out) float weight -> int8 + per-column fp32 scales."""
    wf = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0  # (out,)
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_int8": q, "w_scale": scale}


def quantize_dense_params(p: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(quantize_weight_int8(p["w"]))
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantized_dense(p: Dict[str, Any], x):
    """y = (x_q @ w_q) · (row_scale ⊗ col_scale) + b, int32 accumulation.

    Dynamic symmetric per-row activation scaling (reference layers.py:342:
    per-row amax -> fp8; here -> int8)."""
    orig_shape = x.shape
    xf = x.reshape(-1, orig_shape[-1]).astype(jnp.float32)
    row_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # (N, 1)
    row_scale = jnp.maximum(row_scale, 1e-12)
    xq = jnp.clip(jnp.round(xf / row_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["w_int8"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * row_scale * p["w_scale"][None, :]
    y = y.astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y.reshape(orig_shape[:-1] + (p["w_int8"].shape[1],))


def _check_int8_backend():
    """Refuse int8 on backends where it is known to hang.

    The int8 ``dot_general`` hung the remote compile on the tunneled
    'axon' TPU backend (docs/NOTES.md round 1); it compiles and runs fine
    on CPU and directly-attached TPUs. Set FAIRYGEN_FORCE_INT8=1 to
    override once re-validated on the target backend.
    """
    import os

    if os.environ.get("FAIRYGEN_FORCE_INT8") == "1":
        return
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return
    if platform == "axon":
        raise RuntimeError(
            "int8 W8A8 is disabled on the tunneled 'axon' backend: the "
            "int8 dot_general hung its remote compiler (docs/NOTES.md). "
            "Re-test on a directly-attached TPU, or set "
            "FAIRYGEN_FORCE_INT8=1 to override."
        )


def quantize_wan_dit_ffn(params) -> Any:
    """Swap the (stacked) DiT FFN projections to W8A8."""
    _check_int8_backend()
    params = dict(params)
    blocks = dict(params["blocks"])
    ffn = dict(blocks["ffn"])
    for name in ("fc1", "fc2"):
        layer = dict(ffn[name])
        w = layer.pop("w")
        # per-layer stacked (L, in, out): vmap the quantizer over L
        qw = jax.vmap(quantize_weight_int8)(w)
        layer["w_int8"] = qw["w_int8"]
        layer["w_scale"] = qw["w_scale"]
        ffn[name] = layer
    blocks["ffn"] = ffn
    params["blocks"] = blocks
    return params
