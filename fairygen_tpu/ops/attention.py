"""Attention dispatch.

The reference picks FA3 > FA2 > Sage > xformers > SDPA at import time with
an env override (``animation/diffsynth/core/attention/attention.py:30-45``).
The TPU-native ladder is: custom Pallas flash kernel (TPU) > XLA
dot-product attention (CPU / fallback), overridable via
``FAIRYGEN_ATTENTION_IMPLEMENTATION`` or :func:`set_attention_implementation`.

Convention: q, k, v are (B, S, N, D) (seq-major, heads split), output
(B, S, N, D). Scale is 1/sqrt(D) unless given.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_IMPL = os.environ.get("FAIRYGEN_ATTENTION_IMPLEMENTATION", "auto")

_VALID = ("auto", "pallas", "xla")


def set_attention_implementation(impl: str):
    global _IMPL
    assert impl in _VALID, impl
    _IMPL = impl


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _resolve(impl: Optional[str]) -> str:
    impl = impl or _IMPL
    if impl == "auto":
        return "pallas" if _on_tpu() else "xla"
    return impl


_LOG2E = 1.4426950408889634


def xla_attention(q, k, v, scale=None, prescaled=False, kv_len=None,
                  bias=None):
    """Reference XLA path — fp32 softmax, works on any backend.

    ``bias``: optional additive fp32 logits bias (B|1, N|1, S, T) — torch
    SDPA ``attn_mask`` semantics (added after scaling); used by EliGen's
    entity-region masks."""
    d = q.shape[-1]
    if prescaled:
        # caller folded scale·log2e into q (see flash_attention)
        scale = 1.0 / _LOG2E
    else:
        scale = (d**-0.5) if scale is None else scale
    # (B,S,N,D) -> einsum over heads
    logits = jnp.einsum("bsnd,btnd->bnst", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if kv_len is not None and kv_len != k.shape[1]:
        col = jnp.arange(k.shape[1])[None, None, None, :]
        logits = jnp.where(col < kv_len, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnst,btnd->bsnd", probs, v)


def xla_attention_with_lse(q, k, v, scale=None, prescaled=False,
                           valid_cols=None):
    """Attention that also returns the per-row logsumexp in **base 2**
    (matching the Pallas kernel's internal domain) for partial-softmax
    merging (ring / context-parallel attention).

    ``valid_cols``: optional boolean (T,) kv-column validity mask — may be
    a *traced* value (unlike ``kv_len``, which is static), which ring
    attention needs because each device sees a different kv chunk.
    Returns (out (B,S,N,D), lse2 (B,S,N) float32)."""
    d = q.shape[-1]
    if prescaled:
        mult = 1.0  # q already carries scale·log2e
    else:
        mult = ((d**-0.5) if scale is None else scale) * _LOG2E
    logits2 = jnp.einsum("bsnd,btnd->bnst", q, k).astype(jnp.float32) * mult
    if valid_cols is not None:
        logits2 = jnp.where(valid_cols[None, None, None, :], logits2, -1e30)
    m = jnp.max(logits2, axis=-1, keepdims=True)
    p = jnp.exp2(logits2 - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bnst,btnd->bsnd", (p / l).astype(q.dtype), v)
    lse2 = (m + jnp.log2(l))[..., 0].transpose(0, 2, 1)  # (B, S, N)
    return out, lse2


def attention_with_lse(q, k, v, scale=None, impl: Optional[str] = None,
                       prescaled: bool = False,
                       kv_len: Optional[int] = None):
    """Like :func:`attention` but also returns base-2 logsumexp (B,S,N).

    Note: the Pallas path reuses the backward-pass LSE kernel and is
    forward-only (no custom VJP on the lse output); use impl='xla' when
    differentiating through the partials (e.g. context-parallel training
    experiments)."""
    resolved = _resolve(impl)
    if resolved == "pallas":
        from .flash_attention import flash_attention_with_lse

        return flash_attention_with_lse(q, k, v, scale=scale,
                                        prescaled=prescaled, kv_len=kv_len)
    valid = None
    if kv_len is not None and kv_len != k.shape[1]:
        valid = jnp.arange(k.shape[1]) < kv_len
    return xla_attention_with_lse(q, k, v, scale=scale, prescaled=prescaled,
                                  valid_cols=valid)


def attention(q, k, v, scale=None, impl: Optional[str] = None,
              prescaled: bool = False, kv_len: Optional[int] = None,
              bias=None, bounded_logits: bool = False):
    """Scaled dot-product attention, (B, S, N, D) in/out.

    Video DiT self/cross attention is dense (no causal mask) —
    reference wan_video_dit.py:27-60.  ``prescaled``: q already carries
    scale·log2e (folded into the producing norm — exactly free on TPU).
    ``kv_len``: mask kv padding columns exactly (Ulysses ragged tokens).
    ``bias``: additive logits bias (EliGen entity-region masks).
    Head-shared biases get their own Pallas kernel
    (``flash_attention_bias`` — the bias tile streams once per batch
    row); per-head biases fall back to the XLA path.
    ``bounded_logits``: skip softmax max-tracking in the Pallas kernels —
    pass True ONLY when q/k are rms-normed (then |logits₂| <= √d·log2e
    < 17, so exp2 cannot overflow and the shift is mathematically
    unnecessary); ignored on the XLA path.
    """
    resolved = _resolve(impl)
    if resolved == "pallas" and bias is None:
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale, prescaled=prescaled,
                               kv_len=kv_len, bounded_logits=bounded_logits)
    if resolved == "pallas" and bias is not None and kv_len is None \
            and bias.ndim == 4 and bias.shape[1] == 1:
        # head-shared additive bias (EliGen regional masks) has its own
        # flash kernel — the bias tile streams once per batch row
        from .flash_attention import flash_attention_bias

        return flash_attention_bias(q, k, v, bias[:, 0], scale=scale,
                                    prescaled=prescaled)
    return xla_attention(q, k, v, scale=scale, prescaled=prescaled,
                         kv_len=kv_len, bias=bias)
