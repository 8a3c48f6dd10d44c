"""UMT5-XXL text encoder (WanTextEncoder re-implementation).

Mirrors the reference ``animation/diffsynth/models/wan_video_text_encoder.py``:
24 encoder layers, dim 4096, ffn 10240 (gated GELU-tanh), 64 heads,
per-layer bidirectional relative position buckets (num_buckets=32,
shared_pos=False), unscaled attention with additive position bias, T5
layer norm (no mean subtraction), final norm.

The relative position bias is a static (1, H, L, L) table per layer —
precomputed host-side from the bucket function (text_encoder.py:174-193)
and gathered from each layer's (buckets, heads) embedding.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.norms import t5_layer_norm


@dataclasses.dataclass(frozen=True)
class UMT5Config:
    vocab: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    # T5 v1.1 (FLUX's text encoder 2): ONE relative-attention-bias table on
    # layer 0, shared by every layer; UMT5 has one per layer.
    shared_pos_bias: bool = False

    @property
    def head_dim(self):
        return self.dim_attn // self.num_heads

    @staticmethod
    def umt5_xxl() -> "UMT5Config":
        return UMT5Config()

    @staticmethod
    def t5_v1_1_xxl() -> "UMT5Config":
        """google/t5-v1_1-xxl encoder — FLUX.1's TE2 (reference
        flux_text_encoder_t5.py:6-38: d_ff 10240, d_model 4096, 64 heads,
        24 layers, gated-gelu, vocab 32128)."""
        return UMT5Config(vocab=32128, shared_pos_bias=True)

    @staticmethod
    def tiny(**over) -> "UMT5Config":
        base = dict(vocab=128, dim=32, dim_attn=32, dim_ffn=48, num_heads=4, num_layers=2)
        base.update(over)
        return UMT5Config(**base)


def relative_position_buckets(lq: int, lk: int, num_buckets: int = 32,
                              max_dist: int = 128) -> np.ndarray:
    """Bidirectional T5 bucket ids (lq, lk) — reference text_encoder.py:174-193."""
    rel = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / math.log(max_dist / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(rel < max_exact, rel, large)
    return buckets


def _gelu_tanh(x):
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf**3)))
    return y.astype(x.dtype)


def _dense(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype)


def t5_attention(p, x, cfg: UMT5Config, pos_bias, mask=None):
    """Unscaled attention + additive bias — reference text_encoder.py:58-92."""
    b, l, _ = x.shape
    n, c = cfg.num_heads, cfg.head_dim
    q = _dense(p["q"], x).reshape(b, l, n, c)
    k = _dense(p["k"], x).reshape(b, l, n, c)
    v = _dense(p["v"], x).reshape(b, l, n, c)
    logits = jnp.einsum("binc,bjnc->bnij", q, k).astype(jnp.float32)
    logits = logits + pos_bias.astype(jnp.float32)
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, None, :] == 0, neg, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnij,bjnc->binc", probs, v).reshape(b, l, n * c)
    return _dense(p["o"], o)


def t5_block(p, x, cfg: UMT5Config, pos_bias, mask=None):
    h = t5_layer_norm(x, p["norm1"])
    x = x + t5_attention(p["attn"], h, cfg, pos_bias, mask)
    h = t5_layer_norm(x, p["norm2"])
    ff = _dense(p["ffn"]["fc1"], h) * _gelu_tanh(_dense(p["ffn"]["gate"], h))
    x = x + _dense(p["ffn"]["fc2"], ff)
    return x


def umt5_encode(params, cfg: UMT5Config, ids, mask=None):
    """ids (B, L) int32 -> embeddings (B, L, dim)."""
    x = params["token_embedding"][ids]
    L = ids.shape[1]
    buckets = jnp.asarray(relative_position_buckets(L, L, cfg.num_buckets, cfg.max_dist))
    shared_bias = None
    if cfg.shared_pos_bias:
        shared_bias = jnp.transpose(params["pos_emb"][buckets], (2, 0, 1))[None]
    for p in params["blocks"]:
        if shared_bias is not None:
            bias = shared_bias
        else:
            # per-layer relative embedding: (buckets, heads) -> (1, H, L, L)
            bias = p["pos_emb"][buckets]  # (L, L, H)
            bias = jnp.transpose(bias, (2, 0, 1))[None]
        x = t5_block(p, x, cfg, bias, mask)
    x = t5_layer_norm(x, params["norm"])
    return x


def mask_pad_tokens(emb, mask):
    """Zero embeddings past each sequence's length — reference
    wan_video.py:404-412 (PromptEmbedder.encode_prompt)."""
    return emb * (mask > 0)[..., None].astype(emb.dtype)


# ------------------------------------------------------------------ converter
def convert_umt5_state_dict(sd: Dict[str, np.ndarray], cfg: UMT5Config, dtype=None):
    def t(name):
        return np.asarray(sd[name]).T

    def g(name):
        return np.asarray(sd[name])

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        blocks.append(
            {
                "norm1": g(pre + ".norm1.weight"),
                "norm2": g(pre + ".norm2.weight"),
                "attn": {
                    "q": {"w": t(pre + ".attn.q.weight")},
                    "k": {"w": t(pre + ".attn.k.weight")},
                    "v": {"w": t(pre + ".attn.v.weight")},
                    "o": {"w": t(pre + ".attn.o.weight")},
                },
                "ffn": {
                    "gate": {"w": t(pre + ".ffn.gate.0.weight")},
                    "fc1": {"w": t(pre + ".ffn.fc1.weight")},
                    "fc2": {"w": t(pre + ".ffn.fc2.weight")},
                },
                "pos_emb": g(pre + ".pos_embedding.embedding.weight"),
            }
        )
    params = {
        "token_embedding": g("token_embedding.weight"),
        "blocks": blocks,
        "norm": g("norm.weight"),
    }
    if dtype is not None:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    else:
        params = jax.tree.map(jnp.asarray, params)
    return params


def convert_t5_encoder_state_dict(sd: Dict[str, np.ndarray], cfg: UMT5Config,
                                  dtype=None):
    """transformers ``T5EncoderModel.state_dict()`` naming (FLUX's TE2 is a
    straight subclass, reference flux_text_encoder_t5.py:5-43)."""
    def t(name):
        return np.asarray(sd[name]).T

    def g(name):
        return np.asarray(sd[name])

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        blocks.append({
            "norm1": g(pre + ".layer.0.layer_norm.weight"),
            "norm2": g(pre + ".layer.1.layer_norm.weight"),
            "attn": {
                "q": {"w": t(pre + ".layer.0.SelfAttention.q.weight")},
                "k": {"w": t(pre + ".layer.0.SelfAttention.k.weight")},
                "v": {"w": t(pre + ".layer.0.SelfAttention.v.weight")},
                "o": {"w": t(pre + ".layer.0.SelfAttention.o.weight")},
            },
            # v1.1 gated act: hidden = act(wi_0) * wi_1 — wi_0 is the
            # activated ("gate") branch, wi_1 the linear one
            "ffn": {
                "gate": {"w": t(pre + ".layer.1.DenseReluDense.wi_0.weight")},
                "fc1": {"w": t(pre + ".layer.1.DenseReluDense.wi_1.weight")},
                "fc2": {"w": t(pre + ".layer.1.DenseReluDense.wo.weight")},
            },
        })
    emb_key = "shared.weight" if "shared.weight" in sd \
        else "encoder.embed_tokens.weight"
    params = {
        "token_embedding": g(emb_key),
        "pos_emb": g("encoder.block.0.layer.0.SelfAttention"
                     ".relative_attention_bias.weight"),
        "blocks": blocks,
        "norm": g("encoder.final_layer_norm.weight"),
    }
    if dtype is not None:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    else:
        params = jax.tree.map(jnp.asarray, params)
    return params
