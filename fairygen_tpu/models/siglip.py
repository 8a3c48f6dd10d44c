"""SigLIP vision towers — functional JAX port.

One parameterized module covers both reference wrappers:
``SiglipVisionModelSO400M`` (``models/flux_ipadapter.py:6-21``, the FLUX
IP-Adapter image encoder: 27 layers / 1152 wide / patch 14 @ 384) and
``Siglip2ImageEncoder`` (``models/siglip2_image_encoder.py``: 40 layers /
1536 wide / patch 16 @ 384, used by Qwen image2lora).  Architecture is
the transformers ``SiglipVisionTransformer``: patch-conv + learned
position embeddings (no CLS), pre-norm encoder with gelu-tanh MLPs, post
layernorm, and a probe-query attention-pooling head whose output is
``pooler_output``.

Both wrappers normalize with mean/std 0.5 — i.e. the pipelines' own
[-1, 1] ``preprocess_image`` range, so no extra normalization here.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    eps: float = 1e-6

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @staticmethod
    def so400m() -> "SiglipVisionConfig":
        return SiglipVisionConfig()

    @staticmethod
    def siglip2_g() -> "SiglipVisionConfig":
        return SiglipVisionConfig(hidden_size=1536, intermediate_size=6144,
                                  num_layers=40, patch_size=16)

    @staticmethod
    def tiny(**over) -> "SiglipVisionConfig":
        base = dict(hidden_size=32, intermediate_size=64, num_layers=2,
                    num_heads=4, image_size=28, patch_size=14)
        base.update(over)
        return SiglipVisionConfig(**base)


def _dense(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    y = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        xf.var(-1, keepdims=True) + eps)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _attention(q, k, v, nh):
    b, lq, d = q.shape
    hd = d // nh
    q = q.reshape(b, lq, nh, hd)
    k = k.reshape(b, k.shape[1], nh, hd)
    v = v.reshape(b, v.shape[1], nh, hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32) \
        * (hd ** -0.5)
    probs = jax.nn.softmax(logits, -1).astype(v.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, lq, d)


def siglip_vision_forward(params, cfg: SiglipVisionConfig, images,
                          with_pooled: bool = True):
    """images (B, 3, H, W) in [-1, 1] -> (pooler (B, D), tokens (B, P², D)).

    ``pooler`` mirrors ``SiglipVisionModel(...).pooler_output``
    (flux_image.py:513); ``tokens`` is the post-layernorm sequence."""
    b = images.shape[0]
    p = cfg.patch_size
    x = jnp.transpose(images, (0, 2, 3, 1))
    B, H, W, C = x.shape
    # transformers' SiglipVisionEmbeddings patchifies with a VALID-padded
    # stride-p conv, which silently drops trailing rows/cols when H or W
    # is not a multiple of p (so400m: 384/14 -> 27 patches over 378 px).
    # Crop to the same window so the reshape is exact.
    if H % p or W % p:
        x = x[:, : (H // p) * p, : (W // p) * p, :]
        H, W = (H // p) * p, (W // p) * p
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, (H // p) * (W // p),
                                              C * p * p)
    x = _dense(params["patch_embed"], x)
    x = x + params["pos_embed"].astype(x.dtype)[None]

    def body(x, blk):
        h = _ln(blk["ln1"], x, cfg.eps)
        o = _attention(_dense(blk["q"], h), _dense(blk["k"], h),
                       _dense(blk["v"], h), cfg.num_heads)
        x = x + _dense(blk["o"], o)
        h = _ln(blk["ln2"], x, cfg.eps)
        h = _dense(blk["fc2"], jax.nn.gelu(_dense(blk["fc1"], h)))
        return x + h, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    tokens = _ln(params["post_ln"], x, cfg.eps)

    if not with_pooled:
        return None, tokens
    # MultiheadAttentionPoolingHead: probe-query MHA + LN + MLP residual
    head = params["head"]
    probe = jnp.broadcast_to(head["probe"].astype(tokens.dtype),
                             (b, 1, cfg.hidden_size))
    o = _attention(_dense(head["q"], probe), _dense(head["k"], tokens),
                   _dense(head["v"], tokens), cfg.num_heads)
    o = _dense(head["o"], o)
    h = _ln(head["ln"], o, cfg.eps)
    h = _dense(head["fc2"], jax.nn.gelu(_dense(head["fc1"], h)))
    return (o + h)[:, 0], tokens


def init_siglip_vision_params(key, cfg: SiglipVisionConfig,
                              dtype=jnp.float32):
    d, m = cfg.hidden_size, cfg.intermediate_size
    npatch = (cfg.image_size // cfg.patch_size) ** 2

    def dense(k, din, dout):
        k1, k2 = jax.random.split(k)
        lim = din ** -0.5
        return {"w": jax.random.uniform(k1, (din, dout), dtype, -lim, lim),
                "b": jax.random.uniform(k2, (dout,), dtype, -lim, lim)}

    def ln():
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    def block(k):
        ks = jax.random.split(k, 6)
        return {"ln1": ln(), "q": dense(ks[0], d, d), "k": dense(ks[1], d, d),
                "v": dense(ks[2], d, d), "o": dense(ks[3], d, d),
                "ln2": ln(), "fc1": dense(ks[4], d, m),
                "fc2": dense(ks[5], m, d)}

    kk = jax.random.split(key, 8)
    blocks = [block(jax.random.fold_in(kk[2], i))
              for i in range(cfg.num_layers)]
    return {
        "patch_embed": dense(kk[0], 3 * cfg.patch_size ** 2, d),
        "pos_embed": jax.random.normal(kk[1], (npatch, d), dtype) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "post_ln": ln(),
        "head": {"probe": jax.random.normal(kk[3], (1, 1, d), dtype) * 0.02,
                 "q": dense(kk[4], d, d), "k": dense(kk[5], d, d),
                 "v": dense(kk[6], d, d), "o": dense(kk[7], d, d),
                 "ln": ln(), "fc1": dense(jax.random.fold_in(kk[7], 1), d, m),
                 "fc2": dense(jax.random.fold_in(kk[7], 2), m, d)},
    }


def convert_siglip_vision_state_dict(sd: Dict[str, Any],
                                     cfg: SiglipVisionConfig, dtype=None):
    """Consumes transformers ``SiglipVisionModel`` / the reference
    wrappers' state dicts (``vision_model.`` prefix stripped if present)."""
    import numpy as _np

    sd = {(k[len("vision_model."):] if k.startswith("vision_model.") else k):
          v for k, v in sd.items()}

    def lin(name):
        p = {"w": _np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = _np.asarray(sd[name + ".bias"])
        return p

    def ln(name):
        return {"w": _np.asarray(sd[name + ".weight"]),
                "b": _np.asarray(sd[name + ".bias"])}

    def block(i):
        pre = f"encoder.layers.{i}"
        return {
            "ln1": ln(pre + ".layer_norm1"),
            "q": lin(pre + ".self_attn.q_proj"),
            "k": lin(pre + ".self_attn.k_proj"),
            "v": lin(pre + ".self_attn.v_proj"),
            "o": lin(pre + ".self_attn.out_proj"),
            "ln2": ln(pre + ".layer_norm2"),
            "fc1": lin(pre + ".mlp.fc1"),
            "fc2": lin(pre + ".mlp.fc2"),
        }

    pw = _np.asarray(sd["embeddings.patch_embedding.weight"])  # (D,3,p,p)
    params = {
        "patch_embed": {
            # conv flatten order (c, kh, kw) matches the patch extraction
            "w": pw.reshape(pw.shape[0], -1).T,
            "b": _np.asarray(sd["embeddings.patch_embedding.bias"]),
        },
        "pos_embed": _np.asarray(sd["embeddings.position_embedding.weight"]),
        "blocks": jax.tree.map(lambda *xs: _np.stack(xs),
                               *[block(i) for i in range(cfg.num_layers)]),
        "post_ln": ln("post_layernorm"),
    }
    if "head.probe" in sd:
        d = cfg.hidden_size
        inw = _np.asarray(sd["head.attention.in_proj_weight"])
        inb = _np.asarray(sd["head.attention.in_proj_bias"])
        params["head"] = {
            "probe": _np.asarray(sd["head.probe"]),
            "q": {"w": inw[:d].T, "b": inb[:d]},
            "k": {"w": inw[d:2 * d].T, "b": inb[d:2 * d]},
            "v": {"w": inw[2 * d:].T, "b": inb[2 * d:]},
            "o": lin("head.attention.out_proj"),
            "ln": ln("head.layernorm"),
            "fc1": lin("head.mlp.fc1"),
            "fc2": lin("head.mlp.fc2"),
        }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)
