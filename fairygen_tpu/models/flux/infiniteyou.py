"""InfiniteYou identity projector — functional JAX port.

Mirrors the reference ``InfiniteYouImageProjector``
(``animation/diffsynth/models/flux_infiniteyou.py:77-117``): a Perceiver
resampler — 8 learned query latents cross-attend the arcface identity
embedding over 4 depth-(attn+FF) layers — producing 8 identity tokens at
4096 that the FLUX ControlNet consumes AS its prompt embedding (with
zero text ids and its own ``infinityou_guidance``;
``model_fn_flux_image``, ``pipelines/flux_image.py:1087-1090``).

Face detection/alignment (insightface antelopev2 + facexlib arcface,
``InfinitYou.prepare_infinite_you``) is an external ONNX stack not
shipped here — the pipeline takes the precomputed 512-d arcface
embedding directly (``infiniteyou_id_embedding``), mirroring how s2v
takes precomputed wav2vec features.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class InfiniteYouProjectorConfig:
    dim: int = 1280
    depth: int = 4
    dim_head: int = 64
    heads: int = 20
    num_queries: int = 8
    embedding_dim: int = 512
    output_dim: int = 4096

    @staticmethod
    def tiny(**over) -> "InfiniteYouProjectorConfig":
        base = dict(dim=32, depth=2, dim_head=8, heads=4, num_queries=2,
                    embedding_dim=16, output_dim=48)
        base.update(over)
        return InfiniteYouProjectorConfig(**base)


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    y = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        xf.var(-1, keepdims=True) + eps)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _perceiver_attention(p, x, latents, cfg: InfiniteYouProjectorConfig):
    """PerceiverAttention (flux_infiniteyou.py:28-73): queries from the
    latents, keys/values from [features; latents]."""
    b, l, _ = latents.shape
    nh, hd = cfg.heads, cfg.dim_head
    x = _ln(p["norm1"], x)
    lat = _ln(p["norm2"], latents)
    q = jnp.dot(lat, p["to_q"]["w"].astype(lat.dtype))
    kv_in = jnp.concatenate([x, lat], axis=-2)
    kv = jnp.dot(kv_in, p["to_kv"]["w"].astype(kv_in.dtype))
    k, v = jnp.split(kv, 2, axis=-1)

    def heads(t):
        return t.reshape(b, t.shape[1], nh, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bnqd,bnkd->bnqk", q, k).astype(jnp.float32) \
        * (hd ** -0.5)
    w = jax.nn.softmax(logits, -1).astype(v.dtype)
    o = jnp.einsum("bnqk,bnkd->bnqd", w, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
    return jnp.dot(o, p["to_out"]["w"].astype(o.dtype))


def infiniteyou_project(params, cfg: InfiniteYouProjectorConfig, id_emb):
    """(B, n, embedding_dim) arcface embedding -> (B, num_queries,
    output_dim) identity tokens (flux_infiniteyou.py:104-117)."""
    b = id_emb.shape[0]
    lat = jnp.broadcast_to(params["latents"].astype(id_emb.dtype),
                           (b, cfg.num_queries, cfg.dim))
    x = jnp.dot(id_emb, params["proj_in"]["w"].astype(id_emb.dtype)) \
        + params["proj_in"]["b"].astype(id_emb.dtype)

    def body(lat, p):
        lat = _perceiver_attention(p["attn"], x, lat, cfg) + lat
        h = _ln(p["ff_ln"], lat)
        h = jnp.dot(h, p["ff1"]["w"].astype(h.dtype))
        h = jnp.dot(jax.nn.gelu(h, approximate=False),
                    p["ff2"]["w"].astype(h.dtype))
        return lat + h, None

    lat, _ = jax.lax.scan(body, lat, params["layers"])
    out = jnp.dot(lat, params["proj_out"]["w"].astype(lat.dtype)) \
        + params["proj_out"]["b"].astype(lat.dtype)
    return _ln(params["norm_out"], out)


def convert_infiniteyou_state_dict(sd: Dict[str, Any],
                                   cfg=None, dtype=None):
    """Consumes the projector module naming (the published checkpoint's
    ``image_proj`` sub-dict, flux_infiniteyou.py:125-127)."""
    import numpy as _np

    if "image_proj" in sd:
        sd = sd["image_proj"]
    if cfg is None:
        pin = sd["proj_in.weight"]
        cfg = InfiniteYouProjectorConfig(
            dim=pin.shape[0], embedding_dim=pin.shape[1],
            depth=1 + max(int(k.split(".")[1]) for k in sd
                          if k.startswith("layers.")),
            num_queries=sd["latents"].shape[1],
            output_dim=sd["proj_out.weight"].shape[0])

    def lin(name, bias=True):
        p = {"w": _np.asarray(sd[name + ".weight"]).T}
        if bias:
            p["b"] = _np.asarray(sd[name + ".bias"])
        return p

    def ln(name):
        return {"w": _np.asarray(sd[name + ".weight"]),
                "b": _np.asarray(sd[name + ".bias"])}

    def layer(i):
        pre = f"layers.{i}"
        return {
            "attn": {
                "norm1": ln(pre + ".0.norm1"),
                "norm2": ln(pre + ".0.norm2"),
                "to_q": lin(pre + ".0.to_q", bias=False),
                "to_kv": lin(pre + ".0.to_kv", bias=False),
                "to_out": lin(pre + ".0.to_out", bias=False),
            },
            "ff_ln": ln(pre + ".1.0"),
            "ff1": lin(pre + ".1.1", bias=False),
            "ff2": lin(pre + ".1.3", bias=False),
        }

    params = {
        "latents": _np.asarray(sd["latents"]),
        "proj_in": lin("proj_in"),
        "proj_out": lin("proj_out"),
        "norm_out": ln("norm_out"),
        "layers": jax.tree.map(lambda *xs: _np.stack(xs),
                               *[layer(i) for i in range(cfg.depth)]),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params), cfg
