"""FLUX IP-Adapter — functional JAX port.

Mirrors the reference ``FluxIpAdapter``
(``animation/diffsynth/models/flux_ipadapter.py:23-98``): a SigLIP
pooled embedding is projected by ``MLPProjModel`` into ``num_tokens``
image-prompt tokens, and every DiT block (19 double + 38 single) gets a
bias-free ``to_k_ip``/``to_v_ip`` pair; the block's (pre-rope in double,
post-rope in single) query runs a second attention against those ip
tokens whose output is added — scaled — to the attention output before
the output projection (``interact_with_ipadapter``, flux_dit.py:6-11,
applied at :97-98 and :240-241).

The per-block adapters ride the main DiT's scans as stacked xs (see
``flux_dit_forward(ipadapter=...)``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FluxIpAdapterConfig:
    num_heads: int = 24
    head_dim: int = 128
    cross_attention_dim: int = 4096
    id_embeddings_dim: int = 1152  # SigLIP SO400M pooled width
    num_tokens: int = 128
    num_double_blocks: int = 19
    num_single_blocks: int = 38
    eps: float = 1e-5  # norm_added_k RMS eps (no affine)

    @staticmethod
    def tiny(**over) -> "FluxIpAdapterConfig":
        base = dict(num_heads=4, head_dim=24, cross_attention_dim=64,
                    id_embeddings_dim=16, num_tokens=8, num_double_blocks=2,
                    num_single_blocks=2)
        base.update(over)
        return FluxIpAdapterConfig(**base)


def flux_ipadapter_project(params, cfg: FluxIpAdapterConfig, image_embeds):
    """``MLPProjModel`` + the flatten (flux_ipadapter.py:23-40, 79-80):
    (N_img, id_dim) pooled embeds -> (1, N_img*num_tokens, cross_dim)."""
    p = params["image_proj"]
    x = jnp.dot(image_embeds, p["fc1"]["w"].astype(image_embeds.dtype)) \
        + p["fc1"]["b"].astype(image_embeds.dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = jnp.dot(x, p["fc2"]["w"].astype(x.dtype)) \
        + p["fc2"]["b"].astype(x.dtype)
    x = x.reshape(-1, cfg.num_tokens, cfg.cross_attention_dim)
    xf = x.astype(jnp.float32)
    xf = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        xf.var(-1, keepdims=True) + 1e-5)
    x = (xf * p["ln"]["w"].astype(jnp.float32)
         + p["ln"]["b"].astype(jnp.float32)).astype(x.dtype)
    return x.reshape(1, -1, cfg.cross_attention_dim)


def init_flux_ipadapter_params(key, cfg: FluxIpAdapterConfig,
                               dtype=jnp.float32):
    d_out = cfg.num_heads * cfg.head_dim
    kd, ks, kp = jax.random.split(key, 3)

    def blocks(k, n):
        def one(kk):
            k1, k2 = jax.random.split(kk)
            lim = cfg.cross_attention_dim ** -0.5
            return {
                "to_k_ip": {"w": jax.random.uniform(
                    k1, (cfg.cross_attention_dim, d_out), dtype, -lim, lim)},
                "to_v_ip": {"w": jax.random.uniform(
                    k2, (cfg.cross_attention_dim, d_out), dtype, -lim, lim)},
            }

        items = [one(jax.random.fold_in(k, i)) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *items)

    k1, k2 = jax.random.split(kp)
    lim = cfg.id_embeddings_dim ** -0.5
    return {
        "double": blocks(kd, cfg.num_double_blocks),
        "single": blocks(ks, cfg.num_single_blocks),
        "image_proj": {
            "fc1": {"w": jax.random.uniform(
                k1, (cfg.id_embeddings_dim, 2 * cfg.id_embeddings_dim),
                dtype, -lim, lim),
                "b": jnp.zeros((2 * cfg.id_embeddings_dim,), dtype)},
            "fc2": {"w": jax.random.uniform(
                k2, (2 * cfg.id_embeddings_dim,
                     cfg.cross_attention_dim * cfg.num_tokens),
                dtype, -lim, lim),
                "b": jnp.zeros(
                    (cfg.cross_attention_dim * cfg.num_tokens,), dtype)},
            "ln": {"w": jnp.ones((cfg.cross_attention_dim,), dtype),
                   "b": jnp.zeros((cfg.cross_attention_dim,), dtype)},
        },
    }


def convert_flux_ipadapter_state_dict(sd: Dict[str, Any],
                                      cfg: FluxIpAdapterConfig, dtype=None):
    """Consumes the reference module naming (``ipadapter_modules.{i}``,
    ``image_proj.proj.{0,2}``, ``image_proj.norm``) — what
    ``FluxIpAdapterStateDictConverter.from_diffusers`` emits from the
    published {"ip_adapter": ..., "image_proj": ...} checkpoints."""
    import numpy as _np

    if "ip_adapter" in sd:  # raw published two-dict layout
        flat = {}
        for k, v in sd["ip_adapter"].items():
            flat[f"ipadapter_modules.{k}"] = v
        for k, v in sd["image_proj"].items():
            flat[f"image_proj.{k}"] = v
        sd = flat

    def block(i):
        pre = f"ipadapter_modules.{i}"
        return {
            "to_k_ip": {"w": _np.asarray(sd[pre + ".to_k_ip.weight"]).T},
            "to_v_ip": {"w": _np.asarray(sd[pre + ".to_v_ip.weight"]).T},
        }

    nd = cfg.num_double_blocks
    params = {
        "double": jax.tree.map(lambda *xs: _np.stack(xs),
                               *[block(i) for i in range(nd)]),
        "single": jax.tree.map(
            lambda *xs: _np.stack(xs),
            *[block(nd + i) for i in range(cfg.num_single_blocks)]),
        "image_proj": {
            "fc1": {"w": _np.asarray(sd["image_proj.proj.0.weight"]).T,
                    "b": _np.asarray(sd["image_proj.proj.0.bias"])},
            "fc2": {"w": _np.asarray(sd["image_proj.proj.2.weight"]).T,
                    "b": _np.asarray(sd["image_proj.proj.2.bias"])},
            "ln": {"w": _np.asarray(sd["image_proj.norm.weight"]),
                   "b": _np.asarray(sd["image_proj.norm.bias"])},
        },
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)
