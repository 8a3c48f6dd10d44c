"""Wan CLIP image encoder (open-CLIP XLM-RoBERTa-Large ViT-Huge/14 visual
tower) — the I2V-A14B CLIP conditioning branch.

Port of ``animation/diffsynth/models/wan_video_image_encoder.py``:
``encode_image`` bicubic-resizes to 224, CLIP-normalizes, and runs the ViT
through all but the last block (``use_31_block=True``, :456-480, :865-877),
returning (B, 257, 1280) features for the DiT's ``img_emb`` MLP.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    activation: str = "gelu"
    norm_eps: float = 1e-5

    @staticmethod
    def vit_h_14() -> "ViTConfig":
        return ViTConfig()

    @staticmethod
    def tiny(**over) -> "ViTConfig":
        base = dict(image_size=28, patch_size=14, dim=32, num_heads=4, num_layers=3)
        base.update(over)
        return ViTConfig(**base)


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _dense(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _act(x, kind):
    xf = x.astype(jnp.float32)
    if kind == "quick_gelu":
        y = xf * jax.nn.sigmoid(1.702 * xf)
    else:
        y = jax.nn.gelu(xf, approximate=False)
    return y.astype(x.dtype)


def vit_forward(params, cfg: ViTConfig, images, use_31_block: bool = True):
    """images (B, 3, H, W) CLIP-normalized -> tokens (B, 1+P², dim)."""
    b = images.shape[0]
    p = cfg.patch_size
    x = jnp.transpose(images, (0, 2, 3, 1))  # NHWC
    B, H, W, C = x.shape
    x = x.reshape(B, H // p, p, W // p, p, C)
    # channel-first patch order (c, kh, kw) to match torch Conv2d flatten
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, (H // p) * (W // p), C * p * p)
    x = _dense(params["patch_embedding"], x)
    cls = jnp.broadcast_to(params["cls_embedding"].astype(x.dtype), (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    if "pre_norm" in params:
        x = _ln(params["pre_norm"], x, cfg.norm_eps)

    n_blocks = cfg.num_layers - 1 if use_31_block else cfg.num_layers
    for blk in params["blocks"][:n_blocks]:
        h = _ln(blk["norm1"], x, cfg.norm_eps)
        qkv = _dense(blk["to_qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B_, L, D = q.shape
        hd = D // cfg.num_heads
        logits = jnp.einsum(
            "bqnd,bknd->bnqk",
            q.reshape(B_, L, cfg.num_heads, hd),
            k.reshape(B_, L, cfg.num_heads, hd),
        ).astype(jnp.float32) * (hd**-0.5)
        probs = jax.nn.softmax(logits, -1).astype(x.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v.reshape(B_, L, cfg.num_heads, hd))
        x = x + _dense(blk["proj"], o.reshape(B_, L, D))
        h = _ln(blk["norm2"], x, cfg.norm_eps)
        h = _dense(blk["fc2"], _act(_dense(blk["fc1"], h), cfg.activation))
        x = x + h
    if not use_31_block:
        x = _ln(params["post_norm"], x, cfg.norm_eps)
    return x


def _bicubic_resize(images, size):
    """(B, 3, H, W) bicubic to (size, size) — jax.image (matches
    F.interpolate align_corners=False closely)."""
    return jax.image.resize(
        images, images.shape[:2] + (size, size), method="cubic"
    )


def encode_image(params, cfg: ViTConfig, images_pm1):
    """images (B, 3, H, W) in [-1,1] -> (B, 257, dim).

    Reference encode_image (:865-877): bicubic resize, ·0.5+0.5, CLIP
    normalize, visual(use_31_block=True)."""
    x = _bicubic_resize(images_pm1.astype(jnp.float32), cfg.image_size)
    x = x * 0.5 + 0.5
    mean = jnp.asarray(CLIP_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_STD).reshape(1, 3, 1, 1)
    x = (x - mean) / std
    return vit_forward(params, cfg, x, use_31_block=True)


def convert_vit_state_dict(sd: Dict[str, np.ndarray], cfg: ViTConfig, dtype=None,
                           prefix: str = ""):
    """Torch VisionTransformer state dict (optionally 'model.visual.'-
    prefixed, as in WanImageEncoder checkpoints)."""
    if prefix == "" and any(k.startswith("model.visual.") for k in sd):
        prefix = "model.visual."

    def g(name):
        return np.asarray(sd[prefix + name])

    def lw(name):
        p = {"w": g(name + ".weight").T}
        if prefix + name + ".bias" in sd:
            p["b"] = g(name + ".bias")
        return p

    def nw(name):
        return {"w": g(name + ".weight"), "b": g(name + ".bias")}

    pe = g("patch_embedding.weight")  # (D, 3, p, p)
    params: Dict[str, Any] = {
        "patch_embedding": {"w": pe.transpose(1, 2, 3, 0).reshape(-1, cfg.dim)},
        "cls_embedding": g("cls_embedding").reshape(1, 1, cfg.dim),
        "pos_embedding": g("pos_embedding"),
    }
    if prefix + "patch_embedding.bias" in sd:
        params["patch_embedding"]["b"] = g("patch_embedding.bias")
    if prefix + "pre_norm.weight" in sd:
        params["pre_norm"] = nw("pre_norm")
    if prefix + "post_norm.weight" in sd:
        params["post_norm"] = nw("post_norm")
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer.{i}"
        blocks.append({
            "norm1": nw(pre + ".norm1"),
            "to_qkv": lw(pre + ".attn.to_qkv"),
            "proj": lw(pre + ".attn.proj"),
            "norm2": nw(pre + ".norm2"),
            "fc1": lw(pre + ".mlp.0"),
            "fc2": lw(pre + ".mlp.2"),
        })
    params["blocks"] = blocks
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
    return jax.tree.map(cast, params)
