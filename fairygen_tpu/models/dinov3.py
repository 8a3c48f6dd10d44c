"""DINOv3 ViT image encoder — functional JAX port.

Mirrors the reference ``DINOv3ImageEncoder``
(``animation/diffsynth/models/dinov3_image_encoder.py``: a transformers
``DINOv3ViTModel`` at 40 layers / 4096 wide / patch 16 @ 224 whose
forward returns the CLS pooled output), used by the Qwen Image2LoRA
pipeline.  Architecture: cls + register tokens + patch conv (no absolute
positions), 2-axis rope over normalized patch-center coordinates applied
to patch tokens only (half-split rotate, theta 100), bias-free q/k/v,
LayerScale on both residual branches, gated SiLU MLP.

Preprocessing is ImageNet-normalized 224x224 (``preprocess_dinov3``).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class DINOv3Config:
    hidden_size: int = 4096
    intermediate_size: int = 8192
    num_layers: int = 40
    num_heads: int = 32
    num_register_tokens: int = 4
    image_size: int = 224
    patch_size: int = 16
    rope_theta: float = 100.0
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @staticmethod
    def dinov3_7b() -> "DINOv3Config":
        return DINOv3Config()

    @staticmethod
    def tiny(**over) -> "DINOv3Config":
        base = dict(hidden_size=32, intermediate_size=64, num_layers=2,
                    num_heads=4, image_size=32, patch_size=16)
        base.update(over)
        return DINOv3Config(**base)


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    y = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        xf.var(-1, keepdims=True) + eps)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def _dense(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def dinov3_rope_tables(nh: int, nw: int, cfg: DINOv3Config):
    """(P, head_dim) cos/sin over normalized patch-center coords
    (modeling_dinov3_vit.get_patches_center_coordinates + Rope forward;
    half-split rotate layout via tile(2))."""
    ch = (np.arange(0.5, nh, dtype=np.float64) / nh)
    cw = (np.arange(0.5, nw, dtype=np.float64) / nw)
    coords = np.stack(np.meshgrid(ch, cw, indexing="ij"), -1).reshape(-1, 2)
    coords = 2.0 * coords - 1.0
    inv = 1.0 / cfg.rope_theta ** np.arange(0, 1, 4 / cfg.head_dim,
                                            dtype=np.float64)
    ang = 2 * math.pi * coords[:, :, None] * inv[None, None, :]
    ang = np.tile(ang.reshape(-1, ang.shape[1] * ang.shape[2]), (1, 2))
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _rope_half(x, cos, sin):
    h = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)
    return x * cos + rot * sin


def dinov3_forward(params, cfg: DINOv3Config, images):
    """images (B, 3, H, W) ImageNet-normalized -> (pooled (B, D),
    tokens (B, 1+R+P, D))."""
    b = images.shape[0]
    p = cfg.patch_size
    x = jnp.transpose(images, (0, 2, 3, 1))
    B, H, W, C = x.shape
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, (H // p) * (W // p),
                                              C * p * p)
    x = _dense(params["patch_embed"], x)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, cfg.hidden_size))
    reg = jnp.broadcast_to(params["register_tokens"].astype(x.dtype),
                           (b, cfg.num_register_tokens, cfg.hidden_size))
    x = jnp.concatenate([cls, reg, x], axis=1)

    cos, sin = dinov3_rope_tables(H // p, W // p, cfg)
    cos = jnp.asarray(cos)[None, :, None, :].transpose(0, 2, 1, 3)
    sin = jnp.asarray(sin)[None, :, None, :].transpose(0, 2, 1, 3)
    n_pre = 1 + cfg.num_register_tokens
    nh, hd = cfg.num_heads, cfg.head_dim

    def body(x, blk):
        h = _ln(blk["ln1"], x, cfg.eps)
        B_, L, _ = h.shape
        q = _dense(blk["q"], h).reshape(B_, L, nh, hd).transpose(0, 2, 1, 3)
        k = _dense(blk["k"], h).reshape(B_, L, nh, hd).transpose(0, 2, 1, 3)
        v = _dense(blk["v"], h).reshape(B_, L, nh, hd).transpose(0, 2, 1, 3)
        # rope on PATCH tokens only (cls + registers skipped)
        q = jnp.concatenate(
            [q[:, :, :n_pre], _rope_half(q[:, :, n_pre:], cos, sin)], axis=2)
        k = jnp.concatenate(
            [k[:, :, :n_pre], _rope_half(k[:, :, n_pre:], cos, sin)], axis=2)
        logits = jnp.einsum("bnqd,bnkd->bnqk", q, k).astype(jnp.float32) \
            * (hd ** -0.5)
        o = jnp.einsum("bnqk,bnkd->bnqd",
                       jax.nn.softmax(logits, -1).astype(v.dtype), v)
        o = o.transpose(0, 2, 1, 3).reshape(B_, L, nh * hd)
        x = x + _dense(blk["o"], o) * blk["ls1"].astype(x.dtype)
        h = _ln(blk["ln2"], x, cfg.eps)
        ff = _dense(blk["down"], jax.nn.silu(_dense(blk["gate"], h))
                    * _dense(blk["up"], h))
        return x + ff * blk["ls2"].astype(x.dtype), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    tokens = _ln(params["norm"], x, cfg.eps)
    return tokens[:, 0], tokens


def preprocess_dinov3(image, cfg: DINOv3Config):
    """PIL -> (1, 3, S, S) ImageNet-normalized (the reference wrapper's
    DINOv3ViTImageProcessorFast settings)."""
    s = cfg.image_size
    arr = np.asarray(image.convert("RGB").resize((s, s)), np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return np.transpose(arr, (2, 0, 1))[None]


def convert_dinov3_state_dict(sd: Dict[str, Any], cfg: DINOv3Config = None,
                              dtype=None):
    import numpy as _np

    if cfg is None:
        pw0 = sd["embeddings.patch_embeddings.weight"]
        cfg = DINOv3Config(
            hidden_size=pw0.shape[0],
            intermediate_size=sd["layer.0.mlp.up_proj.weight"].shape[0],
            num_layers=1 + max(int(k.split(".")[1]) for k in sd
                               if k.startswith("layer.")),
            num_register_tokens=sd["embeddings.register_tokens"].shape[1],
            patch_size=pw0.shape[-1])

    def lin(name):
        p = {"w": _np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = _np.asarray(sd[name + ".bias"])
        return p

    def ln(name):
        return {"w": _np.asarray(sd[name + ".weight"]),
                "b": _np.asarray(sd[name + ".bias"])}

    def block(i):
        pre = f"layer.{i}"
        return {
            "ln1": ln(pre + ".norm1"),
            "q": lin(pre + ".attention.q_proj"),
            "k": lin(pre + ".attention.k_proj"),
            "v": lin(pre + ".attention.v_proj"),
            "o": lin(pre + ".attention.o_proj"),
            "ls1": _np.asarray(sd[pre + ".layer_scale1.lambda1"]),
            "ln2": ln(pre + ".norm2"),
            "gate": lin(pre + ".mlp.gate_proj"),
            "up": lin(pre + ".mlp.up_proj"),
            "down": lin(pre + ".mlp.down_proj"),
            "ls2": _np.asarray(sd[pre + ".layer_scale2.lambda1"]),
        }

    pw = _np.asarray(sd["embeddings.patch_embeddings.weight"])
    params = {
        "patch_embed": {"w": pw.reshape(pw.shape[0], -1).T,
                        "b": _np.asarray(sd["embeddings.patch_embeddings"
                                            ".bias"])},
        "cls_token": _np.asarray(sd["embeddings.cls_token"])[0],
        "register_tokens": _np.asarray(sd["embeddings.register_tokens"])[0],
        "blocks": jax.tree.map(lambda *xs: _np.stack(xs),
                               *[block(i) for i in range(cfg.num_layers)]),
        "norm": ln("norm"),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params), cfg
