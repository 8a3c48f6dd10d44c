"""Depth-Anything (DINOv2 backbone + DPT neck/head) — native depth annotator.

The reference's ControlNet ``Annotator(processor_id="depth")`` shells out to
``controlnet_aux`` (reference ``utils/controlnet/annotator.py:24-36``); this
is a TPU-native port of the same model family (transformers'
``DepthAnythingForDepthEstimation``) so depth maps can be produced in-repo:

  * DINOv2 ViT backbone: 14px patch embed, cls token, learned position
    embeddings (bicubic a=-0.75 interpolation off the native grid —
    torch ``F.interpolate(mode="bicubic", align_corners=False)`` exactly),
    pre-norm blocks with LayerScale, per-feature final layernorm.
  * DPT neck: reassemble (1x1 projection + {conv-transpose, identity,
    stride-2 conv} resize), 3x3 fusion convs, top-down feature fusion with
    pre-activation residual units and align_corners=True bilinear.
  * Head: conv -> bilinear(align_corners=True) to patch resolution ->
    conv -> relu -> 1x1 -> relu (relative depth).

Golden-tested against transformers' torch implementation
(tools/gen_goldens_depth_anything.py, tests/test_depth_anything.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_dim: int = 1536
    patch_size: int = 14
    image_size: int = 518  # native pos-emb grid = image_size // patch_size
    out_indices: Tuple[int, ...] = (9, 10, 11, 12)
    neck_hidden_sizes: Tuple[int, ...] = (48, 96, 192, 384)
    reassemble_factors: Tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)
    fusion_hidden_size: int = 64
    head_hidden_size: int = 32
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @staticmethod
    def small() -> "DepthAnythingConfig":
        """depth-anything-small (ViT-S backbone) — the annotator default."""
        return DepthAnythingConfig()

    @staticmethod
    def tiny(**over) -> "DepthAnythingConfig":
        base = dict(hidden_size=32, num_layers=4, num_heads=2, mlp_dim=64,
                    patch_size=14, image_size=56, out_indices=(1, 2, 3, 4),
                    neck_hidden_sizes=(8, 8, 16, 16),
                    reassemble_factors=(4.0, 2.0, 1.0, 0.5),
                    fusion_hidden_size=16, head_hidden_size=8)
        base.update(over)
        return DepthAnythingConfig(**base)


# ------------------------------------------------------------ interpolation
def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """Keys cubic kernel weights for the 4 taps around fractional coord t
    (torch's bicubic uses a = -0.75)."""
    # distances of the 4 taps (floor-1 .. floor+2) from the sample point
    d0, d1, d2, d3 = 1.0 + t, t, 1.0 - t, 2.0 - t

    def near(x):  # |x| <= 1
        return (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0

    def far(x):  # 1 < |x| < 2
        return a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a

    return far(d0), near(d1), near(d2), far(d3)


def _resize_1d(x, out_size: int, axis: int, mode: str, align_corners: bool):
    """Separable 1D resize along ``axis``: 'linear' or 'cubic' (a=-0.75),
    torch半-pixel (align_corners=False) or endpoint (True) sampling, with
    edge-clamped taps — matches torch.nn.functional.interpolate."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    xf = jnp.moveaxis(x, axis, 0).astype(jnp.float32)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = jnp.arange(out_size, dtype=jnp.float32) * scale
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    i0 = jnp.floor(src)
    t = src - i0
    base = i0.astype(jnp.int32)

    def tap(off):
        return jnp.clip(base + off, 0, in_size - 1)

    if mode == "linear":
        lo, hi = xf[tap(0)], xf[tap(1)]
        w = t.reshape((-1,) + (1,) * (xf.ndim - 1))
        out = lo * (1.0 - w) + hi * w
    else:
        ws = _cubic_weights(t)
        out = 0.0
        for off, w in zip((-1, 0, 1, 2), ws):
            out = out + xf[tap(off)] * w.reshape((-1,) + (1,) * (xf.ndim - 1))
    return jnp.moveaxis(out, 0, axis).astype(x.dtype)


def bilinear_resize(x, out_h: int, out_w: int, align_corners: bool):
    """(B, H, W, C) bilinear, torch semantics."""
    x = _resize_1d(x, out_h, 1, "linear", align_corners)
    return _resize_1d(x, out_w, 2, "linear", align_corners)


def bicubic_resize(x, out_h: int, out_w: int, align_corners: bool = False):
    """(B, H, W, C) bicubic a=-0.75, torch semantics."""
    x = _resize_1d(x, out_h, 1, "cubic", align_corners)
    return _resize_1d(x, out_w, 2, "cubic", align_corners)


# ---------------------------------------------------------------- primitives
def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["w"] + p["b"]).astype(x.dtype)


def _dense(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _conv(p, x, strides=(1, 1), padding=((1, 1), (1, 1))):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["b"].astype(x.dtype) if "b" in p else y


def _conv_transpose(p, x, factor: int):
    """ConvTranspose2d(k=s=factor, pad 0) — exact upsample used by the DPT
    reassemble stage."""
    y = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=(factor, factor), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)
    return y + p["b"].astype(x.dtype) if "b" in p else y


# ------------------------------------------------------------------ backbone
def _attention(p, x, num_heads, head_dim):
    b, s, d = x.shape
    q = _dense(p["q"], x).reshape(b, s, num_heads, head_dim)
    k = _dense(p["k"], x).reshape(b, s, num_heads, head_dim)
    v = _dense(p["v"], x).reshape(b, s, num_heads, head_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
    probs = jax.nn.softmax(logits * (head_dim ** -0.5), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
    return _dense(p["o"], o)


def _block(p, x, cfg: DepthAnythingConfig):
    y = _attention(p["attn"], _ln(p["norm1"], x, cfg.layer_norm_eps),
                   cfg.num_heads, cfg.head_dim)
    x = x + y * p["ls1"]
    h = _dense(p["fc1"], _ln(p["norm2"], x, cfg.layer_norm_eps))
    h = _dense(p["fc2"], jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype))
    return x + h * p["ls2"]


def _interp_pos_embed(pos, ph, pw, native):
    """Dinov2.interpolate_pos_encoding: bicubic (a=-0.75, align_corners
    False) from the native (n, n) grid to (ph, pw); cls row passes through."""
    if (ph, pw) == (native, native):
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    d = patch_pos.shape[-1]
    grid = patch_pos.reshape(1, native, native, d)
    grid = bicubic_resize(grid, ph, pw, align_corners=False)
    return jnp.concatenate([cls_pos, grid.reshape(1, ph * pw, d)], axis=1)


def dinov2_features(p, cfg: DepthAnythingConfig, pixels):
    """pixels (B, H, W, 3) normalized -> list of (B, 1+ph·pw, D) features at
    cfg.out_indices (1-indexed layer outputs), each final-layernormed
    (Dinov2Backbone with apply_layernorm=True)."""
    b, h, w, _ = pixels.shape
    ps = cfg.patch_size
    ph, pw = h // ps, w // ps
    patches = pixels.reshape(b, ph, ps, pw, ps, 3)
    patches = patches.transpose(0, 1, 3, 5, 2, 4).reshape(b, ph * pw, 3 * ps * ps)
    tok = patches @ p["patch_embed"]["w"] + p["patch_embed"]["b"]
    cls = jnp.broadcast_to(p["cls_token"], (b, 1, cfg.hidden_size))
    tok = jnp.concatenate([cls.astype(tok.dtype), tok], axis=1)
    native = cfg.image_size // ps
    tok = tok + _interp_pos_embed(p["pos_embed"], ph, pw, native).astype(tok.dtype)

    feats = []
    for i, blk in enumerate(p["blocks"]):
        tok = _block(blk, tok, cfg)
        if (i + 1) in cfg.out_indices:
            feats.append(_ln(p["norm"], tok, cfg.layer_norm_eps))
    return feats, (ph, pw)


# ---------------------------------------------------------------- neck/head
def _reassemble(p, feat, factor: float, ph: int, pw: int):
    b, _, d = feat.shape
    x = feat[:, 1:].reshape(b, ph, pw, d)  # drop cls
    x = _conv(p["projection"], x, padding=((0, 0), (0, 0)))
    if factor > 1:
        x = _conv_transpose(p["resize"], x, int(factor))
    elif factor < 1:
        s = int(round(1.0 / factor))
        x = _conv(p["resize"], x, strides=(s, s))
    return x


def _pre_act_residual(p, x):
    h = jax.nn.relu(x)
    h = _conv(p["conv1"], h)
    h = jax.nn.relu(h)
    h = _conv(p["conv2"], h)
    return h + x


def _fusion_layer(p, x, residual, size):
    if residual is not None:
        if residual.shape[1:3] != x.shape[1:3]:
            residual = bilinear_resize(residual, x.shape[1], x.shape[2],
                                       align_corners=False)
        x = x + _pre_act_residual(p["res1"], residual)
    x = _pre_act_residual(p["res2"], x)
    out_h, out_w = size if size is not None else (2 * x.shape[1], 2 * x.shape[2])
    x = bilinear_resize(x, out_h, out_w, align_corners=True)
    return _conv(p["projection"], x, padding=((0, 0), (0, 0)))


def depth_anything_forward(params, cfg: DepthAnythingConfig, pixels):
    """pixels (B, H, W, 3) ImageNet-normalized, H/W multiples of patch_size
    -> relative depth (B, H, W) fp32 (unnormalized, larger = closer)."""
    feats, (ph, pw) = dinov2_features(params["backbone"], cfg, pixels)
    stages = [
        _conv(pc, _reassemble(pr, f, fac, ph, pw), padding=((1, 1), (1, 1)))
        for pr, pc, f, fac in zip(params["reassemble"], params["convs"],
                                  feats, cfg.reassemble_factors)
    ]
    # top-down fusion, deepest first; each layer resizes to the next
    # (shallower) stage's spatial dims, the last by scale-factor 2
    rev = stages[::-1]
    fused = None
    for idx, (stage, pf) in enumerate(zip(rev, params["fusion"])):
        size = rev[idx + 1].shape[1:3] if idx != len(rev) - 1 else None
        fused = _fusion_layer(pf, stage if fused is None else fused,
                              None if idx == 0 else stage, size)

    h = _conv(params["head"]["conv1"], fused)
    h = bilinear_resize(h, ph * cfg.patch_size, pw * cfg.patch_size,
                        align_corners=True)
    h = jax.nn.relu(_conv(params["head"]["conv2"], h))
    h = jax.nn.relu(_conv(params["head"]["conv3"], h, padding=((0, 0), (0, 0))))
    return h[..., 0].astype(jnp.float32)


# ----------------------------------------------------------------- converter
def convert_depth_anything_state_dict(sd: Dict[str, Any],
                                      cfg: DepthAnythingConfig = None):
    """transformers DepthAnythingForDepthEstimation state dict -> params."""
    cfg = cfg or DepthAnythingConfig.small()

    def t(name):
        v = sd[name]
        return jnp.asarray(np.asarray(v, dtype=np.float32))

    def lin(name):
        return {"w": t(name + ".weight").T, "b": t(name + ".bias")}

    def ln(name):
        return {"w": t(name + ".weight"), "b": t(name + ".bias")}

    def conv(name, bias=True):
        p = {"w": t(name + ".weight").transpose(2, 3, 1, 0)}  # OIHW->HWIO
        if bias:
            p["b"] = t(name + ".bias")
        return p

    def conv_t(name):
        # torch ConvTranspose2d weight is (in, out, H, W) -> HWIO
        return {"w": t(name + ".weight").transpose(2, 3, 0, 1),
                "b": t(name + ".bias")}

    bb = "backbone."
    pe = t(bb + "embeddings.patch_embeddings.projection.weight")  # (D,3,14,14)
    backbone = {
        "cls_token": t(bb + "embeddings.cls_token"),
        "pos_embed": t(bb + "embeddings.position_embeddings"),
        "patch_embed": {
            "w": pe.reshape(cfg.hidden_size, -1).T,  # flat (3,14,14) order
            "b": t(bb + "embeddings.patch_embeddings.projection.bias"),
        },
        "norm": ln(bb + "layernorm"),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        pre = f"{bb}encoder.layer.{i}"
        backbone["blocks"].append({
            "norm1": ln(pre + ".norm1"),
            "attn": {
                "q": lin(pre + ".attention.attention.query"),
                "k": lin(pre + ".attention.attention.key"),
                "v": lin(pre + ".attention.attention.value"),
                "o": lin(pre + ".attention.output.dense"),
            },
            "ls1": t(pre + ".layer_scale1.lambda1"),
            "norm2": ln(pre + ".norm2"),
            "fc1": lin(pre + ".mlp.fc1"),
            "fc2": lin(pre + ".mlp.fc2"),
            "ls2": t(pre + ".layer_scale2.lambda1"),
        })

    reassemble = []
    for i, fac in enumerate(cfg.reassemble_factors):
        pre = f"neck.reassemble_stage.layers.{i}"
        p = {"projection": conv(pre + ".projection")}
        if fac != 1:
            p["resize"] = (conv_t(pre + ".resize") if fac > 1
                           else conv(pre + ".resize"))
        reassemble.append(p)

    fusion = []
    for i in range(len(cfg.neck_hidden_sizes)):
        pre = f"neck.fusion_stage.layers.{i}"
        fusion.append({
            "projection": conv(pre + ".projection"),
            "res1": {"conv1": conv(pre + ".residual_layer1.convolution1"),
                     "conv2": conv(pre + ".residual_layer1.convolution2")},
            "res2": {"conv1": conv(pre + ".residual_layer2.convolution1"),
                     "conv2": conv(pre + ".residual_layer2.convolution2")},
        })

    return {
        "backbone": backbone,
        "reassemble": reassemble,
        "convs": [conv(f"neck.convs.{i}", bias=False)
                  for i in range(len(cfg.neck_hidden_sizes))],
        "fusion": fusion,
        "head": {"conv1": conv("head.conv1"), "conv2": conv("head.conv2"),
                 "conv3": conv("head.conv3")},
    }


# --------------------------------------------------------------- preprocess
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_depth_anything(image: np.ndarray, cfg: DepthAnythingConfig,
                              target: int = None) -> np.ndarray:
    """uint8 (H, W, 3) -> (1, H', W', 3) fp32: resize so the short side is
    ~``target`` (default cfg.image_size) with both sides multiples of
    patch_size, then ImageNet-normalize (DPT keep-aspect protocol)."""
    from PIL import Image

    target = target or cfg.image_size
    h, w = image.shape[:2]
    k = target / min(h, w)
    ps = cfg.patch_size
    h2 = max(ps, int(round(h * k / ps)) * ps)
    w2 = max(ps, int(round(w * k / ps)) * ps)
    arr = np.asarray(
        Image.fromarray(image).resize((w2, h2), Image.BICUBIC), np.float32)
    arr = (arr / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
    return arr[None]


def depth_to_image(depth: np.ndarray) -> np.ndarray:
    """Relative depth map -> uint8 (H, W, 3) annotator image (min-max
    normalized, controlnet_aux convention: near = bright)."""
    d = np.asarray(depth, np.float32)
    lo, hi = float(d.min()), float(d.max())
    scaled = (d - lo) / (hi - lo) if hi > lo else np.zeros_like(d)
    g = (scaled * 255.0).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=2)
