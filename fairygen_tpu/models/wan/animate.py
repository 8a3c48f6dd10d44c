"""WanAnimateAdapter — pose/face animate adapter (Wan2.2-Animate).

Port of ``animation/diffsynth/models/wan_video_animate_adapter.py``:

  * pose branch: Conv3d patch embedding added to the DiT's patchified
    latents for frames 1.. (after_patch_embedding, :617-637);
  * face branch: a StyleGAN-style appearance/motion encoder (equalized
    convs, [1,3,3,1] blur antialiasing, QR-orthonormalized direction basis,
    :314-609) -> per-frame motion vectors -> causal-conv FaceEncoder
    (:67-115) -> FaceBlock cross-attention residuals every 5th DiT block
    (:235-313, :639-645).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class AnimateConfig:
    hidden_dim: int = 5120
    heads_num: int = 40
    num_adapter_layers: int = 8  # 40 // 5
    adapter_stride: int = 5
    face_in_dim: int = 512
    face_heads: int = 4
    face_inner: int = 1024  # FaceEncoder hardcoded channel width (:74-81)
    motion_size: int = 512
    style_dim: int = 512
    motion_dim: int = 20
    pose_in_dim: int = 16
    patch_size: Tuple[int, int, int] = (1, 2, 2)


# --------------------------------------------------- equalized StyleGAN ops
def _equal_conv2d(p, x, stride=1, padding=0):
    """EqualConv2d (:396-419): weight · 1/sqrt(fan_in)."""
    w = p["w"]  # HWIO
    scale = 1.0 / math.sqrt(w.shape[0] * w.shape[1] * w.shape[2])
    y = lax.conv_general_dilated(
        x, (w * scale).astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _equal_linear(p, x, lr_mul=1.0):
    """EqualLinear (:422-448)."""
    w = p["w"]  # (in, out)
    scale = (1.0 / math.sqrt(w.shape[0])) * lr_mul
    y = jnp.dot(x, (w * scale).astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + (p["b"] * lr_mul).astype(x.dtype)
    return y


def _fused_leaky_relu(x, bias, negative_slope=0.2, scale=2**0.5):
    y = x + bias.astype(x.dtype)
    return jnp.where(y >= 0, y, negative_slope * y) * scale


def _blur(x, kernel_1d=(1, 3, 3, 1), pad=(0, 0)):
    """Blur (:369-384): depthwise conv with the normalized outer-product
    kernel (symmetric, so correlation == convolution)."""
    k = np.asarray(kernel_1d, np.float32)
    k2 = np.outer(k, k)
    k2 = k2 / k2.sum()
    c = x.shape[-1]
    w = jnp.asarray(np.tile(k2[:, :, None, None], (1, 1, 1, c)), x.dtype)
    return lax.conv_general_dilated(
        x, w, (1, 1), ((pad[0], pad[1]), (pad[0], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _conv_layer(p, x, kernel_size, downsample=False, activate=True, bias=True):
    """ConvLayer (:450-487)."""
    if downsample:
        factor, blur_len = 2, 4
        pp = (blur_len - factor) + (kernel_size - 1)
        x = _blur(x, pad=((pp + 1) // 2, pp // 2))
        x = _equal_conv2d(p["conv"], x, stride=2, padding=0)
    else:
        x = _equal_conv2d(p["conv"], x, stride=1, padding=kernel_size // 2)
    if activate:
        x = _fused_leaky_relu(x, p["act_bias"])
    return x


def _res_block(p, x):
    """ResBlock (:489-506)."""
    out = _conv_layer(p["conv1"], x, 3)
    out = _conv_layer(p["conv2"], out, 3, downsample=True)
    skip = _conv_layer(p["skip"], x, 1, downsample=True, activate=False, bias=False)
    return (out + skip) / math.sqrt(2)


def encoder_app_forward(p, x):
    """EncoderApp (:509-545): image (B, 3, S, S) -> appearance code (B, 512)."""
    h = jnp.transpose(x, (0, 2, 3, 1))
    h = _conv_layer(p["convs"][0], h, 1)
    for blk in p["res_blocks"]:
        h = _res_block(blk, h)
    h = _equal_conv2d(p["final"], h, stride=1, padding=0)
    return h[:, 0, 0, :]


def get_motion(params, x):
    """Generator.get_motion (:595-609): appearance -> 20-dim motion coords ->
    projection onto the QR-orthonormalized direction basis."""
    h = encoder_app_forward(params["net_app"], x)
    for fc in params["fc"]:
        h = _equal_linear(fc, h)
    q, _ = jnp.linalg.qr(params["direction_weight"].astype(jnp.float32) + 1e-8)
    return jnp.dot(h.astype(jnp.float32), q.T).astype(x.dtype)


# ---------------------------------------------------------------- face path
def _causal_conv1d(p, x, stride=1):
    k = p["w"].shape[0]
    front = jnp.repeat(x[:, :1], k - 1, axis=1)
    x = jnp.concatenate([front, x], axis=1)
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), ((0, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["b"].astype(x.dtype)


def face_encoder_forward(p, cfg: AnimateConfig, x):
    """FaceEncoder (:67-115): (B, T, 512) motion vecs -> (B, T', heads+1, D)."""
    b = x.shape[0]

    def tail(y):
        y = layer_norm(y, 1e-6)
        return jax.nn.silu(y.astype(jnp.float32)).astype(y.dtype)

    y = _causal_conv1d(p["conv1_local"], x)  # (B, T, 1024·n)
    t = y.shape[1]
    y = y.reshape(b, t, cfg.face_heads, cfg.face_inner)
    y = y.transpose(0, 2, 1, 3).reshape(b * cfg.face_heads, t, cfg.face_inner)
    y = tail(y)
    y = tail(_causal_conv1d(p["conv2"], y, stride=2))
    y = tail(_causal_conv1d(p["conv3"], y, stride=2))
    y = jnp.dot(y, p["out_proj"]["w"].astype(y.dtype)) + p["out_proj"]["b"].astype(y.dtype)
    tl = y.shape[1]
    y = y.reshape(b, cfg.face_heads, tl, -1).transpose(0, 2, 1, 3)
    pad = jnp.broadcast_to(p["padding_tokens"].astype(y.dtype), (b, tl, 1, y.shape[-1]))
    return jnp.concatenate([y, pad], axis=-2)


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = xf * lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
    return (y.astype(x.dtype)) * w.astype(x.dtype)


def face_block_forward(p, cfg: AnimateConfig, x, motion_vec, motion_mask=None):
    """FaceBlock (:235-313): per-frame cross attention DiT-tokens -> motion
    tokens; returns the residual."""
    B, T, N, C = motion_vec.shape
    H = cfg.heads_num
    hd = C // H
    xm = layer_norm(motion_vec, 1e-6)
    xf = layer_norm(x, 1e-6)
    kv = jnp.dot(xm, p["linear1_kv"]["w"].astype(xm.dtype)) + p["linear1_kv"]["b"].astype(xm.dtype)
    q = jnp.dot(xf, p["linear1_q"]["w"].astype(xf.dtype)) + p["linear1_q"]["b"].astype(xf.dtype)
    kv = kv.reshape(B, T, N, 2, H, hd)
    k, v = kv[..., 0, :, :], kv[..., 1, :, :]  # (B, T, N, H, hd)
    S = q.shape[1]
    q = q.reshape(B, S, H, hd)
    q = _rms(q, p["q_norm"])
    k = _rms(k, p["k_norm"])
    # group DiT tokens per frame: (B, T, S/T, H, hd)
    q = q.reshape(B, T, S // T, H, hd).reshape(B * T, S // T, H, hd)
    k = k.reshape(B * T, N, H, hd)
    v = v.reshape(B * T, N, H, hd)
    logits = jnp.einsum("bsnd,btnd->bnst", q, k).astype(jnp.float32) * (hd**-0.5)
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    o = jnp.einsum("bnst,btnd->bsnd", probs, v).reshape(B, S, H * hd)
    out = jnp.dot(o, p["linear2"]["w"].astype(o.dtype)) + p["linear2"]["b"].astype(o.dtype)
    if motion_mask is not None:
        out = out * motion_mask.reshape(B, -1)[..., None].astype(out.dtype)
    return out


# ------------------------------------------------------------- adapter API
def animate_after_patch_embedding(params, cfg: AnimateConfig, x, pose_latents,
                                  face_pixel_values):
    """after_patch_embedding (:617-637). x (B, D, F, H, W) patch-embedded
    features (conv output, before flatten); returns (x, motion_vec)."""
    # pose branch: conv3d patch embed as matmul
    B, C, T, H, W = pose_latents.shape
    pt, ph, pw = cfg.patch_size
    v = pose_latents.reshape(B, C, T // pt, pt, H // ph, ph, W // pw, pw)
    v = v.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
        B, (T // pt) * (H // ph) * (W // pw), C * pt * ph * pw
    )
    pe = jnp.dot(v, params["pose_patch_embedding"]["w"].astype(v.dtype)) + \
        params["pose_patch_embedding"]["b"].astype(v.dtype)
    pe = pe.reshape(B, T // pt, H // ph, W // pw, -1).transpose(0, 4, 1, 2, 3)
    x = x.at[:, :, 1:].add(pe.astype(x.dtype))

    # face branch
    b, c, Tf, hh, ww = face_pixel_values.shape
    faces = face_pixel_values.transpose(0, 2, 1, 3, 4).reshape(b * Tf, c, hh, ww)
    motion_feat = get_motion(params["motion_encoder"], faces)
    motion_feat = motion_feat.reshape(b, Tf, -1)
    motion_vec = face_encoder_forward(params["face_encoder"], cfg, motion_feat)
    Bv, L, Hn, Cv = motion_vec.shape
    pad = jnp.zeros((Bv, 1, Hn, Cv), motion_vec.dtype)
    return x, jnp.concatenate([pad, motion_vec], axis=1)


def animate_after_transformer_block(params, cfg: AnimateConfig, block_idx, x,
                                    motion_vec, motion_masks=None):
    """after_transformer_block (:639-645): residual every adapter_stride."""
    if block_idx % cfg.adapter_stride != 0:
        return x
    p = params["face_adapter"][block_idx // cfg.adapter_stride]
    return x + face_block_forward(p, cfg, x, motion_vec, motion_masks)


# ------------------------------------------------------------------ converter
def convert_animate_state_dict(sd: Dict[str, np.ndarray], cfg: AnimateConfig,
                               dtype=None):
    def g(name):
        return np.asarray(sd[name])

    def lw(name):
        p = {"w": g(name + ".weight").T}
        if name + ".bias" in sd:
            p["b"] = g(name + ".bias")
        return p

    def cw2(name):  # conv2d OIHW -> HWIO
        p = {"w": g(name + ".weight").transpose(2, 3, 1, 0)}
        if name + ".bias" in sd:
            p["b"] = g(name + ".bias")
        return p

    def conv1d(name):
        return {"w": g(name + ".weight").transpose(2, 1, 0), "b": g(name + ".bias")}

    def conv_layer(prefix, downsample, activate=True, bias=True):
        # nn.Sequential: [Blur]? EqualConv2d, [FusedLeakyReLU]
        idx = 1 if downsample else 0
        p = {"conv": {"w": g(f"{prefix}.{idx}.weight").transpose(2, 3, 1, 0)}}
        if f"{prefix}.{idx}.bias" in sd:
            p["conv"]["b"] = g(f"{prefix}.{idx}.bias")
        if activate:
            p["act_bias"] = g(f"{prefix}.{idx + 1}.bias").reshape(-1)
        return p

    # motion encoder (Generator)
    me = "motion_encoder.enc.net_app"
    res_blocks = []
    i = 1
    while f"{me}.convs.{i}.conv1.0.weight" in sd:
        res_blocks.append({
            "conv1": conv_layer(f"{me}.convs.{i}.conv1", False),
            "conv2": conv_layer(f"{me}.convs.{i}.conv2", True),
            "skip": conv_layer(f"{me}.convs.{i}.skip", True, activate=False, bias=False),
        })
        i += 1
    net_app = {
        "convs": [conv_layer(f"{me}.convs.0", False)],
        "res_blocks": res_blocks,
        "final": {"w": g(f"{me}.convs.{i}.weight").transpose(2, 3, 1, 0)},
    }
    fc = []
    j = 0
    while f"motion_encoder.enc.fc.{j}.weight" in sd:
        fc.append({"w": g(f"motion_encoder.enc.fc.{j}.weight").T,
                   "b": g(f"motion_encoder.enc.fc.{j}.bias")})
        j += 1
    motion_encoder = {
        "net_app": net_app,
        "fc": fc,
        "direction_weight": g("motion_encoder.dec.direction.weight"),
    }

    face_encoder = {
        "conv1_local": conv1d("face_encoder.conv1_local.conv"),
        "conv2": conv1d("face_encoder.conv2.conv"),
        "conv3": conv1d("face_encoder.conv3.conv"),
        "out_proj": lw("face_encoder.out_proj"),
        "padding_tokens": g("face_encoder.padding_tokens"),
    }

    blocks = []
    k = 0
    while f"face_adapter.fuser_blocks.{k}.linear1_q.weight" in sd:
        pre = f"face_adapter.fuser_blocks.{k}"
        blocks.append({
            "linear1_kv": lw(pre + ".linear1_kv"),
            "linear1_q": lw(pre + ".linear1_q"),
            "linear2": lw(pre + ".linear2"),
            "q_norm": g(pre + ".q_norm.weight"),
            "k_norm": g(pre + ".k_norm.weight"),
        })
        k += 1

    pe = g("pose_patch_embedding.weight")  # (D, C, pt, ph, pw)
    params = {
        "pose_patch_embedding": {
            "w": pe.transpose(1, 2, 3, 4, 0).reshape(-1, pe.shape[0]),
            "b": g("pose_patch_embedding.bias"),
        },
        "motion_encoder": motion_encoder,
        "face_encoder": face_encoder,
        "face_adapter": blocks,
    }
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
    return jax.tree.map(cast, params)
