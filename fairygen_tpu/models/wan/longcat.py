"""LongCat-Video DiT — functional JAX port.

Mirrors the reference ``LongCatVideoTransformer3DModel``
(``animation/diffsynth/models/longcat_video_dit.py``; driver
``model_fn_longcat_video``, ``pipelines/wan_video.py:1391-1418``): a
48-block single-stream video DiT at hidden 4096 / 32 heads with

  - PER-FRAME timestep conditioning: ``t`` expands to (B, T) with the
    conditioning frames zeroed (``num_cond_latents``), and every AdaLN
    modulation (6-way in blocks, 2-way in the final layer) is per-frame;
  - 3D rotary embeddings with the unusual split
    ``dim_t = hd - 4*(hd//6), dim_h = dim_w = 2*(hd//6)`` and
    interleaved-pair rotation (repeat-(n r) frequency duplication);
  - cond-mode attention: conditioning-frame queries attend ONLY the
    conditioning tokens while noise-frame queries attend everything, and
    conditioning frames SKIP cross-attention (their residual is zero);
  - fp32 norms/modulation (LayerNorm_FP32 / RMSNorm_FP32 semantics),
    Llama-style SwiGLU FFN (2/3 ratio rounded to 256);
  - the driver overwrites the conditioning frames into the latents and
    NEGATES the output (wan_video.py:1401-1418).

All modulation/norm math runs in fp32 like the reference's autocast
blocks; the caller receives fp32 output.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.norms import rms_norm
from ...ops.rope import apply_interleaved_rope


@dataclasses.dataclass(frozen=True)
class LongCatDiTConfig:
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 4096
    depth: int = 48
    num_heads: int = 32
    caption_channels: int = 4096
    mlp_ratio: int = 4
    adaln_tembed_dim: int = 512
    freq_dim: int = 256
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    eps: float = 1e-6

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def ffn_hidden(self):
        h = int(2 * (self.hidden_size * self.mlp_ratio) / 3)
        return 256 * ((h + 255) // 256)

    @staticmethod
    def longcat() -> "LongCatDiTConfig":
        return LongCatDiTConfig()

    @staticmethod
    def tiny(**over) -> "LongCatDiTConfig":
        base = dict(in_channels=4, out_channels=4, hidden_size=96,
                    depth=2, num_heads=4, caption_channels=48,
                    adaln_tembed_dim=64, freq_dim=32)
        base.update(over)
        return LongCatDiTConfig(**base)


def _dense(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _ln_fp32(x, eps=1e-6, w=None, b=None):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        y = y * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y


def longcat_rope_tables(grid: Tuple[int, int, int], head_dim: int,
                        theta: float = 10000.0):
    """(L, head_dim/2) cos/sin per-pair tables; the reference duplicates
    frequencies "(n r)" r=2 and rotates interleaved pairs
    (longcat_video_dit.py:82-111,46-52) == apply_interleaved_rope."""
    t, h, w = grid
    dim_t = head_dim - 4 * (head_dim // 6)
    dim_h = dim_w = 2 * (head_dim // 6)

    def axis(n, d):
        freqs = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64)[: d // 2]
                                / d)
        return np.einsum("n,f->nf", np.arange(n, dtype=np.float64), freqs)

    ft = np.broadcast_to(axis(t, dim_t)[:, None, None, :],
                         (t, h, w, dim_t // 2))
    fh = np.broadcast_to(axis(h, dim_h)[None, :, None, :],
                         (t, h, w, dim_h // 2))
    fw = np.broadcast_to(axis(w, dim_w)[None, None, :, :],
                         (t, h, w, dim_w // 2))
    ang = np.concatenate([ft, fh, fw], -1).reshape(t * h * w, -1)
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def longcat_block(p, x, ctx, t_mod6, cos, sin, cfg: LongCatDiTConfig,
                  grid, num_cond: int):
    """LongCatSingleStreamBlock (longcat_video_dit.py:525-628)."""
    b, n, c = x.shape
    T = grid[0]
    per = n // T
    nh, hd = cfg.num_heads, cfg.head_dim
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = t_mod6  # each (B, T, 1, C) fp32

    def modulate(v, shift, scale):
        vf = _ln_fp32(v.astype(jnp.float32).reshape(b, T, per, c), cfg.eps)
        return ((vf * (scale + 1) + shift).reshape(b, n, c)).astype(v.dtype)

    y = modulate(x, sh_a, sc_a)
    qkv = _dense(p["qkv"], y).reshape(b, n, 3, nh, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = rms_norm(q, p["q_norm"], cfg.eps)
    k = rms_norm(k, p["k_norm"], cfg.eps)
    q = apply_interleaved_rope(q, cos, sin)
    k = apply_interleaved_rope(k, cos, sin)
    if num_cond:
        nc = num_cond * per
        # cond queries attend cond tokens only; noise queries attend all
        o_cond = attention(q[:, :nc], k[:, :nc], v[:, :nc],
                           bounded_logits=True)
        o_noise = attention(q[:, nc:], k, v, bounded_logits=True)
        o = jnp.concatenate([o_cond, o_noise], axis=1)
    else:
        o = attention(q, k, v, bounded_logits=True)
    att = _dense(p["proj"], o.reshape(b, n, nh * hd))
    x = (x.astype(jnp.float32)
         + (g_a * att.astype(jnp.float32).reshape(b, T, per, c)).reshape(
             b, n, c)).astype(x.dtype)

    # cross attention (noise tokens only in cond mode)
    yq = _ln_fp32(x, cfg.eps, p["crs_norm"]["w"], p["crs_norm"]["b"]).astype(
        x.dtype)
    qx = _dense(p["crs_q"], yq).reshape(b, n, nh, hd)
    kvx = _dense(p["crs_kv"], ctx).reshape(b, -1, 2, nh, hd)
    kx, vx = kvx[:, :, 0], kvx[:, :, 1]
    qx = rms_norm(qx, p["crs_q_norm"], cfg.eps)
    kx = rms_norm(kx, p["crs_k_norm"], cfg.eps)
    if num_cond:
        nc = num_cond * per
        ox = attention(qx[:, nc:], kx, vx)
        # the output PROJECTION runs before the zero-fill (the reference
        # zero-pads the projected noise output, so the proj bias must NOT
        # leak into the conditioning rows — longcat_video_dit.py:311-321)
        crs = _dense(p["crs_proj"], ox.reshape(b, n - nc, nh * hd))
        crs = jnp.concatenate(
            [jnp.zeros((b, nc, c), crs.dtype), crs], axis=1)
    else:
        ox = attention(qx, kx, vx)
        crs = _dense(p["crs_proj"], ox.reshape(b, n, nh * hd))
    x = x + crs

    # SwiGLU ffn with modulation
    y = modulate(x, sh_m, sc_m)
    ff = _dense(p["w2"], jax.nn.silu(_dense(p["w1"], y)) * _dense(p["w3"], y))
    x = (x.astype(jnp.float32)
         + (g_m * ff.astype(jnp.float32).reshape(b, T, per, c)).reshape(
             b, n, c)).astype(x.dtype)
    return x


def longcat_dit_forward(
    params,
    cfg: LongCatDiTConfig,
    latents,  # (B, C, T, H, W)
    timestep,  # (B,) float
    context,  # (B, L, caption_channels) — unpadded
    num_cond_latents: int = 0,
    remat: bool = False,
):
    """Reference forward (longcat_video_dit.py:765-864) for B=1 static
    shapes.  Output is fp32; the driver negates it (wan_video.py:1417)."""
    b, c, T, H, W = latents.shape
    pt, ph, pw = cfg.patch_size
    nt, nh_, nw = T // pt, H // ph, W // pw
    d = cfg.hidden_size

    # per-frame timesteps with conditioning frames zeroed
    ts = jnp.broadcast_to(timestep[:, None], (b, nt)).astype(jnp.float32)
    if num_cond_latents:
        ts = ts * (jnp.arange(nt)[None, :] >= num_cond_latents)

    half = cfg.freq_dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = ts.reshape(-1)[:, None] * freqs[None, :]
    sinus = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], -1)
    t_emb = _dense(params["t_mlp"]["fc2"], jax.nn.silu(
        _dense(params["t_mlp"]["fc1"], sinus))).reshape(
            b, nt, cfg.adaln_tembed_dim)  # fp32

    ctx = _dense(params["y_mlp"]["fc2"], jax.nn.gelu(
        _dense(params["y_mlp"]["fc1"], context.astype(latents.dtype))))

    # patchify: Conv3d kernel==stride -> dense over patch vectors
    x = latents.reshape(b, c, nt, pt, nh_, ph, nw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
        b, nt * nh_ * nw, c * pt * ph * pw)
    x = _dense(params["x_embedder"], x)

    cos, sin = longcat_rope_tables((nt, nh_, nw), cfg.head_dim)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    def mods(p_adaln, n_chunks):
        m = _dense(p_adaln, jax.nn.silu(t_emb))  # (B, T, n*C) fp32
        return jnp.split(m[:, :, None, :], n_chunks, axis=-1)

    def body(carry, p):
        t6 = mods(p["adaln"], 6)
        return longcat_block(p, carry, ctx, t6, cos, sin, cfg,
                             (nt, nh_, nw), num_cond_latents), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["blocks"])

    # final layer: per-frame 2-way modulation (FinalLayer_FP32)
    shift, scale = mods(params["final"]["adaln"], 2)
    per = nh_ * nw
    xf = _ln_fp32(x.astype(jnp.float32).reshape(b, nt, per, d), cfg.eps)
    xf = (xf * (scale + 1) + shift).reshape(b, nt * per, d)
    out = _dense(params["final"]["linear"], xf)
    out = out.reshape(b, nt, nh_, nw, pt, ph, pw, cfg.out_channels)
    out = out.transpose(0, 7, 1, 4, 2, 5, 3, 6).reshape(
        b, cfg.out_channels, T, H, W)
    return out.astype(jnp.float32)


# ------------------------------------------------------------------ convert
def convert_longcat_dit_state_dict(sd: Dict[str, Any],
                                   cfg: LongCatDiTConfig, dtype=None):
    import numpy as _np

    def lin(name):
        p = {"w": _np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = _np.asarray(sd[name + ".bias"])
        return p

    def vec(name):
        return _np.asarray(sd[name + ".weight"])

    def block(i):
        pre = f"blocks.{i}"
        return {
            "adaln": lin(pre + ".adaLN_modulation.1"),
            "qkv": lin(pre + ".attn.qkv"),
            "q_norm": vec(pre + ".attn.q_norm"),
            "k_norm": vec(pre + ".attn.k_norm"),
            "proj": lin(pre + ".attn.proj"),
            "crs_norm": {"w": vec(pre + ".pre_crs_attn_norm"),
                         "b": _np.asarray(sd[pre + ".pre_crs_attn_norm.bias"])},
            "crs_q": lin(pre + ".cross_attn.q_linear"),
            "crs_kv": lin(pre + ".cross_attn.kv_linear"),
            "crs_q_norm": vec(pre + ".cross_attn.q_norm"),
            "crs_k_norm": vec(pre + ".cross_attn.k_norm"),
            "crs_proj": lin(pre + ".cross_attn.proj"),
            "w1": lin(pre + ".ffn.w1"),
            "w2": lin(pre + ".ffn.w2"),
            "w3": lin(pre + ".ffn.w3"),
        }

    pw = _np.asarray(sd["x_embedder.proj.weight"])  # (E, C, pt, ph, pw)
    blocks = [block(i) for i in range(cfg.depth)]
    params = {
        "x_embedder": {"w": pw.reshape(pw.shape[0], -1).T,
                       "b": _np.asarray(sd["x_embedder.proj.bias"])},
        "t_mlp": {"fc1": lin("t_embedder.mlp.0"),
                  "fc2": lin("t_embedder.mlp.2")},
        "y_mlp": {"fc1": lin("y_embedder.y_proj.0"),
                  "fc2": lin("y_embedder.y_proj.2")},
        "blocks": jax.tree.map(lambda *xs: _np.stack(xs), *blocks),
        "final": {"adaln": lin("final_layer.adaLN_modulation.1"),
                  "linear": lin("final_layer.linear")},
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)
