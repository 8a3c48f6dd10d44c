"""Z-Image DiT — functional JAX port, TPU-first.

Mirrors the reference ``ZImageDiT``
(``animation/diffsynth/models/z_image_dit.py:281-621``; driver
``pipelines/z_image.py:237-257`` ``model_fn_z_image``): a Lumina-style
single-stream stack — 2 modulated noise-refiner blocks over image
tokens, 2 unmodulated context-refiner blocks over caption tokens
(Qwen3 penultimate hidden states), then 30 unified blocks over
[image; caption] — with sandwich RMSNorms, tanh-gated 4-way AdaLN from a
256-dim timestep embedding, SwiGLU FFN (8/3 ratio), per-head q/k RMS
norms, and 3-axis complex RoPE at theta=256 whose caption positions
occupy axis-0 slots 1..L and image frames start past them.

Sequence padding matches the reference exactly: both streams pad to a
multiple of 32 (SEQ_MULTI_OF) with learned pad tokens that DO attend
(only cross-batch padding is masked there; we run the B=1 static-shape
case, so no mask at all).  The timestep MLP runs in bfloat16 like the
reference (z_image_dit.py:54 casts explicitly).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.rope import apply_interleaved_rope
from ...ops.norms import rms_norm
from ...ops.fused_norms import rms_modulate

SEQ_MULTI_OF = 32
ADALN_EMBED_DIM = 256


@dataclasses.dataclass(frozen=True)
class ZImageDiTConfig:
    dim: int = 3840
    num_heads: int = 30
    in_channels: int = 16
    patch_size: int = 2
    num_layers: int = 30
    num_refiner_layers: int = 2
    cap_feat_dim: int = 2560  # Qwen3-4B hidden
    time_freq_dim: int = 256
    time_mid_dim: int = 1024
    theta: float = 256.0
    t_scale: float = 1000.0
    axes_dims: Tuple[int, ...] = (32, 48, 48)
    eps: float = 1e-5

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    @property
    def adaln_dim(self):
        return min(self.dim, ADALN_EMBED_DIM)

    @staticmethod
    def z_image() -> "ZImageDiTConfig":
        return ZImageDiTConfig()

    @staticmethod
    def tiny(**over) -> "ZImageDiTConfig":
        base = dict(dim=96, num_heads=4, in_channels=4, cap_feat_dim=48,
                    num_layers=2, num_refiner_layers=1, axes_dims=(8, 8, 8))
        base.update(over)
        return ZImageDiTConfig(**base)


def _dense(p, x):
    if "w_int8" in p:  # W8A8 opt-in (ops/quant.quantize_blocks_tree)
        from ...ops.quant import quantized_dense

        return quantized_dense(p, x)
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _timestep_embed(p, t, cfg: ZImageDiTConfig):
    """TimestepEmbedder (z_image_dit.py:18-55): [cos, sin] sinusoid; the
    MLP runs in the PARAM dtype (the reference casts to bf16 explicitly,
    :54, and runs bf16 weights in production — identical when params are
    bf16, and exact-fp32 for golden tests)."""
    half = cfg.time_freq_dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], -1).astype(
        p["fc1"]["w"].dtype)
    return _dense(p["fc2"], jax.nn.silu(_dense(p["fc1"], emb)))


def _rope_tables(ids: np.ndarray, axes_dims, theta: float):
    """(L, head_dim/2) cos/sin from (L, 3) integer ids — interleaved-pair
    complex convention, fp64 host build (z_image_dit.py:239-278)."""
    cos_p, sin_p = [], []
    for i, d in enumerate(axes_dims):
        inv = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang = np.einsum("n,d->nd", ids[:, i].astype(np.float64), inv)
        cos_p.append(np.cos(ang))
        sin_p.append(np.sin(ang))
    return (np.concatenate(cos_p, -1).astype(np.float32),
            np.concatenate(sin_p, -1).astype(np.float32))


_apply_rope = apply_interleaved_rope


def _attention(p, x, cos, sin, cfg: ZImageDiTConfig):
    b, l, _ = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    xq = _dense(p["to_q"], x)
    xk = _dense(p["to_k"], x)
    v = _dense(p["to_v"], x).reshape(b, l, n, hd)
    from ...ops.fused_qk import fused_qk_enabled

    if hd == 128 and fused_qk_enabled():
        # fused per-head rms -> rope -> head-major prep (ops/fused_qk):
        # one HBM pass per tensor instead of ~3 (falls back to the exact
        # legacy chain off-TPU)
        from ...ops.fused_qk import fused_qk_attention_per_head

        o = fused_qk_attention_per_head(
            xq, xk, v, p["norm_q"], p["norm_k"], cos, sin, n, 1e-5)
        return _dense(p["to_out"], o.reshape(b, l, n * hd))
    q = rms_norm(xq.reshape(b, l, n, hd), p["norm_q"], 1e-5)
    k = rms_norm(xk.reshape(b, l, n, hd), p["norm_k"], 1e-5)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    o = attention(q, k, v, bounded_logits=True).reshape(b, l, n * hd)
    return _dense(p["to_out"], o)


def z_block(p, x, cos, sin, cfg: ZImageDiTConfig, adaln=None):
    """ZImageTransformerBlock (z_image_dit.py:139-218): sandwich RMS norms,
    tanh gates, 1+scale modulation."""
    if adaln is not None:
        mod = _dense(p["adaln"], adaln)[:, None, :]
        sc_msa, g_msa, sc_mlp, g_mlp = jnp.split(mod, 4, axis=-1)
        sc_msa, sc_mlp = 1.0 + sc_msa, 1.0 + sc_mlp
        g_msa, g_mlp = jnp.tanh(g_msa), jnp.tanh(g_mlp)
    else:
        sc_msa = sc_mlp = g_msa = g_mlp = 1.0

    mod = adaln is not None
    a = _attention(p["attn"],
                   rms_modulate(x, p["norm1"], sc_msa if mod else None,
                                cfg.eps),
                   cos, sin, cfg)
    x = x + g_msa * rms_modulate(a, p["norm2"], None, cfg.eps)
    h = rms_modulate(x, p["ffn_norm1"], sc_mlp if mod else None, cfg.eps)
    ff = _dense(p["ffn"]["w2"],
                jax.nn.silu(_dense(p["ffn"]["w1"], h))
                * _dense(p["ffn"]["w3"], h))
    return x + g_mlp * rms_modulate(ff, p["ffn_norm2"], None, cfg.eps)


def z_image_dit_forward(
    params,
    cfg: ZImageDiTConfig,
    latents,  # (1, C, H, W)
    timestep,  # (1,) — model-domain t (the pipeline passes (1000-t)/1000)
    cap_feats,  # (1, Lc, cap_feat_dim) unpadded caption hidden states
    remat: bool = False,
):
    """B=1 static-shape forward of the reference ZImageDiT.forward
    (z_image_dit.py:503-621)."""
    b, c, H, W = latents.shape
    assert b == 1, "Z-Image forward runs per sample (the reference packs "
    p_sz = cfg.patch_size
    dtype = latents.dtype
    ht, wt = H // p_sz, W // p_sz

    t_emb = _timestep_embed(params["t_embedder"],
                            timestep.astype(jnp.float32) * cfg.t_scale,
                            cfg).astype(dtype)

    # ---- caption stream: pad to /32 with repeated-last + pad token
    lc = cap_feats.shape[1]
    lc_pad = (-lc) % SEQ_MULTI_OF
    cap = jnp.concatenate(
        [cap_feats, jnp.repeat(cap_feats[:, -1:], lc_pad, axis=1)], axis=1
    ).astype(dtype)
    cap = _dense(params["cap_embedder"]["fc"],
                 rms_norm(cap, params["cap_embedder"]["norm"], cfg.eps))
    if lc_pad:
        pad_tok = params["cap_pad_token"].astype(dtype)
        cap = cap.at[:, lc:].set(pad_tok[None])
    cap_ids = np.zeros((lc + lc_pad, 3), np.int64)
    cap_ids[:, 0] = np.arange(1, lc + lc_pad + 1)
    cap_cos, cap_sin = _rope_tables(cap_ids, cfg.axes_dims, cfg.theta)

    # ---- image stream: patchify (f h w) x (pf ph pw c), pad to /32
    x = latents.reshape(1, c, ht, p_sz, wt, p_sz)
    x = x.transpose(0, 2, 4, 3, 5, 1).reshape(1, ht * wt, p_sz * p_sz * c)
    li = ht * wt
    li_pad = (-li) % SEQ_MULTI_OF
    if li_pad:
        x = jnp.concatenate([x, jnp.repeat(x[:, -1:], li_pad, axis=1)], 1)
    x = _dense(params["x_embedder"], x)
    if li_pad:
        x = x.at[:, li:].set(params["x_pad_token"].astype(dtype)[None])
    img_ids = np.zeros((li + li_pad, 3), np.int64)
    grid = np.stack(np.meshgrid(
        np.arange(1), np.arange(ht), np.arange(wt), indexing="ij"),
        axis=-1).reshape(-1, 3)
    grid[:, 0] += lc + lc_pad + 1
    img_ids[:li] = grid  # padding keeps (0, 0, 0)
    img_cos, img_sin = _rope_tables(img_ids, cfg.axes_dims, cfg.theta)

    jc = lambda a: jnp.asarray(a)  # noqa: E731
    for p in params["noise_refiner"]:
        x = z_block(p, x, jc(img_cos), jc(img_sin), cfg, adaln=t_emb)
    for p in params["context_refiner"]:
        cap = z_block(p, cap, jc(cap_cos), jc(cap_sin), cfg, adaln=None)

    # unified = [image; caption] (z_image_dit.py:594)
    u = jnp.concatenate([x, cap], axis=1)
    u_cos = jnp.asarray(np.concatenate([img_cos, cap_cos], 0))
    u_sin = jnp.asarray(np.concatenate([img_sin, cap_sin], 0))

    def body(carry, p):
        return z_block(p, carry, u_cos, u_sin, cfg, adaln=t_emb), None

    if remat:
        body = jax.checkpoint(body)
    u, _ = jax.lax.scan(body, u, params["layers"])

    # FinalLayer (z_image_dit.py:221-236): LN no-affine, 1+scale from
    # SiLU+Linear of the adaln input
    scale = 1.0 + _dense(params["final"]["adaln"], jax.nn.silu(t_emb))
    mean = u.astype(jnp.float32)
    mu = mean.mean(-1, keepdims=True)
    var = mean.var(-1, keepdims=True)
    un = ((mean - mu) * jax.lax.rsqrt(var + 1e-6)).astype(dtype)
    out = _dense(params["final"]["linear"], un * scale[:, None, :])
    out = out[:, :li]
    out = out.reshape(1, ht, wt, p_sz, p_sz, c)
    out = out.transpose(0, 5, 1, 3, 2, 4).reshape(1, c, H, W)
    return out


# ------------------------------------------------------------------ params
def _init_dense(key, din, dout, dtype, bias=True):
    k1, k2 = jax.random.split(key)
    lim = din ** -0.5
    p = {"w": jax.random.uniform(k1, (din, dout), dtype, -lim, lim)}
    if bias:
        p["b"] = jax.random.uniform(k2, (dout,), dtype, -lim, lim)
    return p


def init_z_image_dit_params(key, cfg: ZImageDiTConfig, dtype=jnp.float32):
    d, hd = cfg.dim, cfg.head_dim
    ffn_dim = int(d / 3 * 8)
    keys = iter(jax.random.split(key, 24))

    def block(k, modulated=True):
        ks = iter(jax.random.split(k, 12))
        p = {
            "attn": {
                "to_q": _init_dense(next(ks), d, d, dtype, bias=False),
                "to_k": _init_dense(next(ks), d, d, dtype, bias=False),
                "to_v": _init_dense(next(ks), d, d, dtype, bias=False),
                "to_out": _init_dense(next(ks), d, d, dtype, bias=False),
                "norm_q": jnp.ones((hd,), dtype),
                "norm_k": jnp.ones((hd,), dtype),
            },
            "ffn": {"w1": _init_dense(next(ks), d, ffn_dim, dtype, bias=False),
                    "w2": _init_dense(next(ks), ffn_dim, d, dtype, bias=False),
                    "w3": _init_dense(next(ks), d, ffn_dim, dtype, bias=False)},
            "norm1": jnp.ones((d,), dtype),
            "norm2": jnp.ones((d,), dtype),
            "ffn_norm1": jnp.ones((d,), dtype),
            "ffn_norm2": jnp.ones((d,), dtype),
        }
        if modulated:
            p["adaln"] = _init_dense(next(ks), cfg.adaln_dim, 4 * d, dtype)
        return p

    in_dim = cfg.patch_size ** 2 * cfg.in_channels
    layers_key = next(keys)
    nr_key = next(keys)
    cr_key = next(keys)
    layers = [block(jax.random.fold_in(layers_key, i))
              for i in range(cfg.num_layers)]
    return {
        "t_embedder": {
            "fc1": _init_dense(next(keys), cfg.time_freq_dim,
                               cfg.time_mid_dim, dtype),
            "fc2": _init_dense(next(keys), cfg.time_mid_dim, cfg.adaln_dim,
                               dtype),
        },
        "cap_embedder": {
            "norm": jnp.ones((cfg.cap_feat_dim,), dtype),
            "fc": _init_dense(next(keys), cfg.cap_feat_dim, d, dtype),
        },
        "x_embedder": _init_dense(next(keys), in_dim, d, dtype),
        "x_pad_token": jax.random.normal(next(keys), (d,), dtype) * 0.02,
        "cap_pad_token": jax.random.normal(next(keys), (d,), dtype) * 0.02,
        "noise_refiner": [block(jax.random.fold_in(nr_key, i))
                          for i in range(cfg.num_refiner_layers)],
        "context_refiner": [block(jax.random.fold_in(cr_key, i), False)
                            for i in range(cfg.num_refiner_layers)],
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final": {
            "adaln": _init_dense(next(keys), cfg.adaln_dim, d, dtype),
            "linear": _init_dense(next(keys), d, in_dim, dtype),
        },
    }


# ------------------------------------------------------------------ convert
def convert_z_image_dit_state_dict(sd: Dict[str, Any], cfg: ZImageDiTConfig,
                                   dtype=None):
    """Reference ZImageDiT module naming; patch key '2-1'
    (all_x_embedder/all_final_layer dicts, z_image_dit.py:317-327)."""
    import numpy as _np

    def lin(name):
        p = {"w": _np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = _np.asarray(sd[name + ".bias"])
        return p

    def vec(name):
        return _np.asarray(sd[name])

    def block(pre, modulated=True):
        p = {
            "attn": {
                "to_q": lin(pre + ".attention.to_q"),
                "to_k": lin(pre + ".attention.to_k"),
                "to_v": lin(pre + ".attention.to_v"),
                "to_out": lin(pre + ".attention.to_out.0"),
                "norm_q": vec(pre + ".attention.norm_q.weight"),
                "norm_k": vec(pre + ".attention.norm_k.weight"),
            },
            "ffn": {"w1": lin(pre + ".feed_forward.w1"),
                    "w2": lin(pre + ".feed_forward.w2"),
                    "w3": lin(pre + ".feed_forward.w3")},
            "norm1": vec(pre + ".attention_norm1.weight"),
            "norm2": vec(pre + ".attention_norm2.weight"),
            "ffn_norm1": vec(pre + ".ffn_norm1.weight"),
            "ffn_norm2": vec(pre + ".ffn_norm2.weight"),
        }
        if modulated:
            p["adaln"] = lin(pre + ".adaLN_modulation.0")
        return p

    key = f"{cfg.patch_size}-1"
    layers = [block(f"layers.{i}") for i in range(cfg.num_layers)]
    params = {
        "t_embedder": {"fc1": lin("t_embedder.mlp.0"),
                       "fc2": lin("t_embedder.mlp.2")},
        "cap_embedder": {"norm": vec("cap_embedder.0.weight"),
                         "fc": lin("cap_embedder.1")},
        "x_embedder": lin(f"all_x_embedder.{key}"),
        "x_pad_token": vec("x_pad_token")[0],
        "cap_pad_token": vec("cap_pad_token")[0],
        "noise_refiner": [block(f"noise_refiner.{i}")
                          for i in range(cfg.num_refiner_layers)],
        "context_refiner": [block(f"context_refiner.{i}", False)
                            for i in range(cfg.num_refiner_layers)],
        "layers": jax.tree.map(lambda *xs: _np.stack(xs), *layers),
        "final": {"adaln": lin(f"all_final_layer.{key}.adaLN_modulation.1"),
                  "linear": lin(f"all_final_layer.{key}.linear")},
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)
