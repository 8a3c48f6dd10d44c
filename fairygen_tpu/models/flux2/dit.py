"""FLUX.2 DiT — functional JAX port, TPU-first.

Mirrors the reference ``Flux2DiT``
(``animation/diffsynth/models/flux2_dit.py:869-1057``; driver
``pipelines/flux2_image.py:347-374`` ``model_fn_flux2``): 8 double-stream
+ 48 single-stream blocks at dim 6144 (48 heads x 128), bias-free linear
layers throughout, **shared** modulation parameters (one SiLU+Linear per
stream for all double blocks, one for all single blocks), SwiGLU FFNs
(mult 3, gate fused into linear_in), parallel single blocks (qkv+mlp in
one projection, attention and MLP concatenated into one output
projection — the ViT-22B block), 4-axis RoPE at theta 2000, and
timestep+guidance embeddings (both x1000).

Latents arrive PRE-PACKED as (B, L, 128) token sequences (the FLUX.2 VAE
packs 2x2 and batch-norms, models/flux2/vae.py); image ids are
(0, h, w, 0) grids and text ids (0, 0, 0, l).

TPU-native: one lax.scan per block family, host fp64 RoPE tables,
optional remat.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.rope import apply_interleaved_rope
from ...ops.norms import layer_norm, rms_norm
from ...ops.fused_norms import ln_modulate


@dataclasses.dataclass(frozen=True)
class Flux2DiTConfig:
    in_channels: int = 128  # packed 2x2 x 32ch latents
    num_heads: int = 48
    head_dim: int = 128
    num_double_blocks: int = 8
    num_single_blocks: int = 48
    joint_attention_dim: int = 15360  # 3 stacked Mistral hidden layers
    time_freq_dim: int = 256
    mlp_ratio: float = 3.0
    axes_dim: Tuple[int, ...] = (32, 32, 32, 32)
    theta: int = 2000
    eps: float = 1e-6

    @property
    def dim(self) -> int:
        return self.num_heads * self.head_dim

    @staticmethod
    def flux2_dev() -> "Flux2DiTConfig":
        return Flux2DiTConfig()

    @staticmethod
    def tiny(**over) -> "Flux2DiTConfig":
        base = dict(in_channels=16, num_heads=4, head_dim=24,
                    num_double_blocks=2, num_single_blocks=2,
                    joint_attention_dim=48, time_freq_dim=32,
                    axes_dim=(6, 6, 6, 6))
        base.update(over)
        return Flux2DiTConfig(**base)


def _dense(p, x):
    if "w_int8" in p:  # W8A8 opt-in (ops/quant.quantize_blocks_tree)
        from ...ops.quant import quantized_dense

        return quantized_dense(p, x)
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _timestep_sinusoid(t, dim: int):
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def rope_tables(ids: np.ndarray, axes_dim, theta: int):
    """(L, head_dim/2) cos/sin from (L, 4) ids (Flux2PosEmbed,
    flux2_dit.py:793-822; repeat-interleaved real form == per-pair)."""
    cos_p, sin_p = [], []
    for i, d in enumerate(axes_dim):
        inv = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        ang = np.einsum("n,d->nd", ids[:, i].astype(np.float64), inv)
        cos_p.append(np.cos(ang))
        sin_p.append(np.sin(ang))
    return (np.concatenate(cos_p, -1).astype(np.float32),
            np.concatenate(sin_p, -1).astype(np.float32))


_apply_rope = apply_interleaved_rope


def _heads(x, n):
    b, l, d = x.shape
    return x.reshape(b, l, n, d // n)


def _swiglu_ff(p, x):
    h = _dense(p["linear_in"], x)
    x1, x2 = jnp.split(h, 2, axis=-1)
    return _dense(p["linear_out"], jax.nn.silu(x1) * x2)


def _mod_params(p, temb, n_sets: int):
    """Flux2Modulation (flux2_dit.py:851-867): SiLU + bias-free linear ->
    n_sets of (shift, scale, gate), each (B, 1, dim)."""
    mod = _dense(p, jax.nn.silu(temb))[:, None, :]
    parts = jnp.split(mod, 3 * n_sets, axis=-1)
    return [tuple(parts[3 * i:3 * (i + 1)]) for i in range(n_sets)]


def flux2_double_block(p, img, txt, mod_img, mod_txt, cos, sin,
                       cfg: Flux2DiTConfig):
    n = cfg.num_heads
    (sh, sc, g), (sh2, sc2, g2) = mod_img
    (csh, csc, cg), (csh2, csc2, cg2) = mod_txt
    yi = ln_modulate(img, sh, sc, cfg.eps)
    yt = ln_modulate(txt, csh, csc, cfg.eps)

    a = p["attn"]
    from ...ops.fused_qk import fused_qk_attention_joint, fused_qk_enabled

    b, lt = txt.shape[:2]
    if cfg.head_dim == 128 and fused_qk_enabled():
        # fused two-stream prep + bounded flash (ops/fused_qk joint path);
        # rms eps is the hardcoded 1e-5 (flux2_dit.py), not cfg.eps
        o_t, o_i = fused_qk_attention_joint(
            _dense(a["add_q"], yt), _dense(a["add_k"], yt),
            _heads(_dense(a["add_v"], yt), n),
            _dense(a["to_q"], yi), _dense(a["to_k"], yi),
            _heads(_dense(a["to_v"], yi), n),
            a["norm_added_q"], a["norm_added_k"], a["norm_q"], a["norm_k"],
            cos[:lt], sin[:lt], cos[lt:], sin[lt:], n, 1e-5, True)
        o_t = o_t.reshape(b, lt, n * cfg.head_dim)
        o_i = o_i.reshape(b, img.shape[1], n * cfg.head_dim)
    else:
        qi = rms_norm(_heads(_dense(a["to_q"], yi), n), a["norm_q"], 1e-5)
        ki = rms_norm(_heads(_dense(a["to_k"], yi), n), a["norm_k"], 1e-5)
        vi = _heads(_dense(a["to_v"], yi), n)
        qt = rms_norm(_heads(_dense(a["add_q"], yt), n), a["norm_added_q"], 1e-5)
        kt = rms_norm(_heads(_dense(a["add_k"], yt), n), a["norm_added_k"], 1e-5)
        vt = _heads(_dense(a["add_v"], yt), n)
        q = _apply_rope(jnp.concatenate([qt, qi], 1), cos, sin)
        k = _apply_rope(jnp.concatenate([kt, ki], 1), cos, sin)
        v = jnp.concatenate([vt, vi], 1)
        o = attention(q, k, v, bounded_logits=True)
        o = o.reshape(b, o.shape[1], n * cfg.head_dim)
        o_t, o_i = o[:, :lt], o[:, lt:]
    txt = txt + cg * _dense(a["to_add_out"], o_t)
    img = img + g * _dense(a["to_out"], o_i)

    yi = ln_modulate(img, sh2, sc2, cfg.eps)
    img = img + g2 * _swiglu_ff(p["ff"], yi)
    yt = ln_modulate(txt, csh2, csc2, cfg.eps)
    txt = txt + cg2 * _swiglu_ff(p["ff_context"], yt)
    return img, txt


def flux2_single_block(p, x, mod, cos, sin, cfg: Flux2DiTConfig):
    """Parallel (ViT-22B style) block (flux2_dit.py:558-697)."""
    n, d = cfg.num_heads, cfg.dim
    mlp_hidden = int(d * cfg.mlp_ratio)
    sh, sc, g = mod
    y = ln_modulate(x, sh, sc, cfg.eps)
    h = _dense(p["to_qkv_mlp"], y)
    qkv, mlp = h[..., : 3 * d], h[..., 3 * d:]
    from ...ops.fused_qk import fused_qk_enabled

    if cfg.head_dim == 128 and fused_qk_enabled():
        # fused per-head rms -> rope -> head-major prep (ops/fused_qk)
        from ...ops.fused_qk import fused_qk_attention_per_head

        v = _heads(qkv[..., 2 * d:], n)
        att = fused_qk_attention_per_head(
            qkv[..., :d], qkv[..., d:2 * d], v, p["norm_q"], p["norm_k"],
            cos, sin, n, 1e-5)
        b, l, _, _ = att.shape
        att = att.reshape(b, l, d)
    else:
        q, k, v = jnp.split(_heads(qkv, 3 * n), 3, axis=2)
        q = rms_norm(q, p["norm_q"], 1e-5)
        k = rms_norm(k, p["norm_k"], 1e-5)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        att = attention(q, k, v, bounded_logits=True)
        b, l, _, _ = att.shape
        att = att.reshape(b, l, d)
    x1, x2 = jnp.split(mlp, 2, axis=-1)
    mlp = jax.nn.silu(x1) * x2
    assert mlp.shape[-1] == mlp_hidden
    return x + g * _dense(p["to_out"], jnp.concatenate([att, mlp], -1))


def prepare_image_ids(h_tokens: int, w_tokens: int) -> np.ndarray:
    """(h*w, 4) ids = cartesian (0, h, w, 0) (flux2_image.py:328-341)."""
    ids = np.zeros((h_tokens, w_tokens, 4), np.float64)
    ids[..., 1] += np.arange(h_tokens)[:, None]
    ids[..., 2] += np.arange(w_tokens)[None, :]
    return ids.reshape(-1, 4)


def prepare_text_ids(length: int) -> np.ndarray:
    """(L, 4) ids = (0, 0, 0, l) (flux2_image.py:224-242)."""
    ids = np.zeros((length, 4), np.float64)
    ids[:, 3] = np.arange(length)
    return ids


def flux2_dit_forward(
    params,
    cfg: Flux2DiTConfig,
    latents,  # (B, L_img, in_channels) pre-packed tokens
    timestep,  # (B,) in [0, 1] (model_fn passes t/1000; x1000 inside)
    prompt_emb,  # (B, Lt, joint_attention_dim)
    guidance,  # (B,) embedded guidance (x1000 inside)
    *,
    img_ids: Optional[np.ndarray] = None,  # (L_img, 4)
    txt_ids: Optional[np.ndarray] = None,  # (Lt, 4)
    remat: bool = False,
):
    dtype = latents.dtype
    lt = prompt_emb.shape[1]
    if txt_ids is None:
        txt_ids = prepare_text_ids(lt)
    assert img_ids is not None, "img_ids required (prepare_image_ids)"
    cos, sin = rope_tables(np.concatenate([txt_ids, img_ids], 0),
                           cfg.axes_dim, cfg.theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    temb = _dense(params["time_embed"]["fc2"], jax.nn.silu(
        _dense(params["time_embed"]["fc1"],
               _timestep_sinusoid(timestep * 1000.0,
                                  cfg.time_freq_dim).astype(dtype))))
    temb = temb + _dense(params["guidance_embed"]["fc2"], jax.nn.silu(
        _dense(params["guidance_embed"]["fc1"],
               _timestep_sinusoid(guidance * 1000.0,
                                  cfg.time_freq_dim).astype(dtype))))

    mod_img = _mod_params(params["mod_double_img"], temb, 2)
    mod_txt = _mod_params(params["mod_double_txt"], temb, 2)
    mod_single = _mod_params(params["mod_single"], temb, 1)[0]

    x = _dense(params["x_embedder"], latents)
    txt = _dense(params["context_embedder"], prompt_emb.astype(dtype))

    def dbl(carry, p):
        img, tx = carry
        return flux2_double_block(p, img, tx, mod_img, mod_txt, cos, sin,
                                  cfg), None

    def sgl(carry, p):
        return flux2_single_block(p, carry, mod_single, cos, sin, cfg), None

    if remat:
        dbl = jax.checkpoint(dbl)
        sgl = jax.checkpoint(sgl)

    (x, txt), _ = jax.lax.scan(dbl, (x, txt), params["double_blocks"])
    x = jnp.concatenate([txt, x], axis=1)
    x, _ = jax.lax.scan(sgl, x, params["single_blocks"])
    x = x[:, lt:]

    # AdaLayerNormContinuous(elementwise_affine=False, bias=False, eps=1e-6)
    emb = _dense(params["norm_out"], jax.nn.silu(temb))[:, None, :]
    scale, shift = jnp.split(emb, 2, axis=-1)
    x = ln_modulate(x, shift, scale, cfg.eps)
    return _dense(params["proj_out"], x)


# ------------------------------------------------------------------ params
def _init_dense(key, din, dout, dtype, bias=False):
    k1, k2 = jax.random.split(key)
    lim = din ** -0.5
    p = {"w": jax.random.uniform(k1, (din, dout), dtype, -lim, lim)}
    if bias:
        p["b"] = jax.random.uniform(k2, (dout,), dtype, -lim, lim)
    return p


def init_flux2_dit_params(key, cfg: Flux2DiTConfig, dtype=jnp.float32):
    d, hd = cfg.dim, cfg.head_dim
    mlp_h = int(d * cfg.mlp_ratio)
    keys = iter(jax.random.split(key, 24))

    def ff(k):
        ks = iter(jax.random.split(k, 2))
        return {"linear_in": _init_dense(next(ks), d, 2 * mlp_h, dtype),
                "linear_out": _init_dense(next(ks), mlp_h, d, dtype)}

    def dblock(k):
        ks = iter(jax.random.split(k, 12))
        return {
            "attn": {
                "to_q": _init_dense(next(ks), d, d, dtype),
                "to_k": _init_dense(next(ks), d, d, dtype),
                "to_v": _init_dense(next(ks), d, d, dtype),
                "add_q": _init_dense(next(ks), d, d, dtype),
                "add_k": _init_dense(next(ks), d, d, dtype),
                "add_v": _init_dense(next(ks), d, d, dtype),
                "norm_q": jnp.ones((hd,), dtype),
                "norm_k": jnp.ones((hd,), dtype),
                "norm_added_q": jnp.ones((hd,), dtype),
                "norm_added_k": jnp.ones((hd,), dtype),
                "to_out": _init_dense(next(ks), d, d, dtype),
                "to_add_out": _init_dense(next(ks), d, d, dtype),
            },
            "ff": ff(next(ks)),
            "ff_context": ff(next(ks)),
        }

    def sblock(k):
        ks = iter(jax.random.split(k, 2))
        return {
            "to_qkv_mlp": _init_dense(next(ks), d, 3 * d + 2 * mlp_h, dtype),
            "norm_q": jnp.ones((hd,), dtype),
            "norm_k": jnp.ones((hd,), dtype),
            "to_out": _init_dense(next(ks), d + mlp_h, d, dtype),
        }

    dbl_key, sgl_key = next(keys), next(keys)
    dbl = [dblock(jax.random.fold_in(dbl_key, i))
           for i in range(cfg.num_double_blocks)]
    sgl = [sblock(jax.random.fold_in(sgl_key, i))
           for i in range(cfg.num_single_blocks)]
    return {
        "time_embed": {
            "fc1": _init_dense(next(keys), cfg.time_freq_dim, d, dtype),
            "fc2": _init_dense(next(keys), d, d, dtype),
        },
        "guidance_embed": {
            "fc1": _init_dense(next(keys), cfg.time_freq_dim, d, dtype),
            "fc2": _init_dense(next(keys), d, d, dtype),
        },
        "mod_double_img": _init_dense(next(keys), d, 6 * d, dtype),
        "mod_double_txt": _init_dense(next(keys), d, 6 * d, dtype),
        "mod_single": _init_dense(next(keys), d, 3 * d, dtype),
        "x_embedder": _init_dense(next(keys), cfg.in_channels, d, dtype),
        "context_embedder": _init_dense(next(keys), cfg.joint_attention_dim,
                                        d, dtype),
        "double_blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *dbl),
        "single_blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *sgl),
        "norm_out": _init_dense(next(keys), d, 2 * d, dtype),
        "proj_out": _init_dense(next(keys), d, cfg.in_channels, dtype),
    }


# ------------------------------------------------------------------ convert
def convert_flux2_dit_state_dict(sd: Dict[str, Any], cfg: Flux2DiTConfig,
                                 dtype=None):
    """Reference Flux2DiT module naming (all linears bias-free)."""
    import numpy as _np

    def lin(name):
        p = {"w": _np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = _np.asarray(sd[name + ".bias"])
        return p

    def vec(name):
        return _np.asarray(sd[name + ".weight"])

    def dblock(i):
        pre = f"transformer_blocks.{i}"
        return {
            "attn": {
                "to_q": lin(pre + ".attn.to_q"),
                "to_k": lin(pre + ".attn.to_k"),
                "to_v": lin(pre + ".attn.to_v"),
                "add_q": lin(pre + ".attn.add_q_proj"),
                "add_k": lin(pre + ".attn.add_k_proj"),
                "add_v": lin(pre + ".attn.add_v_proj"),
                "norm_q": vec(pre + ".attn.norm_q"),
                "norm_k": vec(pre + ".attn.norm_k"),
                "norm_added_q": vec(pre + ".attn.norm_added_q"),
                "norm_added_k": vec(pre + ".attn.norm_added_k"),
                "to_out": lin(pre + ".attn.to_out.0"),
                "to_add_out": lin(pre + ".attn.to_add_out"),
            },
            "ff": {"linear_in": lin(pre + ".ff.linear_in"),
                   "linear_out": lin(pre + ".ff.linear_out")},
            "ff_context": {"linear_in": lin(pre + ".ff_context.linear_in"),
                           "linear_out": lin(pre + ".ff_context.linear_out")},
        }

    def sblock(i):
        pre = f"single_transformer_blocks.{i}"
        return {
            "to_qkv_mlp": lin(pre + ".attn.to_qkv_mlp_proj"),
            "norm_q": vec(pre + ".attn.norm_q"),
            "norm_k": vec(pre + ".attn.norm_k"),
            "to_out": lin(pre + ".attn.to_out"),
        }

    params = {
        "time_embed": {
            "fc1": lin("time_guidance_embed.timestep_embedder.linear_1"),
            "fc2": lin("time_guidance_embed.timestep_embedder.linear_2"),
        },
        "guidance_embed": {
            "fc1": lin("time_guidance_embed.guidance_embedder.linear_1"),
            "fc2": lin("time_guidance_embed.guidance_embedder.linear_2"),
        },
        "mod_double_img": lin("double_stream_modulation_img.linear"),
        "mod_double_txt": lin("double_stream_modulation_txt.linear"),
        "mod_single": lin("single_stream_modulation.linear"),
        "x_embedder": lin("x_embedder"),
        "context_embedder": lin("context_embedder"),
        "double_blocks": jax.tree.map(
            lambda *xs: _np.stack(xs),
            *[dblock(i) for i in range(cfg.num_double_blocks)]),
        "single_blocks": jax.tree.map(
            lambda *xs: _np.stack(xs),
            *[sblock(i) for i in range(cfg.num_single_blocks)]),
        "norm_out": lin("norm_out.linear"),
        "proj_out": lin("proj_out"),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)
