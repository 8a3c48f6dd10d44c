"""FLUX.1 MMDiT — functional JAX port, TPU-first.

Mirrors the reference's FluxDiT (``animation/diffsynth/models/flux_dit.py``)
whose real forward lives in ``pipelines/flux_image.py:1003-1209``
(``model_fn_flux_image``): 19 double-stream (joint text/image) blocks
followed by 38 single-stream blocks over the concatenated [text, image]
token sequence, 2x2-packed 16-channel latents, 3-axis RoPE over
(batch-id, row, col) position ids, AdaLN conditioning from
timestep + pooled-CLIP (+ embedded guidance for FLUX.1-dev).

TPU-native decisions (not a translation):
  - one ``lax.scan`` per block family over stacked params (two compiled
    block bodies total instead of 57 unrolled ones), with optional
    ``jax.checkpoint`` for training;
  - the RoPE cos/sin table is built on the host in float64 (the reference
    computes omega in fp64, flux_dit.py:25) and baked as fp32 constants —
    position ids depend only on static shapes;
  - the attention softmax scale·log2e is folded into the q RMS-norm gamma
    at convert time (`prescaled`), so the Pallas flash kernel runs with no
    extra elementwise pass (same trick as models/wan/dit.py);
  - channels-last matmul layouts, bf16 params / fp32 softmax+norms.
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

_LOG2E = 1.4426950408889634


@dataclasses.dataclass(frozen=True)
class FluxDiTConfig:
    dim: int = 3072
    num_heads: int = 24
    in_dim: int = 64  # 16-ch latents packed 2x2 (flux_dit.py:296-298)
    context_dim: int = 4096  # T5-XXL hidden size
    pooled_dim: int = 768  # CLIP-L pooled embed
    time_freq_dim: int = 256
    num_double_blocks: int = 19
    num_single_blocks: int = 38
    axes_dim: Tuple[int, ...] = (16, 56, 56)  # RoPE per-axis dims
    theta: int = 10000
    guidance_embed: bool = True  # FLUX.1-dev; schnell has none
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @staticmethod
    def flux1_dev() -> "FluxDiTConfig":
        return FluxDiTConfig()

    @staticmethod
    def flux1_schnell() -> "FluxDiTConfig":
        return FluxDiTConfig(guidance_embed=False)

    @staticmethod
    def tiny(**over) -> "FluxDiTConfig":
        base = dict(dim=96, num_heads=4, in_dim=16, context_dim=48,
                    pooled_dim=32, time_freq_dim=32, num_double_blocks=2,
                    num_single_blocks=2, axes_dim=(4, 10, 10))
        base.update(over)
        return FluxDiTConfig(**base)


# ------------------------------------------------------------------ helpers
def _dense(p, x):
    from ...ops import quant as _q

    if _q._ACT_TAP is not None:  # calibration tap (no-op when inactive)
        w = p.get("w", p.get("w_int8"))
        _q.record_activation_stats(f"dense_{x.shape[-1]}x{w.shape[-1]}", x)
    if "w_int8" in p:  # W8A8 opt-in (ops/quant.quantize_blocks_tree)
        return _q.quantized_dense(p, x)
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _timestep_sinusoid(t, dim: int):
    """diffusers get_timestep_embedding with flip_sin_to_cos=True,
    downscale_freq_shift=0 (reference general_modules.py:4-40): [cos, sin]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _mlp_embed(p, x, dtype):
    # Linear -> SiLU -> Linear (TimestepEmbeddings / pooled_text_embedder)
    h = _dense(p["fc1"], x.astype(dtype))
    return _dense(p["fc2"], jax.nn.silu(h))


def prepare_image_ids(height: int, width: int) -> np.ndarray:
    """(h/2 * w/2, 3) latent position ids (reference flux_dit.py:306-320):
    axis 0 = image index (0; kontext images use 1), axis 1 = row, axis 2 =
    col.  Host-side: ids depend only on static shapes."""
    ids = np.zeros((height // 2, width // 2, 3), np.float64)
    ids[..., 1] += np.arange(height // 2)[:, None]
    ids[..., 2] += np.arange(width // 2)[None, :]
    return ids.reshape(-1, 3)


def rope_table(ids: np.ndarray, axes_dim, theta: int):
    """cos/sin (L, head_dim/2) fp32 from (L, 3) ids.

    The reference builds a [[cos,-sin],[sin,cos]] rotation per pair with
    fp64 omega (flux_dit.py:22-35); equivalent interleaved-pair form."""
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dim):
        scale = np.arange(0, d, 2, dtype=np.float64) / d
        omega = 1.0 / (theta ** scale)
        ang = np.einsum("n,d->nd", ids[:, i].astype(np.float64), omega)
        cos_parts.append(np.cos(ang))
        sin_parts.append(np.sin(ang))
    cos = np.concatenate(cos_parts, axis=-1).astype(np.float32)
    sin = np.concatenate(sin_parts, axis=-1).astype(np.float32)
    return cos, sin


_apply_rope = apply_interleaved_rope


def _split_heads(x, n):
    b, l, d = x.shape
    return x.reshape(b, l, n, d // n)


def _merge_heads(x):
    b, l, n, hd = x.shape
    return x.reshape(b, l, n * hd)


def _adaln(p, cond, n_chunks: int, hot=None):
    """SiLU + linear modulation (reference general_modules.AdaLayerNorm /
    flux_dit.AdaLayerNormSingle/Continuous); cond (B, dim)."""
    if hot is not None:
        from .lora_runtime import hot_dense

        emb = hot_dense(p, jax.nn.silu(cond), hot)
    else:
        emb = _dense(p, jax.nn.silu(cond))
    return jnp.split(emb[:, None, :], n_chunks, axis=-1)


def _hdense(p, x, hot):
    if hot is None:
        return _dense(p, x)
    from .lora_runtime import hot_dense

    return hot_dense(p, x, hot)


# ------------------------------------------------------------------ blocks
def _rms_noaffine(x, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype)


def _ip_attention(ip, q, n, prescaled):
    """interact_with_ipadapter (reference flux_dit.py:6-11): a second
    attention of the block's query against the projected image-prompt
    tokens; returns the scaled merged-head residual.  ``norm_added_k`` is
    an affine-free RMS at eps 1e-5 (flux_ipadapter.py:52)."""
    ip_p, tokens, scale = ip
    # _dense: same dot for bf16 weights (no bias in these projections),
    # plus the "w_int8" W8A8 dispatch so the IP k/v adapters can ride
    # pipe.quantize() / the single-chip fit path with the DiT
    ip_k = _split_heads(_dense(ip_p["to_k_ip"], tokens), n)
    ip_k = _rms_noaffine(ip_k, 1e-5)
    ip_v = _split_heads(_dense(ip_p["to_v_ip"], tokens), n)
    o = _merge_heads(attention(q, ip_k, ip_v, prescaled=prescaled))
    return o * jnp.asarray(scale, o.dtype)


def _joint_attention(p, xa, xb, cos, sin, cfg: FluxDiTConfig, prescaled,
                     ip=None, attn_bias=None, hot={}):
    n = cfg.num_heads
    qkv_a = _hdense(p["a_qkv"], xa, hot.get("attn.a_to_qkv"))
    qkv_b = _hdense(p["b_qkv"], xb, hot.get("attn.b_to_qkv"))
    from ...ops.fused_qk import fused_qk_attention_joint, fused_qk_enabled

    if (ip is None and attn_bias is None and cfg.head_dim == 128
            and fused_qk_enabled()):
        # fused two-stream prep + bounded flash (ops/fused_qk joint path);
        # the IP-adapter path needs the pre-rope normed q_a in natural
        # layout and EliGen needs a bias -> both keep the legacy chain
        d = cfg.dim
        lb = xb.shape[1]
        o_b, o_a = fused_qk_attention_joint(
            qkv_b[..., :d], qkv_b[..., d:2 * d],
            _split_heads(qkv_b[..., 2 * d:], n),
            qkv_a[..., :d], qkv_a[..., d:2 * d],
            _split_heads(qkv_a[..., 2 * d:], n),
            p["norm_q_b"], p["norm_k_b"], p["norm_q_a"], p["norm_k_a"],
            cos[:lb], sin[:lb], cos[lb:], sin[lb:],
            n, cfg.eps, not prescaled)
        return (_hdense(p["a_out"], _merge_heads(o_a), hot.get("attn.a_to_out")),
                _hdense(p["b_out"], _merge_heads(o_b), hot.get("attn.b_to_out")))
    q_a, k_a, v_a = jnp.split(_split_heads(qkv_a, 3 * n), 3, axis=2)
    q_b, k_b, v_b = jnp.split(_split_heads(qkv_b, 3 * n), 3, axis=2)
    q_a = rms_norm(q_a, p["norm_q_a"], cfg.eps)
    k_a = rms_norm(k_a, p["norm_k_a"], cfg.eps)
    q_b = rms_norm(q_b, p["norm_q_b"], cfg.eps)
    k_b = rms_norm(k_b, p["norm_k_b"], cfg.eps)
    # text (b) tokens first, matching the reference concat order
    q = jnp.concatenate([q_b, q_a], axis=1)
    k = jnp.concatenate([k_b, k_a], axis=1)
    v = jnp.concatenate([v_b, v_a], axis=1)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    # q/k rms-normed -> bounded logits, max-free pallas softmax
    o = _merge_heads(attention(q, k, v, prescaled=prescaled,
                               bias=attn_bias, bounded_logits=True))
    lb = xb.shape[1]
    o_b, o_a = o[:, :lb], o[:, lb:]
    if ip is not None:
        # double blocks query with the PRE-rope normed q_a (flux_dit.py:97)
        o_a = o_a + _ip_attention(ip, q_a, n, prescaled)
    return (_hdense(p["a_out"], o_a, hot.get("attn.a_to_out")),
            _hdense(p["b_out"], o_b, hot.get("attn.b_to_out")))


def flux_double_block(p, xa, xb, cond, cos, sin, cfg: FluxDiTConfig,
                      prescaled: bool = False, ip=None, attn_bias=None,
                      hot={}):
    """FluxJointTransformerBlock (flux_dit.py:108-148)."""
    sh_a, sc_a, g_a, sh_ma, sc_ma, g_ma = _adaln(
        p["norm1_a"], cond, 6, hot.get("norm1_a.linear"))
    sh_b, sc_b, g_b, sh_mb, sc_mb, g_mb = _adaln(
        p["norm1_b"], cond, 6, hot.get("norm1_b.linear"))
    ya = ln_modulate(xa, sh_a, sc_a, cfg.eps)
    yb = ln_modulate(xb, sh_b, sc_b, cfg.eps)
    att_a, att_b = _joint_attention(p["attn"], ya, yb, cos, sin, cfg,
                                    prescaled, ip, attn_bias, hot)
    xa = xa + g_a * att_a
    ya = ln_modulate(xa, sh_ma, sc_ma, cfg.eps)
    xa = xa + g_ma * _hdense(
        p["ff_a"]["fc2"],
        jax.nn.gelu(_hdense(p["ff_a"]["fc1"], ya, hot.get("ff_a.0"))),
        hot.get("ff_a.2"))
    xb = xb + g_b * att_b
    yb = ln_modulate(xb, sh_mb, sc_mb, cfg.eps)
    xb = xb + g_mb * _hdense(
        p["ff_b"]["fc2"],
        jax.nn.gelu(_hdense(p["ff_b"]["fc1"], yb, hot.get("ff_b.0"))),
        hot.get("ff_b.2"))
    return xa, xb


def flux_single_block(p, x, cond, cos, sin, cfg: FluxDiTConfig,
                      prescaled: bool = False, ip=None, attn_bias=None,
                      hot={}):
    """FluxSingleTransformerBlock (flux_dit.py:205-258): fused qkv+mlp
    projection, parallel attention/GELU, joint output projection."""
    n, d = cfg.num_heads, cfg.dim
    shift, scale, gate = _adaln(p["norm"], cond, 3, hot.get("norm.linear"))
    y = ln_modulate(x, shift, scale, cfg.eps)
    h = _hdense(p["to_qkv_mlp"], y, hot.get("to_qkv_mlp"))
    qkv, mlp = h[..., : 3 * d], h[..., 3 * d:]
    from ...ops.fused_qk import fused_qk_enabled

    if (ip is None and attn_bias is None and cfg.head_dim == 128
            and fused_qk_enabled()):
        # fused per-head rms -> rope -> head-major prep (ops/fused_qk);
        # the IP-adapter / EliGen-bias paths need the post-rope q in
        # natural layout, so they keep the legacy chain
        from ...ops.fused_qk import fused_qk_attention_per_head

        v = _split_heads(qkv[..., 2 * d:], n)
        att = fused_qk_attention_per_head(
            qkv[..., :d], qkv[..., d:2 * d], v, p["norm_q"], p["norm_k"],
            cos, sin, n, cfg.eps, not prescaled)
        att = _merge_heads(att)
    else:
        q, k, v = jnp.split(_split_heads(qkv, 3 * n), 3, axis=2)
        q = rms_norm(q, p["norm_q"], cfg.eps)
        k = rms_norm(k, p["norm_k"], cfg.eps)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        att = _merge_heads(attention(q, k, v, prescaled=prescaled,
                                     bias=attn_bias, bounded_logits=True))
        if ip is not None:
            # single blocks query with the POST-rope q over ALL tokens (text
            # included) — flux_dit.py:240-241
            att = att + _ip_attention(ip, q, n, prescaled)
    h = jnp.concatenate([att, jax.nn.gelu(mlp)], axis=-1)
    return x + gate * _hdense(p["proj_out"], h, hot.get("proj_out"))


def eligen_attention_bias(entity_masks, lt: int, n_img: int):
    """EliGen regional mask -> additive attention bias (B, 1, L, L).

    Port of ``FluxDiT.construct_mask`` (reference flux_dit.py:325-356):
    entity prompt i exchanges attention only with its masked image tokens
    (the all-ones global mask rides last), different prompts never attend
    each other, image-image stays dense.  ``entity_masks`` is
    (B, N, 1, H, W) binary at latent resolution."""
    b, n_ent = entity_masks.shape[:2]
    img_masks = [jnp.sum(patchify(entity_masks[:, i].astype(jnp.float32)),
                         -1) > 0 for i in range(n_ent)]
    img_masks.append(jnp.ones((b, n_img), bool))
    pi = jnp.stack(img_masks, 1)  # (B, N+1, n_img)
    nt = n_ent + 1
    n_txt = nt * lt
    allow = jnp.ones((b, n_txt + n_img, n_txt + n_img), bool)
    rows = jnp.repeat(pi, lt, axis=1)  # (B, n_txt, n_img)
    allow = allow.at[:, :n_txt, n_txt:].set(rows)
    allow = allow.at[:, n_txt:, :n_txt].set(jnp.swapaxes(rows, 1, 2))
    block_diag = jnp.kron(jnp.eye(nt, dtype=jnp.int32),
                          jnp.ones((lt, lt), jnp.int32)).astype(bool)
    allow = allow.at[:, :n_txt, :n_txt].set(
        jnp.broadcast_to(block_diag, (b, n_txt, n_txt)))
    return jnp.where(allow, 0.0, -1e30).astype(jnp.float32)[:, None]


# ------------------------------------------------------------------ forward
def patchify(latents):
    """(B, C, H, W) -> (B, H/2*W/2, C*4), layout (C P Q)
    (reference flux_dit.py:296-298)."""
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # B, H, W, C, P, Q
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpatchify(x, height: int, width: int):
    b, _, cd = x.shape
    c = cd // 4
    x = x.reshape(b, height // 2, width // 2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, height, width)


def flux_dit_forward(
    params,
    cfg: FluxDiTConfig,
    latents,  # (B, 16, H, W) latent image
    timestep,  # (B,) float in [0, 1000]
    prompt_emb,  # (B, Lt, context_dim) T5 embeddings
    pooled_prompt_emb,  # (B, pooled_dim) CLIP pooled
    guidance=None,  # (B,) embedded guidance (dev); x1000 inside
    *,
    image_ids: Optional[np.ndarray] = None,  # (L_img, 3) host array
    kontext_latents=None,  # (B, Lk, in_dim) pre-packed reference latents
    kontext_image_ids: Optional[np.ndarray] = None,  # (Lk, 3)
    remat: bool = False,
    prescaled: bool = False,  # scale·log2e folded into norm_q at convert
    tea_cache_state=None,  # utils.tea_cache.TeaCacheState -> (out, state)
    tea_cache_opts=None,  # dict(rel_l1_thresh=, num_inference_steps=)
    controlnet_res=None,  # (num_double_blocks, B, L_img, dim) aligned taps
    controlnet_single_res=None,  # (num_single_blocks, B, L_img, dim)
    ipadapter=None,  # (ip_params, ip_tokens (1, L_ip, cross_dim), scale)
    entity_prompt_emb=None,  # EliGen: (B, N, Lt, context_dim)
    entity_masks=None,  # EliGen: (B, N, 1, H, W) binary latent-res masks
    hot_lora=None,  # lora_runtime.stack_hot_lora output (unfused LoRAs)
    txt_ids: Optional[np.ndarray] = None,  # (Lt, 3) host array — NexusGen
    # editing uses fractional ids (flux_image.py:648-668); default zeros
    flex_condition=None,  # (B, Cf, H, W) Flex inpaint/control channels,
    # channel-concatenated before patchify (flux_image.py:1095-1100)
):
    """model_fn_flux_image core path (reference flux_image.py:1003-1209),
    incl. the ControlNet residual adds (:1160-1166,:1183-1188 — applied to
    the main-image tokens only; kontext tokens are left untouched)."""
    b, c, h, w = latents.shape
    dtype = latents.dtype

    cond = _mlp_embed(params["time_embedder"],
                      _timestep_sinusoid(timestep, cfg.time_freq_dim), dtype)
    cond = cond + _mlp_embed(params["pooled_text_embedder"],
                             pooled_prompt_emb, dtype)
    if cfg.guidance_embed:
        assert guidance is not None, "FLUX.1-dev requires embedded guidance"
        cond = cond + _mlp_embed(
            params["guidance_embedder"],
            _timestep_sinusoid(guidance * 1000.0, cfg.time_freq_dim), dtype)

    if flex_condition is not None:
        latents = jnp.concatenate(
            [latents, flex_condition.astype(dtype)], axis=1)
    x = patchify(latents)
    if image_ids is None:
        image_ids = prepare_image_ids(h, w)
    lt_rows = prompt_emb.shape[1]
    if entity_prompt_emb is not None:
        # EliGen repeats the (zero) text ids once per entity prompt
        # (process_entity_masks, flux_dit.py:381-382)
        lt_rows = (entity_prompt_emb.shape[1] + 1) * prompt_emb.shape[1]
    if txt_ids is None:
        txt_ids = np.zeros((lt_rows, 3), np.float64)
    ids = [np.asarray(txt_ids, np.float64), image_ids]
    if kontext_latents is not None:
        assert entity_prompt_emb is None, "EliGen + Kontext is unsupported"
        x = jnp.concatenate([x, kontext_latents.astype(dtype)], axis=1)
        assert kontext_image_ids is not None
        ids.append(kontext_image_ids)
    cos, sin = rope_table(np.concatenate(ids, axis=0), cfg.axes_dim,
                          cfg.theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    x = _dense(params["x_embedder"], x)
    attn_bias = None
    if entity_prompt_emb is not None:
        n_ent = entity_prompt_emb.shape[1]
        lt1 = prompt_emb.shape[1]
        # entity prompts first, the global prompt LAST
        # (process_entity_masks, flux_dit.py:375-377)
        embs = [entity_prompt_emb[:, i] for i in range(n_ent)] + [prompt_emb]
        ctx = jnp.concatenate(
            [_dense(params["context_embedder"], e.astype(dtype))
             for e in embs], axis=1)
        attn_bias = eligen_attention_bias(entity_masks, lt1,
                                          (h // 2) * (w // 2))
    else:
        ctx = _dense(params["context_embedder"], prompt_emb.astype(dtype))

    n_img = (h // 2) * (w // 2)
    lt = ctx.shape[1]

    ip_tokens, ip_scale = (None, 1.0)
    ip_dbl = ip_sgl = None
    if ipadapter is not None:
        ip_params, ip_tokens, ip_scale = ipadapter
        ip_tokens = ip_tokens.astype(dtype)
        ip_dbl, ip_sgl = ip_params["double"], ip_params["single"]

    hot_dbl = (hot_lora or {}).get("double") or {}
    hot_sgl = (hot_lora or {}).get("single") or {}

    def dbl(carry, xs):
        p, r, ip_p, hot = xs
        xa, xb = carry
        ip = (ip_p, ip_tokens, ip_scale) if ip_p is not None else None
        xa, xb = flux_double_block(p, xa, xb, cond, cos, sin, cfg, prescaled,
                                   ip, attn_bias, hot)
        if r is not None:
            # ControlNet tap added AFTER the block, main image tokens only
            xa = xa.at[:, :n_img].add(r.astype(xa.dtype))
        return (xa, xb), None

    def sgl(carry, xs):
        p, r, ip_p, hot = xs
        ip = (ip_p, ip_tokens, ip_scale) if ip_p is not None else None
        hh = flux_single_block(p, carry, cond, cos, sin, cfg, prescaled, ip,
                               attn_bias, hot)
        if r is not None:
            hh = hh.at[:, lt:lt + n_img].add(r.astype(hh.dtype))
        return hh, None

    if remat:
        dbl = jax.checkpoint(dbl)
        sgl = jax.checkpoint(sgl)

    def run_blocks(xx):
        (xa, c2), _ = jax.lax.scan(
            dbl, (xx, ctx), (params["double_blocks"], controlnet_res,
                             ip_dbl, hot_dbl))
        hh = jnp.concatenate([c2, xa], axis=1)
        (hh, _) = jax.lax.scan(
            sgl, hh, (params["single_blocks"], controlnet_single_res,
                      ip_sgl, hot_sgl))
        return hh[:, ctx.shape[1]:]

    new_tc = None
    if tea_cache_state is not None:
        # FLUX TeaCache drift signal: block 0's norm1_a-modulated hidden
        # states (reference flux_image.py:917-933)
        from ...utils.tea_cache import tea_cache_blocks

        p0 = jax.tree.map(lambda a: a[0], params["double_blocks"]["norm1_a"])
        sh0, sc0 = _adaln(p0, cond, 6)[:2]
        modulated = ln_modulate(x, sh0, sc0, cfg.eps)
        x, new_tc = tea_cache_blocks(
            tea_cache_state, x, modulated, run_blocks,
            model_id=tea_cache_opts.get("model_id", "FLUX.1"),
            rel_l1_thresh=tea_cache_opts["rel_l1_thresh"],
            num_inference_steps=tea_cache_opts["num_inference_steps"],
        )
    else:
        x = run_blocks(x)

    shift, scale = _adaln(params["final_norm_out"], cond, 2)
    x = ln_modulate(x, shift, scale, cfg.eps)
    x = _dense(params["final_proj_out"], x)
    if kontext_latents is not None:
        x = x[:, : (h // 2) * (w // 2)]
    out = unpatchify(x, h, w)
    if tea_cache_state is not None:
        return out, new_tc
    return out


# ------------------------------------------------------------------ params
def _init_dense(key, din, dout, dtype):
    k1, k2 = jax.random.split(key)
    lim = (din ** -0.5)
    return {"w": jax.random.uniform(k1, (din, dout), dtype, -lim, lim),
            "b": jax.random.uniform(k2, (dout,), dtype, -lim, lim)}


def init_flux_dit_params(key, cfg: FluxDiTConfig, dtype=jnp.float32):
    d, hd = cfg.dim, cfg.head_dim
    keys = iter(jax.random.split(key, 64))

    def mlp(din):
        return {"fc1": _init_dense(next(keys), din, d, dtype),
                "fc2": _init_dense(next(keys), d, d, dtype)}

    def stack(n, fn):
        base = next(keys)
        leaves = [fn(jax.random.fold_in(base, i)) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    def dbl(k):
        ks = iter(jax.random.split(k, 16))
        return {
            "norm1_a": _init_dense(next(ks), d, 6 * d, dtype),
            "norm1_b": _init_dense(next(ks), d, 6 * d, dtype),
            "attn": {
                "a_qkv": _init_dense(next(ks), d, 3 * d, dtype),
                "b_qkv": _init_dense(next(ks), d, 3 * d, dtype),
                "norm_q_a": jnp.ones((hd,), dtype),
                "norm_k_a": jnp.ones((hd,), dtype),
                "norm_q_b": jnp.ones((hd,), dtype),
                "norm_k_b": jnp.ones((hd,), dtype),
                "a_out": _init_dense(next(ks), d, d, dtype),
                "b_out": _init_dense(next(ks), d, d, dtype),
            },
            "ff_a": {"fc1": _init_dense(next(ks), d, 4 * d, dtype),
                     "fc2": _init_dense(next(ks), 4 * d, d, dtype)},
            "ff_b": {"fc1": _init_dense(next(ks), d, 4 * d, dtype),
                     "fc2": _init_dense(next(ks), 4 * d, d, dtype)},
        }

    def sgl(k):
        ks = iter(jax.random.split(k, 4))
        return {
            "norm": _init_dense(next(ks), d, 3 * d, dtype),
            "to_qkv_mlp": _init_dense(next(ks), d, 7 * d, dtype),
            "norm_q": jnp.ones((hd,), dtype),
            "norm_k": jnp.ones((hd,), dtype),
            "proj_out": _init_dense(next(ks), 5 * d, d, dtype),
        }

    params = {
        "time_embedder": {
            "fc1": _init_dense(next(keys), cfg.time_freq_dim, d, dtype),
            "fc2": _init_dense(next(keys), d, d, dtype),
        },
        "pooled_text_embedder": {
            "fc1": _init_dense(next(keys), cfg.pooled_dim, d, dtype),
            "fc2": _init_dense(next(keys), d, d, dtype),
        },
        "context_embedder": _init_dense(next(keys), cfg.context_dim, d, dtype),
        "x_embedder": _init_dense(next(keys), cfg.in_dim, d, dtype),
        "double_blocks": stack(cfg.num_double_blocks, dbl),
        "single_blocks": stack(cfg.num_single_blocks, sgl),
        "final_norm_out": _init_dense(next(keys), d, 2 * d, dtype),
        "final_proj_out": _init_dense(next(keys), d, cfg.in_dim, dtype),
    }
    if cfg.guidance_embed:
        params["guidance_embedder"] = {
            "fc1": _init_dense(next(keys), cfg.time_freq_dim, d, dtype),
            "fc2": _init_dense(next(keys), d, d, dtype),
        }
    return params


# ------------------------------------------------------------------ convert
def _sd_lin(sd, name):
    import numpy as _np

    p = {"w": _np.asarray(sd[name + ".weight"]).T}
    if name + ".bias" in sd:
        p["b"] = _np.asarray(sd[name + ".bias"])
    return p


def _sd_vec(sd, name):
    import numpy as _np

    return _np.asarray(sd[name + ".weight"])


def _sd_mlp(sd, pre):
    return {"fc1": _sd_lin(sd, pre + ".0"), "fc2": _sd_lin(sd, pre + ".2")}


def _sd_double_block(sd, pre, s):
    """One FluxJointTransformerBlock from reference module naming; ``s``
    is the prescale factor folded into the q-norm gammas."""
    return {
        "norm1_a": _sd_lin(sd, pre + ".norm1_a.linear"),
        "norm1_b": _sd_lin(sd, pre + ".norm1_b.linear"),
        "attn": {
            "a_qkv": _sd_lin(sd, pre + ".attn.a_to_qkv"),
            "b_qkv": _sd_lin(sd, pre + ".attn.b_to_qkv"),
            "norm_q_a": _sd_vec(sd, pre + ".attn.norm_q_a") * s,
            "norm_k_a": _sd_vec(sd, pre + ".attn.norm_k_a"),
            "norm_q_b": _sd_vec(sd, pre + ".attn.norm_q_b") * s,
            "norm_k_b": _sd_vec(sd, pre + ".attn.norm_k_b"),
            "a_out": _sd_lin(sd, pre + ".attn.a_to_out"),
            "b_out": _sd_lin(sd, pre + ".attn.b_to_out"),
        },
        "ff_a": {"fc1": _sd_lin(sd, pre + ".ff_a.0"),
                 "fc2": _sd_lin(sd, pre + ".ff_a.2")},
        "ff_b": {"fc1": _sd_lin(sd, pre + ".ff_b.0"),
                 "fc2": _sd_lin(sd, pre + ".ff_b.2")},
    }


def _sd_single_block(sd, pre, s):
    return {
        "norm": _sd_lin(sd, pre + ".norm.linear"),
        "to_qkv_mlp": _sd_lin(sd, pre + ".to_qkv_mlp"),
        "norm_q": _sd_vec(sd, pre + ".norm_q_a") * s,
        "norm_k": _sd_vec(sd, pre + ".norm_k_a"),
        "proj_out": _sd_lin(sd, pre + ".proj_out"),
    }


def _sd_stack(items):
    import numpy as _np

    return jax.tree.map(lambda *xs: _np.stack(xs), *items)


def convert_flux_dit_state_dict(sd: Dict[str, Any], cfg: FluxDiTConfig,
                                dtype=None, prescale: bool = False):
    """Consumes the reference FluxDiT module naming (what
    ``FluxDiTStateDictConverter`` emits / ``FluxDiT.state_dict()``).

    ``prescale``: fold softmax scale·log2e into every q-norm gamma so the
    forward can run ``prescaled=True`` (exactly free; see module doc)."""
    s = (cfg.head_dim ** -0.5) * _LOG2E if prescale else 1.0
    params = {
        "time_embedder": _sd_mlp(sd, "time_embedder.timestep_embedder"),
        "pooled_text_embedder": _sd_mlp(sd, "pooled_text_embedder"),
        "context_embedder": _sd_lin(sd, "context_embedder"),
        "x_embedder": _sd_lin(sd, "x_embedder"),
        "double_blocks": _sd_stack(
            [_sd_double_block(sd, f"blocks.{i}", s)
             for i in range(cfg.num_double_blocks)]),
        "single_blocks": _sd_stack(
            [_sd_single_block(sd, f"single_blocks.{i}", s)
             for i in range(cfg.num_single_blocks)]),
        "final_norm_out": _sd_lin(sd, "final_norm_out.linear"),
        "final_proj_out": _sd_lin(sd, "final_proj_out"),
    }
    if cfg.guidance_embed:
        params["guidance_embedder"] = _sd_mlp(
            sd, "guidance_embedder.timestep_embedder")
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)


# BFL checkpoint naming -> reference module naming (port of the rename
# tables in the reference FluxDiTStateDictConverter,
# utils/state_dict_converters/flux_dit.py:17-91 — pure key-mapping data).
_BFL_TOP = {
    "time_in.in_layer": "time_embedder.timestep_embedder.0",
    "time_in.out_layer": "time_embedder.timestep_embedder.2",
    "txt_in": "context_embedder",
    "vector_in.in_layer": "pooled_text_embedder.0",
    "vector_in.out_layer": "pooled_text_embedder.2",
    "final_layer.linear": "final_proj_out",
    "guidance_in.in_layer": "guidance_embedder.timestep_embedder.0",
    "guidance_in.out_layer": "guidance_embedder.timestep_embedder.2",
    "img_in": "x_embedder",
    "final_layer.adaLN_modulation.1": "final_norm_out.linear",
}
_BFL_DOUBLE = {
    "img_attn.norm.key_norm.scale": "attn.norm_k_a.weight",
    "img_attn.norm.query_norm.scale": "attn.norm_q_a.weight",
    "img_attn.proj": "attn.a_to_out",
    "img_attn.qkv": "attn.a_to_qkv",
    "img_mlp.0": "ff_a.0",
    "img_mlp.2": "ff_a.2",
    "img_mod.lin": "norm1_a.linear",
    "txt_attn.norm.key_norm.scale": "attn.norm_k_b.weight",
    "txt_attn.norm.query_norm.scale": "attn.norm_q_b.weight",
    "txt_attn.proj": "attn.b_to_out",
    "txt_attn.qkv": "attn.b_to_qkv",
    "txt_mlp.0": "ff_b.0",
    "txt_mlp.2": "ff_b.2",
    "txt_mod.lin": "norm1_b.linear",
}
_BFL_SINGLE = {
    "linear1": "to_qkv_mlp",
    "linear2": "proj_out",
    "modulation.lin": "norm.linear",
    "norm.key_norm.scale": "norm_k_a.weight",
    "norm.query_norm.scale": "norm_q_a.weight",
}


def normalize_flux_dit_source(sd: Dict[str, Any]) -> Dict[str, Any]:
    """BFL-format FLUX checkpoints (flux1-dev.safetensors) -> the reference
    module naming that :func:`convert_flux_dit_state_dict` consumes.
    Passes already-normalized dicts through untouched."""
    if not any(k.startswith(("double_blocks.", "model.diffusion_model."))
               for k in sd):
        return sd
    out = {}
    for name, v in sd.items():
        if name.startswith("model.diffusion_model."):
            name = name[len("model.diffusion_model."):]
        parts = name.split(".")
        stem, leaf = ".".join(parts[:-1]), parts[-1]
        if stem in _BFL_TOP:
            out[f"{_BFL_TOP[stem]}.{leaf}"] = v
        elif parts[0] == "double_blocks":
            suf = ".".join(parts[2:])
            if suf in _BFL_DOUBLE:  # norm scales map whole-key
                out[f"blocks.{parts[1]}.{_BFL_DOUBLE[suf]}"] = v
            else:
                sufstem = ".".join(parts[2:-1])
                out[f"blocks.{parts[1]}.{_BFL_DOUBLE[sufstem]}.{leaf}"] = v
        elif parts[0] == "single_blocks":
            suf = ".".join(parts[2:])
            if suf in _BFL_SINGLE:
                out[f"single_blocks.{parts[1]}.{_BFL_SINGLE[suf]}"] = v
            else:
                sufstem = ".".join(parts[2:-1])
                if sufstem in _BFL_SINGLE:
                    out[f"single_blocks.{parts[1]}.{_BFL_SINGLE[sufstem]}.{leaf}"] = v
    return out
