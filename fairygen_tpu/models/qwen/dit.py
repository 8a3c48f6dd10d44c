"""Qwen-Image MMDiT — functional JAX port, TPU-first.

Mirrors the reference ``QwenImageDiT``
(``animation/diffsynth/models/qwen_image_dit.py:551-684``; real driver
``pipelines/qwen_image.py:698-795`` ``model_fn_qwen_image``): 60 joint
text/image blocks at dim 3072 / 24 heads / head_dim 128, 2x2-packed
16-channel latents, Qwen2.5-VL text conditioning (RMS-normed 3584-dim),
centered ("scale_rope") 3-axis RoPE with negative-index halves and text
positions offset past the image grid, per-stream 6-way modulation from a
diffusers-format timestep embedding (sigma·1000 scale), and optional
extra packed image entries (Qwen-Image-Edit reference latents) that
extend the RoPE frame axis.

TPU-native: one ``lax.scan`` over stacked block params, host-side fp64
RoPE tables baked as fp32 constants, fp32 norms/softmax, optional remat.
EliGen entity masks (``attn_bias``) and blockwise ControlNet
(``controlnet_residuals``) are supported — see ``tests/test_qwen_extras.py``
and ``tests/test_qwen_controlnet.py``; fp8 / layer3d rope are not ported.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.rope import apply_interleaved_rope
from ...ops.norms import layer_norm, rms_norm
from ...ops.fused_norms import ln_modulate


@dataclasses.dataclass(frozen=True)
class QwenImageDiTConfig:
    dim: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    in_dim: int = 64  # 16ch latents packed 2x2
    txt_dim: int = 3584  # Qwen2.5-VL hidden size
    time_freq_dim: int = 256
    num_layers: int = 60
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10000
    eps: float = 1e-6

    @staticmethod
    def qwen_image() -> "QwenImageDiTConfig":
        return QwenImageDiTConfig()

    @staticmethod
    def tiny(**over) -> "QwenImageDiTConfig":
        base = dict(dim=96, num_heads=4, head_dim=24, in_dim=16, txt_dim=48,
                    time_freq_dim=32, num_layers=2, axes_dim=(4, 10, 10))
        base.update(over)
        return QwenImageDiTConfig(**base)


def _dense(p, x):
    if "w_int8" in p:  # W8A8 opt-in (ops/quant.quantize_blocks_tree)
        from ...ops.quant import quantized_dense

        return quantized_dense(p, x)
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _timestep_sinusoid(t, dim: int, scale: float = 1000.0):
    """diffusers get_timestep_embedding, flip_sin_to_cos, shift 0, with the
    Qwen scale=1000 (reference QwenImageDiT passes sigma = t/1000 and the
    embedder multiplies the angle back, general_modules.py:80-101)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _axis_cos_sin(pos: np.ndarray, d: int, theta: int):
    omega = 1.0 / theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    ang = np.einsum("n,d->nd", pos.astype(np.float64), omega)
    return np.cos(ang), np.sin(ang)


def _centered(n: int) -> np.ndarray:
    return np.concatenate([np.arange(-(n - n // 2), 0), np.arange(0, n // 2)])


def qwen_txt_rope(txt_len: int, max_vid: int, axes_dim, theta: int):
    """Text rope rows: positions start past the largest image half-extent
    (QwenEmbedRope.forward, qwen_image_dit.py:161-162)."""
    tpos = np.arange(max_vid, max_vid + txt_len)
    tc, ts = [], []
    for d in axes_dim:
        c, s = _axis_cos_sin(tpos, d, theta)
        tc.append(c)
        ts.append(s)
    return (np.concatenate(tc, -1).astype(np.float32),
            np.concatenate(ts, -1).astype(np.float32))


def qwen_rope_tables(img_shapes: Sequence[Tuple[int, int, int]],
                     txt_len: int, axes_dim, theta: int,
                     interpolate: bool = False):
    """(img_cos, img_sin, txt_cos, txt_sin) fp32 — centered "scale_rope"
    grids per image entry (reference QwenEmbedRope.forward with
    scale_rope=True, qwen_image_dit.py:123-165): height/width positions
    run [-(n - n//2), ..., n//2 - 1]; frame positions offset by the entry
    index; text positions start past max(h//2, w//2) over entries.

    ``interpolate``: Edit entries (idx>0) sample the FIRST entry's
    spatial positions at their own resolution instead of their own
    centered grid (``forward_sampling``, :168-215 —
    edit_rope_interpolation)."""
    cos_parts, sin_parts = [], []
    max_vid = 0
    for idx, (f, h, w) in enumerate(img_shapes):
        ax = []
        fpos = np.arange(idx, idx + f)
        if interpolate and idx > 0:
            h0, w0 = img_shapes[0][1], img_shapes[0][2]
            hpos = _centered(h0)[np.linspace(0, h0 - 1, h).astype(int)]
            wpos = _centered(w0)[np.linspace(0, w0 - 1, w).astype(int)]
        else:
            hpos = _centered(h)
            wpos = _centered(w)
        for d, pos, shape in (
            (axes_dim[0], fpos, (f, 1, 1)),
            (axes_dim[1], hpos, (1, h, 1)),
            (axes_dim[2], wpos, (1, 1, w)),
        ):
            c, s = _axis_cos_sin(pos, d, theta)
            c = np.broadcast_to(c.reshape(*shape, -1), (f, h, w, d // 2))
            s = np.broadcast_to(s.reshape(*shape, -1), (f, h, w, d // 2))
            ax.append((c, s))
        cos_parts.append(np.concatenate([a[0] for a in ax], -1).reshape(
            f * h * w, -1))
        sin_parts.append(np.concatenate([a[1] for a in ax], -1).reshape(
            f * h * w, -1))
        max_vid = max(max_vid, h // 2, w // 2)
    img_cos = np.concatenate(cos_parts, 0).astype(np.float32)
    img_sin = np.concatenate(sin_parts, 0).astype(np.float32)
    txt_cos, txt_sin = qwen_txt_rope(txt_len, max_vid, axes_dim, theta)
    return img_cos, img_sin, txt_cos, txt_sin


_apply_rope = apply_interleaved_rope


def _heads(x, n):
    b, l, d = x.shape
    return x.reshape(b, l, n, d // n)


def _modulate(x, mod, eps, index=None):
    """mod (B, 3*dim) -> shift, scale, gate (reference _modulate,
    qwen_image_dit.py:470-501).  With ``index`` (B, L) the mod batch is
    doubled (t-conditioning rows then zero-t rows) and each token selects
    its row — the Edit-Plus ``zero_cond_t`` path."""
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    if index is not None:
        bh = shift.shape[0] // 2
        sel = (index[..., None] != 0)
        shift = jnp.where(sel, shift[bh:, None], shift[:bh, None])
        scale = jnp.where(sel, scale[bh:, None], scale[:bh, None])
        gate = jnp.where(sel, gate[bh:, None], gate[:bh, None])
    else:
        return (ln_modulate(x, shift[:, None], scale[:, None], eps),
                gate[:, None])
    return layer_norm(x, eps) * (1 + scale) + shift, gate


def qwen_block(p, img, txt, cond, rope, cfg: QwenImageDiTConfig,
               attn_bias=None, modulate_index=None):
    """QwenImageTransformerBlock (qwen_image_dit.py:434-548)."""
    img_cos, img_sin, txt_cos, txt_sin = rope
    n = cfg.num_heads
    img_mod = _dense(p["img_mod"], jax.nn.silu(cond))
    txt_cond = cond[:1] if modulate_index is not None else cond
    txt_mod = _dense(p["txt_mod"], jax.nn.silu(txt_cond))
    im_attn, im_mlp = jnp.split(img_mod, 2, axis=-1)
    tx_attn, tx_mlp = jnp.split(txt_mod, 2, axis=-1)

    a = p["attn"]
    yi, gate_i = _modulate(img, im_attn, cfg.eps, modulate_index)
    yt, gate_t = _modulate(txt, tx_attn, cfg.eps)
    from ...ops.fused_qk import fused_qk_attention_joint, fused_qk_enabled

    b, lt = txt.shape[:2]
    if attn_bias is None and cfg.head_dim == 128 and fused_qk_enabled():
        # fused two-stream per-head rms -> rope -> head-major prep
        # (ops/fused_qk joint path); EliGen-style bias keeps legacy
        o_t, o_i = fused_qk_attention_joint(
            _dense(a["add_q"], yt), _dense(a["add_k"], yt),
            _heads(_dense(a["add_v"], yt), n),
            _dense(a["to_q"], yi), _dense(a["to_k"], yi),
            _heads(_dense(a["to_v"], yi), n),
            a["norm_added_q"], a["norm_added_k"], a["norm_q"], a["norm_k"],
            txt_cos, txt_sin, img_cos, img_sin, n, cfg.eps, True)
        o_t = o_t.reshape(b, lt, n * cfg.head_dim)
        o_i = o_i.reshape(b, img.shape[1], n * cfg.head_dim)
    else:
        qi = rms_norm(_heads(_dense(a["to_q"], yi), n), a["norm_q"], cfg.eps)
        ki = rms_norm(_heads(_dense(a["to_k"], yi), n), a["norm_k"], cfg.eps)
        vi = _heads(_dense(a["to_v"], yi), n)
        qt = rms_norm(_heads(_dense(a["add_q"], yt), n), a["norm_added_q"], cfg.eps)
        kt = rms_norm(_heads(_dense(a["add_k"], yt), n), a["norm_added_k"], cfg.eps)
        vt = _heads(_dense(a["add_v"], yt), n)
        qi, ki = _apply_rope(qi, img_cos, img_sin), _apply_rope(ki, img_cos, img_sin)
        qt, kt = _apply_rope(qt, txt_cos, txt_sin), _apply_rope(kt, txt_cos, txt_sin)
        q = jnp.concatenate([qt, qi], axis=1)
        k = jnp.concatenate([kt, ki], axis=1)
        v = jnp.concatenate([vt, vi], axis=1)
        # q/k rms-normed -> bounded logits (max-free pallas softmax)
        o = attention(q, k, v, bias=attn_bias, bounded_logits=True)
        o = o.reshape(b, o.shape[1], n * cfg.head_dim)
        o_t, o_i = o[:, :lt], o[:, lt:]
    txt = txt + gate_t * _dense(a["to_add_out"], o_t)
    img = img + gate_i * _dense(a["to_out"], o_i)

    yi, gate_i = _modulate(img, im_mlp, cfg.eps, modulate_index)
    yt, gate_t = _modulate(txt, tx_mlp, cfg.eps)

    def ff(pp, x):
        h = _dense(pp["fc1"], x)
        h = h * jax.nn.sigmoid(1.702 * h)  # ApproximateGELU
        return _dense(pp["fc2"], h)

    img = img + gate_i * ff(p["img_mlp"], yi)
    txt = txt + gate_t * ff(p["txt_mlp"], yt)
    return img, txt


def patchify(latents):
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // 2, 2, w // 2, 2)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(
        b, (h // 2) * (w // 2), c * 4)


def unpatchify(x, height, width):
    b, _, cd = x.shape
    c = cd // 4
    x = x.reshape(b, height // 2, width // 2, c, 2, 2)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, c, height, width)


def qwen_image_dit_forward(
    params,
    cfg: QwenImageDiTConfig,
    latents,  # (B, 16, H, W)
    timestep,  # (B,) in [0, 1000] (divided by 1000 inside, like model_fn)
    prompt_emb,  # (B, Lt, txt_dim) — UNPADDED (per-sample lengths; the
    # reference also runs posi/nega separately at their true lengths)
    *,
    edit_latents: Optional[List] = None,  # list of (B, 16, He, We)
    remat: bool = False,
    blockwise_controlnet=(),  # ((blocks_stacked, cond_tokens, scale), ...)
    layered: bool = False,  # latents (N, 16, H, W) = N image layers
    zero_cond_t: bool = False,  # Edit-Plus: cond streams modulate at t=0
    entity_prompt_embs: Optional[List] = None,  # EliGen: [(1, L_i, D_t)]
    entity_masks=None,  # EliGen: (1, N, 1, H, W) binary latent-res masks
    edit_rope_interpolation: bool = False,
):
    """model_fn_qwen_image core path (reference qwen_image.py:698-830):
    t2i, Qwen-Image-Edit reference latents, blockwise-ControlNet per-block
    residual adds (:797-805, image tokens only), layered generation
    (N latent layers sharing the rope frame axis), zero_cond_t per-token
    modulation, EliGen entity masks, and edit rope interpolation."""
    b, c, h, w = latents.shape
    dtype = latents.dtype

    n_layers = b if layered else 1
    img_shapes = [(1, h // 2, w // 2)] * n_layers
    x = patchify(latents)
    if layered:  # layers ride the token axis (reference "(B N) C ...")
        x = x.reshape(1, -1, c * 4)
    if edit_latents:
        for e in edit_latents:
            img_shapes.append((1, e.shape[2] // 2, e.shape[3] // 2))
            x = jnp.concatenate([x, patchify(e.astype(dtype))], axis=1)

    rope = tuple(jnp.asarray(t) for t in qwen_rope_tables(
        img_shapes, prompt_emb.shape[1], cfg.axes_dim, cfg.theta,
        interpolate=edit_rope_interpolation))

    x = _dense(params["img_in"], x)

    attn_bias = None
    if entity_prompt_embs is not None:
        txt, rope, attn_bias = _qwen_entity_inputs(
            params, cfg, entity_prompt_embs, prompt_emb.astype(dtype),
            entity_masks, img_shapes, x.shape[1], dtype)
    else:
        txt = _dense(params["txt_in"],
                     rms_norm(prompt_emb.astype(dtype), params["txt_norm"],
                              cfg.eps))

    ts = timestep.astype(jnp.float32) / 1000.0
    modulate_index = None
    if zero_cond_t:
        # main-entry tokens modulate at t, every extra stream at t=0
        # (model_fn_qwen_image:753-760)
        ts = jnp.concatenate([ts, ts * 0.0])
        n_main = img_shapes[0][0] * img_shapes[0][1] * img_shapes[0][2]
        modulate_index = jnp.asarray(
            np.r_[np.zeros(n_main, np.int32),
                  np.ones(x.shape[1] - n_main, np.int32)][None])
    cond = _timestep_sinusoid(ts, cfg.time_freq_dim)
    cond = _dense(params["time_embed"]["fc2"], jax.nn.silu(
        _dense(params["time_embed"]["fc1"], cond.astype(dtype))))

    n_img = n_layers * (h // 2) * (w // 2)

    def body(carry, xs):
        p, cn_blocks = xs
        img, tx = carry
        img, tx = qwen_block(p, img, tx, cond, rope, cfg, attn_bias,
                             modulate_index)
        if cn_blocks:
            from .controlnet import qwen_blockwise_block

            sl = img[:, :n_img]
            r = 0.0
            for cb, (_, cn_cond, scale) in zip(cn_blocks,
                                               blockwise_controlnet):
                r = r + qwen_blockwise_block(cb, sl, cn_cond, cfg.eps) \
                    * jnp.asarray(scale, img.dtype)
            img = img.at[:, :n_img].add(r)
        return (img, tx), None

    if remat:
        body = jax.checkpoint(body)
    cn_xs = tuple(e[0] for e in blockwise_controlnet)
    (x, txt), _ = jax.lax.scan(body, (x, txt), (params["blocks"], cn_xs))

    # AdaLayerNorm(single=True): scale FIRST (general_modules.py:133-136)
    final_cond = cond[:1] if zero_cond_t else cond
    emb = _dense(params["norm_out"], jax.nn.silu(final_cond))
    scale, shift = jnp.split(emb[:, None, :], 2, axis=-1)
    x = ln_modulate(x, shift, scale, cfg.eps)
    x = _dense(params["proj_out"], x)
    x = x[:, :n_img]
    if layered:
        x = x.reshape(n_layers, (h // 2) * (w // 2), c * 4)
    return unpatchify(x, h, w)


def _qwen_entity_inputs(params, cfg, entity_embs, prompt_emb, entity_masks,
                        img_shapes, n_img_total, dtype):
    """EliGen inputs (reference QwenImageDiT.process_entity_masks,
    qwen_image_dit.py:585-650): entity prompts (their own lengths) before
    the global prompt, per-entity text rope tables, and the regional
    attention bias over the [txt; img] layout."""
    from ..flux.dit import patchify as patchify2d

    embs = list(entity_embs) + [prompt_emb]
    txt = jnp.concatenate(
        [_dense(params["txt_in"],
                rms_norm(e.astype(dtype), params["txt_norm"], cfg.eps))
         for e in embs], axis=1)

    max_vid = max(max(h // 2, w // 2) for _, h, w in img_shapes)
    tcs, tss = [], []
    for e in embs:
        tc, ts_ = qwen_txt_rope(e.shape[1], max_vid, cfg.axes_dim,
                                cfg.theta)
        tcs.append(tc)
        tss.append(ts_)
    img_cos, img_sin, _, _ = qwen_rope_tables(img_shapes, 1, cfg.axes_dim,
                                              cfg.theta)
    rope = (jnp.asarray(img_cos), jnp.asarray(img_sin),
            jnp.asarray(np.concatenate(tcs, 0)),
            jnp.asarray(np.concatenate(tss, 0)))

    # regional bias: entity prompt i <-> its masked image tokens (tiled
    # across extra image streams), prompts never cross-attend
    n_ent = entity_masks.shape[1]
    seq_lens = [e.shape[1] for e in embs]
    n_txt = sum(seq_lens)
    n_main = img_shapes[0][0] * img_shapes[0][1] * img_shapes[0][2]
    masks = [jnp.sum(patchify2d(entity_masks[:, i].astype(jnp.float32)),
                     -1) > 0 for i in range(n_ent)]
    masks.append(jnp.ones_like(masks[0]))
    reps = n_img_total // n_main
    allow = jnp.ones((1, n_txt + n_img_total, n_txt + n_img_total), bool)
    start = 0
    for ln_, m in zip(seq_lens, masks):
        row = jnp.tile(jnp.broadcast_to(m[:, None, :], (1, ln_, n_main)),
                       (1, 1, reps))
        allow = allow.at[:, start:start + ln_, n_txt:].set(row)
        allow = allow.at[:, n_txt:, start:start + ln_].set(
            jnp.swapaxes(row, 1, 2))
        start += ln_
    # prompt-prompt: block diagonal only
    pp = jnp.zeros((n_txt, n_txt), bool)
    start = 0
    for ln_ in seq_lens:
        pp = pp.at[start:start + ln_, start:start + ln_].set(True)
        start += ln_
    allow = allow.at[:, :n_txt, :n_txt].set(pp[None])
    bias = jnp.where(allow, 0.0, -1e30).astype(jnp.float32)[:, None]
    return txt, rope, bias


# ------------------------------------------------------------------ params
def _init_dense(key, din, dout, dtype):
    k1, k2 = jax.random.split(key)
    lim = din ** -0.5
    return {"w": jax.random.uniform(k1, (din, dout), dtype, -lim, lim),
            "b": jax.random.uniform(k2, (dout,), dtype, -lim, lim)}


def init_qwen_image_dit_params(key, cfg: QwenImageDiTConfig,
                               dtype=jnp.float32):
    d = cfg.dim
    keys = iter(jax.random.split(key, 16))

    def block(k):
        ks = iter(jax.random.split(k, 16))
        return {
            "img_mod": _init_dense(next(ks), d, 6 * d, dtype),
            "txt_mod": _init_dense(next(ks), d, 6 * d, dtype),
            "attn": {
                "to_q": _init_dense(next(ks), d, d, dtype),
                "to_k": _init_dense(next(ks), d, d, dtype),
                "to_v": _init_dense(next(ks), d, d, dtype),
                "add_q": _init_dense(next(ks), d, d, dtype),
                "add_k": _init_dense(next(ks), d, d, dtype),
                "add_v": _init_dense(next(ks), d, d, dtype),
                "norm_q": jnp.ones((cfg.head_dim,), dtype),
                "norm_k": jnp.ones((cfg.head_dim,), dtype),
                "norm_added_q": jnp.ones((cfg.head_dim,), dtype),
                "norm_added_k": jnp.ones((cfg.head_dim,), dtype),
                "to_out": _init_dense(next(ks), d, d, dtype),
                "to_add_out": _init_dense(next(ks), d, d, dtype),
            },
            "img_mlp": {"fc1": _init_dense(next(ks), d, 4 * d, dtype),
                        "fc2": _init_dense(next(ks), 4 * d, d, dtype)},
            "txt_mlp": {"fc1": _init_dense(next(ks), d, 4 * d, dtype),
                        "fc2": _init_dense(next(ks), 4 * d, d, dtype)},
        }

    blocks_key = next(keys)
    leaves = [block(jax.random.fold_in(blocks_key, i))
              for i in range(cfg.num_layers)]
    return {
        "img_in": _init_dense(next(keys), cfg.in_dim, d, dtype),
        "txt_in": _init_dense(next(keys), cfg.txt_dim, d, dtype),
        "txt_norm": jnp.ones((cfg.txt_dim,), dtype),
        "time_embed": {
            "fc1": _init_dense(next(keys), cfg.time_freq_dim, d, dtype),
            "fc2": _init_dense(next(keys), d, d, dtype),
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *leaves),
        "norm_out": _init_dense(next(keys), d, 2 * d, dtype),
        "proj_out": _init_dense(next(keys), d, cfg.in_dim, dtype),
    }


# ------------------------------------------------------------------ convert
def convert_qwen_image_dit_state_dict(sd: Dict[str, Any],
                                      cfg: QwenImageDiTConfig, dtype=None):
    """Consumes the reference QwenImageDiT module naming."""
    import numpy as _np

    def lin(name):
        p = {"w": _np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = _np.asarray(sd[name + ".bias"])
        return p

    def vec(name):
        return _np.asarray(sd[name + ".weight"])

    def block(i):
        pre = f"transformer_blocks.{i}"
        return {
            "img_mod": lin(pre + ".img_mod.1"),
            "txt_mod": lin(pre + ".txt_mod.1"),
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
            "img_mlp": {"fc1": lin(pre + ".img_mlp.net.0.proj"),
                        "fc2": lin(pre + ".img_mlp.net.2")},
            "txt_mlp": {"fc1": lin(pre + ".txt_mlp.net.0.proj"),
                        "fc2": lin(pre + ".txt_mlp.net.2")},
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    params = {
        "img_in": lin("img_in"),
        "txt_in": lin("txt_in"),
        "txt_norm": vec("txt_norm"),
        "time_embed": {
            "fc1": lin("time_text_embed.timestep_embedder.linear_1"),
            "fc2": lin("time_text_embed.timestep_embedder.linear_2"),
        },
        "blocks": jax.tree.map(lambda *xs: _np.stack(xs), *blocks),
        "norm_out": lin("norm_out.linear"),
        "proj_out": lin("proj_out"),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)
