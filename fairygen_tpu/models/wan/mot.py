"""MotWanModel (VAP — "video as prompt") mixture-of-transformers side branch.

Port of ``animation/diffsynth/models/wan_video_mot.py``: at each mapped main
layer, the main tokens and the reference-video tokens attend JOINTLY (one
attention over the concatenated sequence, reference mot.py:56-61), with the
mot branch carrying its own modulation/norms/FFN and a negative-start frame
RoPE (frames −f..−1, mot.py:144-163) so reference frames sit "before" the
generated clip in rotary time.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.norms import layer_norm, modulate, rms_norm
from ...ops.rope import rope_apply
from .dit import (
    WanDiTConfig,
    _apply_dense,
    _gelu_tanh,
    _cross_attention,
    img_embedding,
    text_embedding,
    time_embedding,
)


@dataclasses.dataclass(frozen=True)
class MotConfig:
    mot_layers: Tuple[int, ...] = (0, 4, 8, 12, 16, 20, 24, 28, 32, 36)
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    has_image_input: bool = True
    dim: int = 5120
    num_heads: int = 40
    ffn_dim: int = 13824
    freq_dim: int = 256
    text_dim: int = 4096
    in_dim: int = 36
    eps: float = 1e-6

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    def dit_cfg(self) -> WanDiTConfig:
        return WanDiTConfig(
            dim=self.dim, in_dim=self.in_dim, ffn_dim=self.ffn_dim,
            out_dim=self.in_dim, text_dim=self.text_dim, freq_dim=self.freq_dim,
            eps=self.eps, patch_size=self.patch_size, num_heads=self.num_heads,
            num_layers=len(self.mot_layers), has_image_input=self.has_image_input,
        )


def build_freqs_grid_mot(head_dim: int, f: int, h: int, w: int) -> jnp.ndarray:
    """(cos, sin) grid with frame positions −f..−1 (mot.py:144-163)."""
    d_f = head_dim - 2 * (head_dim // 3)
    d_hw = head_dim // 3
    inv = lambda dim: 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    ang_f = np.outer(np.arange(-f, 0, dtype=np.float64), inv(d_f))
    ang_h = np.outer(np.arange(h, dtype=np.float64), inv(d_hw))
    ang_w = np.outer(np.arange(w, dtype=np.float64), inv(d_hw))
    gf = np.broadcast_to(ang_f[:, None, None, :], (f, h, w, ang_f.shape[1]))
    gh = np.broadcast_to(ang_h[None, :, None, :], (f, h, w, ang_h.shape[1]))
    gw = np.broadcast_to(ang_w[None, None, :, :], (f, h, w, ang_w.shape[1]))
    grid = np.concatenate([gf, gh, gw], axis=-1).reshape(f * h * w, -1)
    return jnp.asarray(np.stack([np.cos(grid), np.sin(grid)]).astype(np.float32))


def mot_joint_block(wan_p, mot_p, x, ctx, t_mod, freqs, x_mot, ctx_mot,
                    t_mod_mot, freqs_mot, cfg: MotConfig):
    """MotWanAttentionBlock.forward (mot.py:30-90).

    t_mod / t_mod_mot: (B, 1, 6, D). Returns (x, x_mot)."""
    dit_cfg = cfg.dit_cfg()
    n, hd = cfg.num_heads, cfg.head_dim
    b, s, d = x.shape
    s_mot = x_mot.shape[1]

    mod = (wan_p["modulation"][None, None].astype(jnp.float32) + t_mod.astype(jnp.float32)).astype(x.dtype)
    s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = [mod[:, :, i] for i in range(6)]
    mod_m = (mot_p["modulation"][None, None].astype(jnp.float32) + t_mod_mot.astype(jnp.float32)).astype(x.dtype)
    s_msa_m, sc_msa_m, g_msa_m, c_shift_m, c_scale_m, c_gate_m = [mod_m[:, :, i] for i in range(6)]

    # joint self-attention
    y = modulate(layer_norm(x, cfg.eps), s_msa, sc_msa)
    a1 = wan_p["self_attn"]
    q = rms_norm(_apply_dense(a1["q"], y), a1["norm_q"], cfg.eps).reshape(b, s, n, hd)
    k = rms_norm(_apply_dense(a1["k"], y), a1["norm_k"], cfg.eps).reshape(b, s, n, hd)
    v = _apply_dense(a1["v"], y).reshape(b, s, n, hd)
    q = rope_apply(q, freqs)
    k = rope_apply(k, freqs)

    ym = modulate(layer_norm(x_mot, cfg.eps), s_msa_m, sc_msa_m)
    am = mot_p["self_attn"]
    qm = rms_norm(_apply_dense(am["q"], ym), am["norm_q"], cfg.eps).reshape(b, s_mot, n, hd)
    km = rms_norm(_apply_dense(am["k"], ym), am["norm_k"], cfg.eps).reshape(b, s_mot, n, hd)
    vm = _apply_dense(am["v"], ym).reshape(b, s_mot, n, hd)
    qm = rope_apply(qm, freqs_mot)
    km = rope_apply(km, freqs_mot)

    o = attention(
        jnp.concatenate([q, qm], axis=1),
        jnp.concatenate([k, km], axis=1),
        jnp.concatenate([v, vm], axis=1),
    )
    o_main, o_mot = o[:, :s].reshape(b, s, d), o[:, s:].reshape(b, s_mot, d)
    x = x + g_msa * _apply_dense(a1["o"], o_main)
    x_mot = x_mot + g_msa_m * _apply_dense(am["o"], o_mot)

    # main branch cross-attn + FFN (standard DiT block tail)
    y = layer_norm(x, cfg.eps, wan_p["norm3"]["w"], wan_p["norm3"]["b"])
    x = x + _cross_attention(wan_p["cross_attn"], y, ctx, n, cfg.eps,
                             dit_cfg.has_image_input)
    y = modulate(layer_norm(x, cfg.eps), s_mlp, sc_mlp)
    x = x + g_mlp * _apply_dense(wan_p["ffn"]["fc2"], _gelu_tanh(_apply_dense(wan_p["ffn"]["fc1"], y)))

    # mot branch cross-attn + modulated FFN
    ym = layer_norm(x_mot, cfg.eps, mot_p["norm3"]["w"], mot_p["norm3"]["b"])
    x_mot = x_mot + _cross_attention(mot_p["cross_attn"], ym, ctx_mot, n, cfg.eps,
                                     cfg.has_image_input)
    ym = modulate(layer_norm(x_mot, cfg.eps), c_shift_m, c_scale_m)
    ff = _apply_dense(mot_p["ffn"]["fc2"], _gelu_tanh(_apply_dense(mot_p["ffn"]["fc1"], ym)))
    x_mot = x_mot + c_gate_m * ff
    return x, x_mot


def mot_prepare(params, cfg: MotConfig, vap_hidden_state, context_vap,
                vap_clip_feature=None):
    """Patchify the reference video + embed its (clean) timestep/context —
    model_fn_wan_video's VAP preamble (wan_video.py:1278-1294)."""
    B, C, F, H, W = vap_hidden_state.shape
    pt, ph, pw = cfg.patch_size
    f, h, w = F // pt, H // ph, W // pw
    v = vap_hidden_state.reshape(B, C, f, pt, h, ph, w, pw)
    v = v.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, f * h * w, C * pt * ph * pw)
    x_mot = _apply_dense(params["patch_embedding"], v)

    clean_t = jnp.ones((B,), jnp.float32)
    t_mot, t_mod_mot = time_embedding(params, cfg.dit_cfg(), clean_t)
    t_mod_mot = t_mod_mot[:, None]

    ctx = text_embedding(params, context_vap)
    if cfg.has_image_input and vap_clip_feature is not None:
        clip_emb = img_embedding(params, cfg.dit_cfg(), vap_clip_feature)
        ctx = jnp.concatenate([clip_emb, ctx], axis=1)
    freqs_mot = build_freqs_grid_mot(cfg.head_dim, f, h, w)
    return x_mot, ctx, t_mod_mot, freqs_mot, t_mot


def wan_dit_forward_vap(
    dit_params, dit_cfg: WanDiTConfig, mot_params, cfg: MotConfig,
    latents, timestep, context, *,
    clip_feature=None, y=None,
    vap_hidden_state=None, context_vap=None, vap_clip_feature=None,
):
    """Full denoiser forward with the VAP branch — the per-layer MoT weave
    of model_fn_wan_video (wan_video.py:1278-1346).  Unrolled python loop
    (the joint-attention layers break scan uniformity)."""
    from .dit import dit_block, head_forward, patchify, unpatchify
    from ...ops.rope import build_freqs_grid, precompute_freqs_3d

    t, t_mod = time_embedding(dit_params, dit_cfg, timestep)
    t_mod = t_mod[:, None]
    ctx = text_embedding(dit_params, context)
    x = latents
    if y is not None and dit_cfg.require_vae_embedding:
        x = jnp.concatenate([x, y], axis=1)
    if clip_feature is not None and dit_cfg.require_clip_embedding:
        ctx = jnp.concatenate(
            [img_embedding(dit_params, dit_cfg, clip_feature), ctx], axis=1
        )
    x, grid = patchify(dit_params, dit_cfg, x)
    freqs = build_freqs_grid(precompute_freqs_3d(dit_cfg.head_dim), *grid)

    x_mot, ctx_mot, t_mod_mot, freqs_mot, t_mot = mot_prepare(
        mot_params, cfg, vap_hidden_state, context_vap, vap_clip_feature
    )

    mapping = {layer: n for n, layer in enumerate(cfg.mot_layers)}
    for i in range(dit_cfg.num_layers):
        layer_p = jax.tree.map(lambda a: a[i], dit_params["blocks"])
        if i in mapping:
            mot_p = mot_params["blocks"][mapping[i]]
            x, x_mot = mot_joint_block(
                layer_p, mot_p, x, ctx, t_mod, freqs,
                x_mot, ctx_mot, t_mod_mot, freqs_mot, cfg,
            )
        else:
            x = dit_block(layer_p, x, ctx, t_mod, freqs, dit_cfg)
    # Reference quirk preserved: the VAP preamble overwrites `t`
    # (wan_video.py:1285), so the output head is modulated by the VAP's
    # clean-timestep embedding rather than the denoising timestep.
    x = head_forward(dit_params["head"], x, t_mot, dit_cfg)
    return unpatchify(x, grid, dit_cfg)


def convert_mot_state_dict(sd: Dict[str, np.ndarray], cfg: MotConfig, dtype=None):
    from .dit import convert_dit_state_dict

    # the block stack + embeds share the WanModel layout; reuse its converter
    # on a per-layer basis (blocks are a ModuleList over mot_layers)
    def lw(name):
        p = {"w": np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = np.asarray(sd[name + ".bias"])
        return p

    def g(name):
        return np.asarray(sd[name])

    def attn(pre, img=False):
        p = {"q": lw(pre + ".q"), "k": lw(pre + ".k"), "v": lw(pre + ".v"),
             "o": lw(pre + ".o"),
             "norm_q": g(pre + ".norm_q.weight"), "norm_k": g(pre + ".norm_k.weight")}
        if img:
            p["k_img"] = lw(pre + ".k_img")
            p["v_img"] = lw(pre + ".v_img")
            p["norm_k_img"] = g(pre + ".norm_k_img.weight")
        return p

    D = cfg.dim
    pe = g("patch_embedding.weight")
    blocks = []
    for i in range(len(cfg.mot_layers)):
        pre = f"blocks.{i}"
        blocks.append({
            "self_attn": attn(pre + ".self_attn"),
            "cross_attn": attn(pre + ".cross_attn", cfg.has_image_input),
            "norm3": {"w": g(pre + ".norm3.weight"), "b": g(pre + ".norm3.bias")},
            "ffn": {"fc1": lw(pre + ".ffn.0"), "fc2": lw(pre + ".ffn.2")},
            "modulation": g(pre + ".modulation").reshape(6, D),
        })
    params: Dict[str, Any] = {
        "patch_embedding": {
            "w": pe.transpose(1, 2, 3, 4, 0).reshape(-1, D),
            "b": g("patch_embedding.bias"),
        },
        "text_embed": {"fc1": lw("text_embedding.0"), "fc2": lw("text_embedding.2")},
        "time_embed": {"fc1": lw("time_embedding.0"), "fc2": lw("time_embedding.2")},
        "time_proj": lw("time_projection.1"),
        "blocks": blocks,
    }
    if cfg.has_image_input:
        params["img_emb"] = {
            "norm1": {"w": g("img_emb.proj.0.weight"), "b": g("img_emb.proj.0.bias")},
            "fc1": lw("img_emb.proj.1"),
            "fc2": lw("img_emb.proj.3"),
            "norm2": {"w": g("img_emb.proj.4.weight"), "b": g("img_emb.proj.4.bias")},
        }
        if "img_emb.emb_pos" in sd:
            params["img_emb"]["pos"] = g("img_emb.emb_pos")
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
    return jax.tree.map(cast, params)
