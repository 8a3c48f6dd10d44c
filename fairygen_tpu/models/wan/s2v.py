"""WanS2VModel — speech-to-video DiT variant (Wan2.2-S2V) + audio stack.

Port of ``animation/diffsynth/models/wan_video_dit_s2v.py`` and
``models/wav2vec.py``:

  * per-token rope tables assembled from grid specs with fractional
    (linspace-sampled) positions and conjugated negative-time frames
    (rope_precompute, s2v.py:26-82) — carried as (cos, sin) fp32;
  * FramePackMotioner: multi-resolution (1x/2x/4x) patchifications of the
    trailing motion latents with negative-time rope grids (:171-256);
  * CausalAudioEncoder (layer-weighted wav2vec features through a causal
    conv MotionEncoder, :101-168, :321-338) and AudioInjector cross-
    attention at mapped layers with AdaLN (:259-318, :459-482);
  * dual timestep: denoised tokens get t, reference tokens t=0
    (zero_timestep concat, :544-546); trainable 3-way cond-mask embedding;
  * audio bucketing helpers from wav2vec.py (pure numpy).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.attention import attention
from ...ops.norms import layer_norm, modulate, rms_norm
from ...ops.rope import rope_apply
from .dit import (
    WanDiTConfig,
    _apply_dense,
    _cross_attention,
    _gelu_tanh,
    head_forward,
    sinusoidal_embedding_1d,
    text_embedding,
    unpatchify,
)


@dataclasses.dataclass(frozen=True)
class S2VConfig:
    dim: int = 5120
    in_dim: int = 16
    ffn_dim: int = 13824
    out_dim: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    eps: float = 1e-6
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    num_heads: int = 40
    num_layers: int = 40
    cond_dim: int = 16
    audio_dim: int = 1024
    num_audio_token: int = 4
    enable_adain: bool = True
    audio_inject_layers: Tuple[int, ...] = (0, 4, 8, 12, 16, 20, 24, 27, 30, 33, 36, 39)
    zip_frame_buckets: Tuple[int, int, int] = (1, 2, 16)
    motion_channels: int = 16  # FramePackMotioner proj in-channels (s2v.py:175)
    num_audio_layers: int = 25  # wav2vec hidden-state layers

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    def dit_cfg(self) -> WanDiTConfig:
        return WanDiTConfig(
            dim=self.dim, in_dim=self.in_dim, ffn_dim=self.ffn_dim,
            out_dim=self.out_dim, text_dim=self.text_dim, freq_dim=self.freq_dim,
            eps=self.eps, patch_size=self.patch_size, num_heads=self.num_heads,
            num_layers=self.num_layers,
        )


# ------------------------------------------------------------- rope grids
def _freq_parts(head_dim: int, theta: float = 10000.0):
    c = head_dim // 2
    d_f = c - 2 * (c // 3)
    d_hw = c // 3

    def inv(npairs):
        # pair counts -> per-pair inverse frequencies over a dim of 2*npairs
        dim = 2 * npairs
        return 1.0 / (theta ** (np.arange(0, dim, 2)[:npairs] / dim))

    return inv(d_f), inv(d_hw), inv(d_hw)


def rope_grid_angles(grids, head_dim: int) -> np.ndarray:
    """Port of rope_precompute (s2v.py:26-82): list of grid specs
    [(start_fhw, end_fhw, true_fhw), ...] -> per-token complex angles
    (S, head_dim//2) as (angle, conj) pairs encoded by sign.

    Returns fp64 angles; negative-time frames are conjugated (sign flip).
    """
    inv_f, inv_h, inv_w = _freq_parts(head_dim)
    rows = []
    for start, end, true in grids:
        f_o, h_o, w_o = start
        f, h, w = end
        t_f, t_h, t_w = true
        seq_f, seq_h, seq_w = int(f - f_o), int(h - h_o), int(w - w_o)
        if seq_f * seq_h * seq_w <= 0:
            continue
        if f_o >= 0:
            f_sam = np.linspace(f_o, t_f + f_o - 1, seq_f).astype(int)
            conj = False
        else:
            f_sam = np.linspace(-f_o, -t_f - f_o + 1, seq_f).astype(int)
            conj = True
        h_sam = np.linspace(h_o, t_h + h_o - 1, seq_h).astype(int)
        w_sam = np.linspace(w_o, t_w + w_o - 1, seq_w).astype(int)

        ang_f = np.outer(f_sam.astype(np.float64), inv_f)
        if conj:
            ang_f = -ang_f
        ang_h = np.outer(h_sam.astype(np.float64), inv_h)
        ang_w = np.outer(w_sam.astype(np.float64), inv_w)
        gf = np.broadcast_to(ang_f[:, None, None, :], (seq_f, seq_h, seq_w, ang_f.shape[1]))
        gh = np.broadcast_to(ang_h[None, :, None, :], (seq_f, seq_h, seq_w, ang_h.shape[1]))
        gw = np.broadcast_to(ang_w[None, None, :, :], (seq_f, seq_h, seq_w, ang_w.shape[1]))
        rows.append(np.concatenate([gf, gh, gw], -1).reshape(-1, head_dim // 2))
    return np.concatenate(rows, axis=0)


def angles_to_freqs(angles: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(
        np.stack([np.cos(angles), np.sin(angles)]).astype(np.float32)
    )


# ------------------------------------------------------- causal conv pieces
def _causal_conv1d(p, x, stride=1):
    """x (B, T, C); replicate front pad (k-1) — s2v.py:85-98."""
    k = p["w"].shape[0]
    front = jnp.repeat(x[:, :1], k - 1, axis=1)
    x = jnp.concatenate([front, x], axis=1)
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), ((0, 0),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["b"].astype(x.dtype)


def motion_encoder_forward(p, x, num_heads: int, need_global: bool):
    """MotionEncoder_tc — s2v.py:101-168. x (B, T, C_in)."""
    b = x.shape[0]

    def tail(y):
        y = layer_norm(y, 1e-6)
        y = jax.nn.silu(y.astype(jnp.float32)).astype(y.dtype)
        return y

    local = _causal_conv1d(p["conv1_local"], x)  # (B, T, hid/4*heads)
    bt, t, c = local.shape
    local = local.reshape(b, t, num_heads, c // num_heads)
    local = local.transpose(0, 2, 1, 3).reshape(b * num_heads, t, c // num_heads)
    local = tail(local)
    local = tail(_causal_conv1d(p["conv2"], local, stride=2))
    local = tail(_causal_conv1d(p["conv3"], local, stride=2))
    tl = local.shape[1]
    local = local.reshape(b, num_heads, tl, -1).transpose(0, 2, 1, 3)  # b t n c
    pad = jnp.broadcast_to(p["padding_tokens"].astype(local.dtype),
                           (b, tl, 1, local.shape[-1]))
    x_local = jnp.concatenate([local, pad], axis=-2)
    if not need_global:
        return x_local

    g = tail(_causal_conv1d(p["conv1_global"], x))
    g = tail(_causal_conv1d(p["conv2"], g, stride=2))
    g = tail(_causal_conv1d(p["conv3"], g, stride=2))
    g = _apply_dense(p["final_linear"], g)
    g = g.reshape(b, 1, g.shape[1], g.shape[2]).transpose(0, 2, 1, 3)  # b t 1 c
    return g, x_local


def causal_audio_encoder_forward(p, features, num_token: int, need_global: bool):
    """CausalAudioEncoder — s2v.py:321-338. features (B, L, C, T)."""
    w = jax.nn.silu(p["weights"].astype(jnp.float32))  # (1, L, 1, 1)
    w = w / w.sum(axis=1, keepdims=True)
    feat = (features.astype(jnp.float32) * w).sum(axis=1)  # (B, C, T)
    feat = feat.transpose(0, 2, 1).astype(features.dtype)  # (B, T, C)
    return motion_encoder_forward(p["encoder"], feat, num_token, need_global)


# ------------------------------------------------------------ frame packing
def _patchify3d(p, x, patch):
    """Conv3d(stride=kernel) as matmul; x (B, C, F, H, W) -> (B, S, D)."""
    B, C, F, H, W = x.shape
    pt, ph, pw = patch
    f, h, w = F // pt, H // ph, W // pw
    v = x.reshape(B, C, f, pt, h, ph, w, pw)
    v = v.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, f * h * w, C * pt * ph * pw)
    return _apply_dense(p, v), (f, h, w)


def frame_packer_forward(params, cfg: S2VConfig, motion_latents,
                         drop_motion_frames: bool = False):
    """FramePackMotioner (add_last_motion=2, drop_mode='padd'/'drop' full
    buckets) — s2v.py:171-256.  motion_latents (B, 16, T, H, W)."""
    if drop_motion_frames:
        b, _, _, H, W = motion_latents.shape
        return (jnp.zeros((b, 0, cfg.dim), motion_latents.dtype),
                np.zeros((0, cfg.head_dim // 2)))
    zb = cfg.zip_frame_buckets
    total = sum(zb)
    b, c, t, H, W = motion_latents.shape
    padd = jnp.zeros((b, c, total, H, W), motion_latents.dtype)
    overlap = min(total, t)
    padd = padd.at[:, :, -overlap:].set(motion_latents[:, :, -overlap:])
    # trailing `total` frames split [16, 2, 1] (reversed buckets)
    lat_4x = padd[:, :, : zb[2]]
    lat_2x = padd[:, :, zb[2]: zb[2] + zb[1]]
    lat_post = padd[:, :, zb[2] + zb[1]:]
    post, _ = _patchify3d(params["proj"], lat_post, (1, 2, 2))
    two, _ = _patchify3d(params["proj_2x"], lat_2x, (2, 4, 4))
    four, _ = _patchify3d(params["proj_4x"], lat_4x, (4, 8, 8))
    mot = jnp.concatenate([post, two, four], axis=1)

    grids = [
        ((-zb[0], 0, 0), (-zb[0] + zb[0], H // 2, W // 2), (zb[0], H // 2, W // 2)),
        ((-(zb[0] + zb[1]), 0, 0),
         (-(zb[0] + zb[1]) + zb[1] // 2, H // 4, W // 4),
         (zb[1], H // 2, W // 2)),
        ((-(zb[0] + zb[1] + zb[2]), 0, 0),
         (-(zb[0] + zb[1] + zb[2]) + zb[2] // 4, H // 8, W // 8),
         (zb[2], H // 2, W // 2)),
    ]
    angles = rope_grid_angles(grids, cfg.head_dim)
    return mot, angles


# ------------------------------------------------------------------- blocks
def s2v_dit_block(p, x, ctx, t_mod2, seq_len_x, freqs, cfg: S2VConfig,
                  freqs_full=None):
    """WanS2VDiTBlock — s2v.py:341-356. t_mod2: (2, 6, D) (denoise t, zero t);
    first seq_len_x tokens use row 0, the rest row 1.  freqs_full: optional
    full-width rope tables for the fused q/k prep (built once per forward)."""
    s_total = x.shape[1]
    mod = p["modulation"].astype(jnp.float32)[None, :, None, None] + \
        t_mod2.astype(jnp.float32).reshape(2, 1, 6, 1, cfg.dim).transpose(1, 2, 0, 3, 4)
    # mod: (1, 6, 2, 1, D)
    parts = []
    for i in range(6):
        m = jnp.concatenate(
            [jnp.broadcast_to(mod[:, i, 0], (1, seq_len_x, cfg.dim)),
             jnp.broadcast_to(mod[:, i, 1], (1, s_total - seq_len_x, cfg.dim))],
            axis=1,
        ).astype(x.dtype)
        parts.append(m)
    s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = parts

    y = modulate(layer_norm(x, cfg.eps), s_msa, sc_msa)
    a = p["self_attn"]
    b, s, d = y.shape
    n, hd = cfg.num_heads, cfg.head_dim
    if freqs_full is not None and hd == 128:
        # fused rms->rope->head-major prep (ops/fused_qk); scale*log2e
        # folds into the q gamma (the flash prescale fold); off-TPU the
        # entry falls back to the legacy reference chain
        from ...ops.fused_qk import fused_qk_attention

        c = jnp.asarray(hd**-0.5 * 1.4426950408889634, jnp.float32)
        gq = (a["norm_q"].astype(jnp.float32) * c).astype(a["norm_q"].dtype)
        o = fused_qk_attention(
            _apply_dense(a["q"], y), _apply_dense(a["k"], y),
            _apply_dense(a["v"], y).reshape(b, s, n, hd), gq, a["norm_k"],
            freqs, freqs_full, n, cfg.eps).reshape(b, s, d)
    else:
        q = rms_norm(_apply_dense(a["q"], y), a["norm_q"], cfg.eps).reshape(b, s, n, hd)
        k = rms_norm(_apply_dense(a["k"], y), a["norm_k"], cfg.eps).reshape(b, s, n, hd)
        v = _apply_dense(a["v"], y).reshape(b, s, n, hd)
        q = rope_apply(q, freqs)
        k = rope_apply(k, freqs)
        o = attention(q, k, v, bounded_logits=True).reshape(b, s, d)
    x = x + g_msa * _apply_dense(a["o"], o)
    y = layer_norm(x, cfg.eps, p["norm3"]["w"], p["norm3"]["b"])
    x = x + _cross_attention(p["cross_attn"], y, ctx, n, cfg.eps, False)
    y = modulate(layer_norm(x, cfg.eps), s_mlp, sc_mlp)
    x = x + g_mlp * _apply_dense(p["ffn"]["fc2"], _gelu_tanh(_apply_dense(p["ffn"]["fc1"], y)))
    return x


def _ada_layer_norm(p, x, temb, eps=1e-5):
    """AdaLayerNorm — s2v.py:259-278."""
    t = _apply_dense(p["linear"], jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
    shift, scale = jnp.split(t, 2, axis=-1)
    return layer_norm(x, eps) * (1 + scale[:, None]) + shift[:, None]


def _audio_inject(params, cfg: S2VConfig, block_idx, x, audio_emb_global,
                  audio_emb, seq_len_x):
    """after_transformer_block — s2v.py:459-482."""
    inj_map = {layer: i for i, layer in enumerate(cfg.audio_inject_layers)
               if layer < cfg.num_layers}
    if block_idx not in inj_map:
        return x
    i = inj_map[block_idx]
    num_frames = audio_emb.shape[1]
    b = x.shape[0]
    tokens = x[:, :seq_len_x].reshape(b * num_frames, seq_len_x // num_frames, cfg.dim)
    if cfg.enable_adain:
        temb = audio_emb_global.reshape(b * num_frames, -1, cfg.dim)[:, 0]
        attn_in = _ada_layer_norm(params["adain"][i], tokens, temb)
    else:
        attn_in = layer_norm(tokens, 1e-6)
    audio = audio_emb.reshape(b * num_frames, -1, cfg.dim)
    res = _cross_attention(params["injector"][i], attn_in, audio,
                           cfg.num_heads, cfg.eps, False)
    res = res.reshape(b, seq_len_x, cfg.dim)
    return x.at[:, :seq_len_x].add(res.astype(x.dtype))


# ------------------------------------------------------------------ forward
def wan_s2v_forward(params, cfg: S2VConfig, latents, timestep, context,
                    audio_input, motion_latents=None, pose_cond=None,
                    drop_motion_frames: bool = True,
                    motion_frames: Tuple[int, int] = (73, 19)):
    """WanS2VModel.forward — s2v.py:503-594.

    latents (B, C, F, H, W): frame 0 is the reference latent.
    drop_motion_frames defaults True, matching the reference quirk:
    WanS2VModel.forward calls inject_motion without overriding its
    drop_motion_frames=True default (s2v.py:448, :539)."""
    origin_ref = latents[:, :, 0:1]
    x_lat = latents[:, :, 1:]
    ctx = text_embedding(params, context)

    # audio
    rep = jnp.repeat(audio_input[..., 0:1], motion_frames[0], axis=-1)
    audio_full = jnp.concatenate([rep, audio_input], axis=-1)
    aeg, aemb = causal_audio_encoder_forward(
        params["casual_audio_encoder"], audio_full, cfg.num_audio_token,
        cfg.enable_adain,
    )
    audio_emb_global = aeg[:, motion_frames[1]:]
    merged_audio_emb = aemb[:, motion_frames[1]:]

    pose = jnp.zeros_like(x_lat) if pose_cond is None else pose_cond
    x, (f, h, w) = _patchify3d(params["patch_embedding"], x_lat, cfg.patch_size)
    pc, _ = _patchify3d(params["cond_encoder"], pose, cfg.patch_size)
    x = x + pc
    seq_len_x = x.shape[1]

    ref, (rf, rh, rw) = _patchify3d(params["patch_embedding"], origin_ref, cfg.patch_size)
    x = jnp.concatenate([x, ref], axis=1)
    mask = np.concatenate([np.zeros(seq_len_x, np.int32), np.ones(ref.shape[1], np.int32)])

    grids = [
        ((0, 0, 0), (f, h, w), (f, h, w)),
        ((30, 0, 0), (31, rh, rw), (1, rh, rw)),
    ]
    angles = rope_grid_angles(grids, cfg.head_dim)

    if motion_latents is not None and not drop_motion_frames:
        mot, mot_angles = frame_packer_forward(
            params["frame_packer"], cfg, motion_latents
        )
        if mot.shape[1] > 0:
            x = jnp.concatenate([x, mot], axis=1)
            angles = np.concatenate([angles, mot_angles], axis=0)
            mask = np.concatenate(
                [mask, 2 * np.ones(mot.shape[1], np.int32)]
            )
    freqs = angles_to_freqs(angles)

    x = x + params["trainable_cond_mask"][jnp.asarray(mask)].astype(x.dtype)

    # dual timestep: [t, 0]
    ts2 = jnp.concatenate([timestep, jnp.zeros((1,), timestep.dtype)])
    emb = sinusoidal_embedding_1d(cfg.freq_dim, ts2).astype(x.dtype)
    hdn = _apply_dense(params["time_embed"]["fc1"], emb)
    hdn = jax.nn.silu(hdn.astype(jnp.float32)).astype(hdn.dtype)
    t = _apply_dense(params["time_embed"]["fc2"], hdn)
    tp = jax.nn.silu(t.astype(jnp.float32)).astype(t.dtype)
    t_mod2 = _apply_dense(params["time_proj"], tp).reshape(2, 6, cfg.dim)

    # fused-prep tables: built ONCE per forward (gate + default live in
    # ops/fused_qk.fused_qk_enabled); TPU-only so the CPU golden path
    # stays bit-identical to the reference
    from ...ops.attention import _on_tpu
    from ...ops.fused_qk import build_freqs_full, fused_qk_enabled

    freqs_full = None
    if _on_tpu() and cfg.head_dim == 128 and fused_qk_enabled():
        freqs_full = build_freqs_full(freqs)

    for i, blk in enumerate(params["blocks"]):
        x = s2v_dit_block(blk, x, ctx, t_mod2, seq_len_x, freqs, cfg,
                          freqs_full=freqs_full)
        x = _audio_inject(params["audio_injector"], cfg, i, x,
                          audio_emb_global, merged_audio_emb, seq_len_x)

    x = x[:, :seq_len_x]
    x = head_forward(params["head"], x, t[:1], cfg.dit_cfg())
    x = unpatchify(x, (f, h, w), cfg.dit_cfg())
    return jnp.concatenate([origin_ref, x], axis=2)


# ------------------------------------------------------------------ converter
def convert_s2v_state_dict(sd: Dict[str, np.ndarray], cfg: S2VConfig, dtype=None):
    def lw(name):
        p = {"w": np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = np.asarray(sd[name + ".bias"])
        return p

    def g(name):
        return np.asarray(sd[name])

    def conv1d(name):  # torch (out, in, k) -> (k, in, out)
        return {"w": g(name + ".weight").transpose(2, 1, 0), "b": g(name + ".bias")}

    def conv3d_as_dense(name):  # (D, C, pt, ph, pw) -> (C·pt·ph·pw, D)
        w = g(name + ".weight")
        return {"w": w.transpose(1, 2, 3, 4, 0).reshape(-1, w.shape[0]),
                "b": g(name + ".bias")}

    def attn(pre):
        return {"q": lw(pre + ".q"), "k": lw(pre + ".k"), "v": lw(pre + ".v"),
                "o": lw(pre + ".o"),
                "norm_q": g(pre + ".norm_q.weight"), "norm_k": g(pre + ".norm_k.weight")}

    D = cfg.dim
    blocks = []
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        blocks.append({
            "self_attn": attn(pre + ".self_attn"),
            "cross_attn": attn(pre + ".cross_attn"),
            "norm3": {"w": g(pre + ".norm3.weight"), "b": g(pre + ".norm3.bias")},
            "ffn": {"fc1": lw(pre + ".ffn.0"), "fc2": lw(pre + ".ffn.2")},
            "modulation": g(pre + ".modulation").reshape(6, D),
        })

    def motion_encoder(pre, need_global):
        p = {
            "conv1_local": conv1d(pre + ".conv1_local.conv"),
            "conv2": conv1d(pre + ".conv2.conv"),
            "conv3": conv1d(pre + ".conv3.conv"),
            "padding_tokens": g(pre + ".padding_tokens"),
        }
        if need_global:
            p["conv1_global"] = conv1d(pre + ".conv1_global.conv")
            p["final_linear"] = lw(pre + ".final_linear")
        return p

    n_inject = len([l for l in cfg.audio_inject_layers if l < cfg.num_layers])
    injector = [attn(f"audio_injector.injector.{i}") for i in range(n_inject)]
    adain = [
        {"linear": lw(f"audio_injector.injector_adain_layers.{i}.linear")}
        for i in range(n_inject)
    ] if cfg.enable_adain else []

    params = {
        "patch_embedding": conv3d_as_dense("patch_embedding"),
        "cond_encoder": conv3d_as_dense("cond_encoder"),
        "text_embed": {"fc1": lw("text_embedding.0"), "fc2": lw("text_embedding.2")},
        "time_embed": {"fc1": lw("time_embedding.0"), "fc2": lw("time_embedding.2")},
        "time_proj": lw("time_projection.1"),
        "blocks": blocks,
        "head": {**lw("head.head"), "modulation": g("head.modulation").reshape(2, D)},
        "trainable_cond_mask": g("trainable_cond_mask.weight"),
        "casual_audio_encoder": {
            "weights": g("casual_audio_encoder.weights"),
            "encoder": motion_encoder("casual_audio_encoder.encoder", cfg.enable_adain),
        },
        "audio_injector": {"injector": injector, "adain": adain},
        "frame_packer": {
            "proj": conv3d_as_dense("frame_packer.proj"),
            "proj_2x": conv3d_as_dense("frame_packer.proj_2x"),
            "proj_4x": conv3d_as_dense("frame_packer.proj_4x"),
        },
    }
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
    return jax.tree.map(cast, params)


# ------------------------------------------------------- audio bucket utils
def linear_interpolation_np(features: np.ndarray, input_fps: float,
                            output_fps: float, output_len=None) -> np.ndarray:
    """wav2vec.py:30-42 (align_corners=True linear resample over time).

    features (B, T, C)."""
    b, t, c = features.shape
    if output_len is None:
        output_len = int(t / float(input_fps) * output_fps)
    if output_len == 1 or t == 1:
        idx = np.zeros(output_len)
    else:
        idx = np.linspace(0, t - 1, output_len)
    lo = np.floor(idx).astype(int)
    hi = np.minimum(lo + 1, t - 1)
    frac = (idx - lo)[None, :, None]
    return features[:, lo] * (1 - frac) + features[:, hi] * frac


def get_audio_embed_bucket_fps(audio_embed: np.ndarray, fps=16, batch_frames=81,
                               m=0, video_rate=30):
    """wav2vec.py:147-184 — resample per-frame audio features to video fps
    buckets."""
    num_layers, audio_frame_num, audio_dim = audio_embed.shape
    return_all_layers = num_layers > 1
    scale = video_rate / fps
    min_batch_num = int(audio_frame_num / (batch_frames * scale)) + 1
    bucket_num = min_batch_num * batch_frames
    padd = math.ceil(min_batch_num * batch_frames / fps * video_rate) - audio_frame_num
    total = audio_frame_num + padd
    required = int(np.ceil(bucket_num / fps * video_rate))
    start_time = 0.0
    time_points = np.linspace(start_time, start_time + bucket_num / fps, bucket_num,
                              endpoint=False)
    batch_idx = np.clip(np.round(time_points * video_rate).astype(int), 0, total - 1)
    stride = int(video_rate / fps)
    out = []
    for bi in batch_idx:
        if bi < audio_frame_num:
            chosen = list(range(bi - m * stride, bi + (m + 1) * stride, stride))
            chosen = [min(max(c, 0), audio_frame_num - 1) for c in chosen]
            emb = audio_embed[:, chosen].reshape(num_layers, -1) if return_all_layers \
                else audio_embed[0][chosen].reshape(-1)
        else:
            emb = np.zeros((num_layers, audio_dim * (2 * m + 1))) if return_all_layers \
                else np.zeros(audio_dim * (2 * m + 1))
        out.append(emb)
    return np.stack(out), min_batch_num
