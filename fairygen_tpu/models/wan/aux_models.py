"""Auxiliary Wan conditioning models: motion controller + VACE branch.

* WanMotionControllerModel (reference
  ``wan_video_motion_controller.py``): sinusoidal(bucket·10) -> 3-layer MLP
  -> additive 6-way t_mod bias (applied in wan_dit_forward via t_mod_bias).

* VaceWanModel (reference ``wan_video_vace.py``): a stack of DiT blocks over
  the patchified control video; each block emits an after_proj "hint" that
  the main DiT adds at its mapped layer (x += hint·scale,
  wan_video.py:1365-1370).  Hints for non-VACE layers are zero so the main
  scan stays uniform.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dit import (
    WanDiTConfig,
    _apply_dense,
    dit_block,
    sinusoidal_embedding_1d,
)


# ----------------------------------------------------------- motion controller
@dataclasses.dataclass(frozen=True)
class MotionControllerConfig:
    freq_dim: int = 256
    dim: int = 1536


def motion_controller_forward(params, cfg: MotionControllerConfig, motion_bucket_id):
    """motion_bucket_id (B,) -> t_mod bias (B, 6, dim)."""
    emb = sinusoidal_embedding_1d(cfg.freq_dim, motion_bucket_id * 10.0)
    emb = emb.astype(params["fc1"]["w"].dtype)
    h = jax.nn.silu(_apply_dense(params["fc1"], emb).astype(jnp.float32)).astype(emb.dtype)
    h = jax.nn.silu(_apply_dense(params["fc2"], h).astype(jnp.float32)).astype(emb.dtype)
    out = _apply_dense(params["fc3"], h)
    return out.reshape(out.shape[0], 6, cfg.dim)


def convert_motion_controller_state_dict(sd, cfg: MotionControllerConfig, dtype=None):
    def lw(name):
        return {"w": np.asarray(sd[name + ".weight"]).T, "b": np.asarray(sd[name + ".bias"])}

    params = {"fc1": lw("linear.0"), "fc2": lw("linear.2"), "fc3": lw("linear.4")}
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
    return jax.tree.map(cast, params)


# --------------------------------------------------------------------- VACE
@dataclasses.dataclass(frozen=True)
class VaceConfig:
    vace_layers: Tuple[int, ...] = tuple(range(0, 30, 2))
    vace_in_dim: int = 96
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    has_image_input: bool = False
    dim: int = 1536
    num_heads: int = 12
    ffn_dim: int = 8960
    eps: float = 1e-6

    def dit_cfg(self) -> WanDiTConfig:
        return WanDiTConfig(
            dim=self.dim, in_dim=self.vace_in_dim, ffn_dim=self.ffn_dim,
            out_dim=self.vace_in_dim, text_dim=4096, freq_dim=256,
            eps=self.eps, patch_size=self.patch_size,
            num_heads=self.num_heads, num_layers=len(self.vace_layers),
            has_image_input=self.has_image_input,
        )


def vace_forward(params, cfg: VaceConfig, x_tokens, vace_context, context_emb,
                 t_mod, freqs, num_main_layers: int, seg=None):
    """Produce per-main-layer hints (L_main, B, S, D), zeros off-mapping.

    x_tokens: the main DiT's patchified tokens (B, S, D) — reference
    wan_video_vace.py:53-87 (before_proj(c)+x at block 0, after_proj skips).
    """
    dcfg = cfg.dit_cfg()
    b, s, d = x_tokens.shape
    pt, ph, pw = cfg.patch_size

    # patchify control video (B, C, F, H, W) -> tokens, zero-pad to S
    v = vace_context
    B, C, F, H, W = v.shape
    f, h, w = F // pt, H // ph, W // pw
    v = v.reshape(B, C, f, pt, h, ph, w, pw)
    v = v.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, f * h * w, C * pt * ph * pw)
    c = _apply_dense(params["patch_embedding"], v)
    if c.shape[1] < s:
        c = jnp.concatenate(
            [c, jnp.zeros((B, s - c.shape[1], d), c.dtype)], axis=1
        )

    hints = []
    for i, blk in enumerate(params["blocks"]):
        if i == 0:
            c = _apply_dense(blk["before_proj"], c) + x_tokens
        c = dit_block(blk, c, context_emb, t_mod, freqs, dcfg, seg=seg)
        hints.append(_apply_dense(blk["after_proj"], c))

    # scatter hints to main-layer slots (zeros elsewhere)
    out = jnp.zeros((num_main_layers,) + x_tokens.shape, x_tokens.dtype)
    for slot, layer_id in enumerate(cfg.vace_layers):
        out = out.at[layer_id].set(hints[slot])
    return out


def convert_vace_state_dict(sd, cfg: VaceConfig, dtype=None):
    def lw(name):
        p = {"w": np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = np.asarray(sd[name + ".bias"])
        return p

    def g(name):
        return np.asarray(sd[name])

    def attn(pre, img=False):
        p = {
            "q": lw(pre + ".q"), "k": lw(pre + ".k"), "v": lw(pre + ".v"),
            "o": lw(pre + ".o"),
            "norm_q": g(pre + ".norm_q.weight"), "norm_k": g(pre + ".norm_k.weight"),
        }
        if img:
            p["k_img"] = lw(pre + ".k_img")
            p["v_img"] = lw(pre + ".v_img")
            p["norm_k_img"] = g(pre + ".norm_k_img.weight")
        return p

    pe = g("vace_patch_embedding.weight")  # (D, C, pt, ph, pw)
    D = cfg.dim
    blocks = []
    for n in range(len(cfg.vace_layers)):
        pre = f"vace_blocks.{n}"
        blk = {
            "self_attn": attn(pre + ".self_attn"),
            "cross_attn": attn(pre + ".cross_attn", cfg.has_image_input),
            "norm3": {"w": g(pre + ".norm3.weight"), "b": g(pre + ".norm3.bias")},
            "ffn": {"fc1": lw(pre + ".ffn.0"), "fc2": lw(pre + ".ffn.2")},
            "modulation": g(pre + ".modulation").reshape(6, D),
            "after_proj": lw(pre + ".after_proj"),
        }
        if n == 0:
            blk["before_proj"] = lw(pre + ".before_proj")
        blocks.append(blk)
    params = {
        "patch_embedding": {
            "w": pe.transpose(1, 2, 3, 4, 0).reshape(-1, D),
            "b": g("vace_patch_embedding.bias"),
        },
        "blocks": blocks,
    }
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
    return jax.tree.map(cast, params)
