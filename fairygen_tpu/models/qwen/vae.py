"""Qwen-Image VAE — key translation onto the Wan 2.1 causal VAE.

The reference ``QwenImageVAE`` (``animation/diffsynth/models/
qwen_image_vae.py:642-726``) IS the Wan2.1 16-channel causal 3D VAE
(base_dim 96, z 16, dim_mult [1,2,4,4], temporal downsample [F,T,T],
identical latent mean/std tables) applied to single frames
(``x.unsqueeze(2)``), with diffusers-style module names
(``down_blocks`` / ``mid_block`` / ``norm_out``) instead of DiffSynth's
flat ``downsamples``/``middle``/``head`` Sequential numbering.  This
module supplies the renamer onto :func:`convert_vae_v1_state_dict`'s
input naming and single-frame encode/decode wrappers over the shared
implementation (``models/wan/vae.py``).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..wan.vae import (  # noqa: F401  (re-exports)
    WanVAEConfig,
    convert_vae_v1_state_dict,
    vae38_decode,
    vae38_encode,
)


def qwen_image_vae_config() -> WanVAEConfig:
    return WanVAEConfig.wan21_16()


def _translate_qwen_vae_keys(sd: Dict[str, np.ndarray], cfg: WanVAEConfig):
    """QwenImageVAE module naming -> DiffSynth VideoVAE_ flat naming
    (reference qwen_image_vae.py:344-640 vs wan_video_vae.py:543-783)."""
    out = {}

    def res_map(src, dst):
        pairs = {
            ".norm1.gamma": ".residual.0.gamma",
            ".conv1.weight": ".residual.2.weight",
            ".conv1.bias": ".residual.2.bias",
            ".norm2.gamma": ".residual.3.gamma",
            ".conv2.weight": ".residual.6.weight",
            ".conv2.bias": ".residual.6.bias",
            ".conv_shortcut.weight": ".shortcut.weight",
            ".conv_shortcut.bias": ".shortcut.bias",
        }
        for a, b in pairs.items():
            if src + a in sd:
                out[dst + b] = sd[src + a]

    def direct(src, dst):
        for suf in (".weight", ".bias", ".gamma"):
            if src + suf in sd:
                out[dst + suf] = sd[src + suf]

    def attn_map(src, dst):
        out[dst + ".norm.gamma"] = sd[src + ".norm.gamma"]
        direct(src + ".to_qkv", dst + ".to_qkv")
        direct(src + ".proj", dst + ".proj")

    n = len(cfg.dim_mult)
    # encoder: conv_in, [res x L (+ resample)] per stage, mid, norm_out/conv_out
    direct("encoder.conv_in", "encoder.conv1")
    k = idx = 0
    for i in range(n):
        for _ in range(cfg.num_res_blocks):
            res_map(f"encoder.down_blocks.{k}", f"encoder.downsamples.{idx}")
            k += 1
            idx += 1
        if i != n - 1:
            direct(f"encoder.down_blocks.{k}.resample.1",
                   f"encoder.downsamples.{idx}.resample.1")
            direct(f"encoder.down_blocks.{k}.time_conv",
                   f"encoder.downsamples.{idx}.time_conv")
            k += 1
            idx += 1
    res_map("encoder.mid_block.resnets.0", "encoder.middle.0")
    attn_map("encoder.mid_block.attentions.0", "encoder.middle.1")
    res_map("encoder.mid_block.resnets.1", "encoder.middle.2")
    out["encoder.head.0.gamma"] = sd["encoder.norm_out.gamma"]
    direct("encoder.conv_out", "encoder.head.2")

    direct("quant_conv", "conv1")
    direct("post_quant_conv", "conv2")

    direct("decoder.conv_in", "decoder.conv1")
    res_map("decoder.mid_block.resnets.0", "decoder.middle.0")
    attn_map("decoder.mid_block.attentions.0", "decoder.middle.1")
    res_map("decoder.mid_block.resnets.1", "decoder.middle.2")
    idx = 0
    for i in range(n):
        for j in range(cfg.num_res_blocks + 1):
            res_map(f"decoder.up_blocks.{i}.resnets.{j}",
                    f"decoder.upsamples.{idx}")
            idx += 1
        if i != n - 1:
            direct(f"decoder.up_blocks.{i}.upsamplers.0.resample.1",
                   f"decoder.upsamples.{idx}.resample.1")
            direct(f"decoder.up_blocks.{i}.upsamplers.0.time_conv",
                   f"decoder.upsamples.{idx}.time_conv")
            idx += 1
    out["decoder.head.0.gamma"] = sd["decoder.norm_out.gamma"]
    direct("decoder.conv_out", "decoder.head.2")
    return out


def convert_qwen_image_vae_state_dict(sd: Dict[str, np.ndarray],
                                      cfg: WanVAEConfig, dtype=None):
    return convert_vae_v1_state_dict(_translate_qwen_vae_keys(sd, cfg), cfg,
                                     dtype=dtype)


def qwen_image_vae_encode(params, cfg: WanVAEConfig, image):
    """(B, 3, H, W) in [-1,1] -> normalized latents (B, 16, H/8, W/8)
    (reference QwenImageVAE.encode: T=1 through the causal stack)."""
    z = vae38_encode(params, cfg, image[:, :, None])
    return z[:, :, 0]


def qwen_image_vae_decode(params, cfg: WanVAEConfig, latents, clamp=False):
    # the reference QwenImageVAE.decode does NOT clamp (qwen_image_vae.py:
    # 719-726); the pipeline's postprocess clips instead
    x = vae38_decode(params, cfg, latents[:, :, None], clamp=clamp)
    return x[:, :, 0]
