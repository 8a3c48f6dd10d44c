"""FLUX.1 VAE — converter onto the shared AutoencoderKL implementation.

The reference's FluxVAEEncoder/Decoder (``animation/diffsynth/models/
flux_vae.py:296-434``) are the standard SD AutoencoderKL graph with
16 latent channels, no quant convs, and (shift, scale) latent
normalization — architecturally identical to ``models/sdxl/vae.py``'s
functional port, so this module only supplies:

  - ``AutoencoderKLConfig.flux()`` (re-exported) and
  - ``convert_flux_vae_state_dict``: maps the reference's flat
    ``blocks.{i}`` module list (resnets / samplers / attention interleaved,
    flux_vae.py:303-327,375-395) onto the staged pytree.

Latent scaling semantics (flux_vae.py:350,432):
  encode:  z = (mean - shift_factor) * scaling_factor
  decode:  x = decode(z / scaling_factor + shift_factor)
applied by callers/pipelines — the shared vae_encode/vae_decode stay
unscaled like the diffusers convention.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..sdxl.vae import (  # noqa: F401  (re-exports)
    AutoencoderKLConfig,
    vae_decode,
    vae_encode,
)


def convert_flux_vae_state_dict(sd: Dict[str, np.ndarray],
                                cfg: AutoencoderKLConfig, dtype=None):
    """Consumes ``FluxVAEEncoder.state_dict() + FluxVAEDecoder.state_dict()``
    naming, with encoder keys prefixed ``encoder.`` and decoder keys
    prefixed ``decoder.`` (how the reference ModelPool stores the pair)."""

    def cw(name):
        return {"w": np.asarray(sd[name + ".weight"]).transpose(2, 3, 1, 0),
                "b": np.asarray(sd[name + ".bias"])}

    def lw(name):
        w = np.asarray(sd[name + ".weight"])
        if w.ndim == 4:  # ConvAttention stores projections as 1x1 convs
            w = w[:, :, 0, 0]
        return {"w": w.T, "b": np.asarray(sd[name + ".bias"])}

    def nw(name):
        return {"w": np.asarray(sd[name + ".weight"]),
                "b": np.asarray(sd[name + ".bias"])}

    def resnet(pre):
        p = {"norm1": nw(pre + ".norm1"), "conv1": cw(pre + ".conv1"),
             "norm2": nw(pre + ".norm2"), "conv2": cw(pre + ".conv2")}
        if pre + ".conv_shortcut.weight" in sd:
            p["conv_shortcut"] = cw(pre + ".conv_shortcut")
        return p

    def attn(pre):
        t = pre + ".transformer_blocks.0"
        return {"group_norm": nw(pre + ".norm"),
                "to_q": lw(t + ".to_q"), "to_k": lw(t + ".to_k"),
                "to_v": lw(t + ".to_v"), "to_out": lw(t + ".to_out")}

    n_stages = len(cfg.block_out_channels)

    # encoder: [res x L, down] x (n-1), res x L, then mid (res, attn, res)
    idx = 0
    down_blocks = []
    for i in range(n_stages):
        st = {"resnets": []}
        for _ in range(cfg.layers_per_block):
            st["resnets"].append(resnet(f"encoder.blocks.{idx}"))
            idx += 1
        if i != n_stages - 1:
            st["downsamplers"] = cw(f"encoder.blocks.{idx}.conv")
            idx += 1
        down_blocks.append(st)
    enc_mid = {"res1": resnet(f"encoder.blocks.{idx}"),
               "attn": attn(f"encoder.blocks.{idx + 1}"),
               "res2": resnet(f"encoder.blocks.{idx + 2}")}

    # decoder: mid (res, attn, res), then [res x (L+1), up] x (n-1), res x (L+1)
    dec_mid = {"res1": resnet("decoder.blocks.0"),
               "attn": attn("decoder.blocks.1"),
               "res2": resnet("decoder.blocks.2")}
    idx = 3
    up_blocks = []
    for i in range(n_stages):
        st = {"resnets": []}
        for _ in range(cfg.layers_per_block + 1):
            st["resnets"].append(resnet(f"decoder.blocks.{idx}"))
            idx += 1
        if i != n_stages - 1:
            st["upsamplers"] = cw(f"decoder.blocks.{idx}.conv")
            idx += 1
        up_blocks.append(st)

    params = {
        "encoder": {
            "conv_in": cw("encoder.conv_in"),
            "down_blocks": down_blocks,
            "mid": enc_mid,
            "conv_norm_out": nw("encoder.conv_norm_out"),
            "conv_out": cw("encoder.conv_out"),
        },
        "decoder": {
            "conv_in": cw("decoder.conv_in"),
            "mid": dec_mid,
            "up_blocks": up_blocks,
            "conv_norm_out": nw("decoder.conv_norm_out"),
            "conv_out": cw("decoder.conv_out"),
        },
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)


def convert_flux_vae_bfl_state_dict(sd: Dict[str, np.ndarray],
                                    cfg: AutoencoderKLConfig, dtype=None):
    """BFL ``ae.safetensors`` naming (encoder.down.{i}.block.{j} /
    decoder.up.{i} with REVERSED up indices / mid.block_1|attn_1|block_2 /
    norm_out) -> the staged pytree.  Port of the reference rename tables
    (utils/state_dict_converters/flux_vae.py:1-264)."""

    def cw(name):
        return {"w": np.asarray(sd[name + ".weight"]).transpose(2, 3, 1, 0),
                "b": np.asarray(sd[name + ".bias"])}

    def lw(name):
        w = np.asarray(sd[name + ".weight"])
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return {"w": w.T, "b": np.asarray(sd[name + ".bias"])}

    def nw(name):
        return {"w": np.asarray(sd[name + ".weight"]),
                "b": np.asarray(sd[name + ".bias"])}

    def resnet(pre):
        p = {"norm1": nw(pre + ".norm1"), "conv1": cw(pre + ".conv1"),
             "norm2": nw(pre + ".norm2"), "conv2": cw(pre + ".conv2")}
        if pre + ".nin_shortcut.weight" in sd:
            p["conv_shortcut"] = cw(pre + ".nin_shortcut")
        return p

    def attn(pre):
        return {"group_norm": nw(pre + ".norm"),
                "to_q": lw(pre + ".q"), "to_k": lw(pre + ".k"),
                "to_v": lw(pre + ".v"), "to_out": lw(pre + ".proj_out")}

    n = len(cfg.block_out_channels)
    down_blocks = []
    for i in range(n):
        st = {"resnets": [resnet(f"encoder.down.{i}.block.{j}")
                          for j in range(cfg.layers_per_block)]}
        if i != n - 1:
            st["downsamplers"] = cw(f"encoder.down.{i}.downsample.conv")
        down_blocks.append(st)

    up_blocks = []
    for k in range(n):  # execution order; BFL stores reversed (up.3 first)
        i = n - 1 - k
        st = {"resnets": [resnet(f"decoder.up.{i}.block.{j}")
                          for j in range(cfg.layers_per_block + 1)]}
        if k != n - 1:
            st["upsamplers"] = cw(f"decoder.up.{i}.upsample.conv")
        up_blocks.append(st)

    params = {
        "encoder": {
            "conv_in": cw("encoder.conv_in"),
            "down_blocks": down_blocks,
            "mid": {"res1": resnet("encoder.mid.block_1"),
                    "attn": attn("encoder.mid.attn_1"),
                    "res2": resnet("encoder.mid.block_2")},
            "conv_norm_out": nw("encoder.norm_out"),
            "conv_out": cw("encoder.conv_out"),
        },
        "decoder": {
            "conv_in": cw("decoder.conv_in"),
            "mid": {"res1": resnet("decoder.mid.block_1"),
                    "attn": attn("decoder.mid.attn_1"),
                    "res2": resnet("decoder.mid.block_2")},
            "up_blocks": up_blocks,
            "conv_norm_out": nw("decoder.norm_out"),
            "conv_out": cw("decoder.conv_out"),
        },
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)
