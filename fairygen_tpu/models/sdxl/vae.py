"""SDXL image VAE (AutoencoderKL) — functional NHWC port.

Mirrors the vendored diffusers ``AutoencoderKL`` used by the stylization
pipelines (``BrushNet/src/diffusers/models/autoencoders/autoencoder_kl.py``):
encoder/decoder of time-embedding-free resnets + single mid attention,
quant/post_quant 1x1 convs, scaling_factor applied by callers
(0.13025 for sdxl-vae / sdxl-vae-fp16-fix).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .unet2d import group_norm, _silu


@dataclasses.dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025
    shift_factor: float = 0.0  # FLUX: z = (mean - shift) * scale
    use_quant_conv: bool = True  # FLUX VAE has no quant/post_quant convs

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @staticmethod
    def sdxl() -> "AutoencoderKLConfig":
        return AutoencoderKLConfig()

    @staticmethod
    def flux() -> "AutoencoderKLConfig":
        """FLUX.1 16-channel VAE (reference flux_vae.py:296-399)."""
        return AutoencoderKLConfig(latent_channels=16, scaling_factor=0.3611,
                                   shift_factor=0.1159, use_quant_conv=False)

    @staticmethod
    def tiny(**over) -> "AutoencoderKLConfig":
        base = dict(block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8)
        base.update(over)
        return AutoencoderKLConfig(**base)


def _conv(p, x, strides=(1, 1), padding=((1, 1), (1, 1))):
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["b"].astype(x.dtype)


def _resnet(p, x, groups, eps=1e-6):
    h = group_norm(x, p["norm1"], groups, eps)
    h = _conv(p["conv1"], _silu(h))
    h = group_norm(h, p["norm2"], groups, eps)
    h = _conv(p["conv2"], _silu(h))
    if "conv_shortcut" in p:
        x = _conv(p["conv_shortcut"], x, padding=((0, 0), (0, 0)))
    return x + h


def _attn(p, x, groups, eps=1e-6):
    b, h, w, c = x.shape
    y = group_norm(x, p["group_norm"], groups, eps).reshape(b, h * w, c)

    def d(name, v):
        return (v @ p[name]["w"].astype(v.dtype)) + p[name]["b"].astype(v.dtype)

    q, k, v = d("to_q", y), d("to_k", y), d("to_v", y)
    logits = jnp.einsum("bsc,btc->bst", q, k).astype(jnp.float32) * (c**-0.5)
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    o = jnp.einsum("bst,btc->bsc", probs, v)
    o = d("to_out", o)
    return x + o.reshape(b, h, w, c)


def vae_encode(params, cfg: AutoencoderKLConfig, images, sample_mode: str = "mode",
               rng=None):
    """(B, 3, H, W) in [-1,1] -> latents (B, 4, H/8, W/8), UNSCALED.

    Callers multiply by scaling_factor (matching diffusers semantics).
    sample_mode: "mode" (mean) or "sample" (reparameterised).
    """
    x = jnp.transpose(images, (0, 2, 3, 1))
    p = params["encoder"]
    g = cfg.norm_num_groups
    x = _conv(p["conv_in"], x)
    for i, stage in enumerate(p["down_blocks"]):
        for r in stage["resnets"]:
            x = _resnet(r, x, g)
        if "downsamplers" in stage:
            # diffusers Downsample2D in VAE pads (0,1,0,1)
            x = _conv(stage["downsamplers"], jnp.pad(
                x, ((0, 0), (0, 1), (0, 1), (0, 0))), strides=(2, 2),
                padding=((0, 0), (0, 0)))
    x = _resnet(p["mid"]["res1"], x, g)
    x = _attn(p["mid"]["attn"], x, g)
    x = _resnet(p["mid"]["res2"], x, g)
    x = group_norm(x, p["conv_norm_out"], g)
    x = _conv(p["conv_out"], _silu(x))
    if cfg.use_quant_conv:
        x = _conv(params["quant_conv"], x, padding=((0, 0), (0, 0)))
    mean, logvar = jnp.split(x, 2, axis=-1)
    if sample_mode == "sample":
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    return jnp.transpose(mean, (0, 3, 1, 2))


def vae_decode(params, cfg: AutoencoderKLConfig, latents):
    """UNSCALED latents (B, 4, h, w) -> images (B, 3, H, W)."""
    x = jnp.transpose(latents, (0, 2, 3, 1))
    if cfg.use_quant_conv:
        x = _conv(params["post_quant_conv"], x, padding=((0, 0), (0, 0)))
    p = params["decoder"]
    g = cfg.norm_num_groups
    x = _conv(p["conv_in"], x)
    x = _resnet(p["mid"]["res1"], x, g)
    x = _attn(p["mid"]["attn"], x, g)
    x = _resnet(p["mid"]["res2"], x, g)
    for stage in p["up_blocks"]:
        for r in stage["resnets"]:
            x = _resnet(r, x, g)
        if "upsamplers" in stage:
            # conv3x3 on the nearest-2x upsample, computed as 4 sub-pixel
            # 2x2 convs (exact; see wan.vae._upsample2x_conv3x3_subpixel)
            from ..wan.vae import _upsample2x_conv3x3_subpixel

            x = _upsample2x_conv3x3_subpixel(
                x, stage["upsamplers"]["w"], stage["upsamplers"]["b"])
    x = group_norm(x, p["conv_norm_out"], g)
    x = _conv(p["conv_out"], _silu(x))
    return jnp.transpose(x, (0, 3, 1, 2))


# ------------------------------------------------------------------ converter
def convert_autoencoder_kl_state_dict(sd: Dict[str, np.ndarray],
                                      cfg: AutoencoderKLConfig, dtype=None):
    def cw(name):
        return {"w": np.asarray(sd[name + ".weight"]).transpose(2, 3, 1, 0),
                "b": np.asarray(sd[name + ".bias"])}

    def lw(name):
        w = np.asarray(sd[name + ".weight"])
        if w.ndim == 4:  # old checkpoints store attention projs as 1x1 convs
            w = w[:, :, 0, 0]
        return {"w": w.T, "b": np.asarray(sd[name + ".bias"])}

    def nw(name):
        return {"w": np.asarray(sd[name + ".weight"]), "b": np.asarray(sd[name + ".bias"])}

    def resnet(pre):
        p = {"norm1": nw(pre + ".norm1"), "conv1": cw(pre + ".conv1"),
             "norm2": nw(pre + ".norm2"), "conv2": cw(pre + ".conv2")}
        if pre + ".conv_shortcut.weight" in sd:
            p["conv_shortcut"] = cw(pre + ".conv_shortcut")
        return p

    def attn(pre):
        return {"group_norm": nw(pre + ".group_norm"),
                "to_q": lw(pre + ".to_q"), "to_k": lw(pre + ".to_k"),
                "to_v": lw(pre + ".to_v"), "to_out": lw(pre + ".to_out.0")}

    def stage_list(root, n_stages, n_res, down=True):
        stages = []
        for i in range(n_stages):
            pre = f"{root}.{i}"
            st = {"resnets": [resnet(f"{pre}.resnets.{j}") for j in range(n_res)]}
            if down and f"{pre}.downsamplers.0.conv.weight" in sd:
                st["downsamplers"] = cw(f"{pre}.downsamplers.0.conv")
            if not down and f"{pre}.upsamplers.0.conv.weight" in sd:
                st["upsamplers"] = cw(f"{pre}.upsamplers.0.conv")
            stages.append(st)
        return stages

    n = len(cfg.block_out_channels)
    params = {
        "encoder": {
            "conv_in": cw("encoder.conv_in"),
            "down_blocks": stage_list("encoder.down_blocks", n, cfg.layers_per_block),
            "mid": {"res1": resnet("encoder.mid_block.resnets.0"),
                    "attn": attn("encoder.mid_block.attentions.0"),
                    "res2": resnet("encoder.mid_block.resnets.1")},
            "conv_norm_out": nw("encoder.conv_norm_out"),
            "conv_out": cw("encoder.conv_out"),
        },
        "quant_conv": cw("quant_conv"),
        "post_quant_conv": cw("post_quant_conv"),
        "decoder": {
            "conv_in": cw("decoder.conv_in"),
            "mid": {"res1": resnet("decoder.mid_block.resnets.0"),
                    "attn": attn("decoder.mid_block.attentions.0"),
                    "res2": resnet("decoder.mid_block.resnets.1")},
            "up_blocks": stage_list("decoder.up_blocks", n,
                                    cfg.layers_per_block + 1, down=False),
            "conv_norm_out": nw("decoder.conv_norm_out"),
            "conv_out": cw("decoder.conv_out"),
        },
    }
    if dtype is not None:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    else:
        params = jax.tree.map(jnp.asarray, params)
    return params


def init_autoencoder_kl_params(cfg: AutoencoderKLConfig, dtype=jnp.float32,
                               include_encoder=True):
    """Structure-true zero-init params for ``vae_encode``/``vae_decode``
    (norm scales = 1) — weightless instantiation for timing runs
    (``benchmarks/``), mirroring diffusers' ``from_config`` role in the
    reference's benchmark harness."""
    def conv(kh, kw, i, o):
        return {"w": jnp.zeros((kh, kw, i, o), dtype),
                "b": jnp.zeros((o,), dtype)}

    def norm(c):
        return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    def dense(i, o):
        return {"w": jnp.zeros((i, o), dtype), "b": jnp.zeros((o,), dtype)}

    def resnet(i, o):
        p = {"norm1": norm(i), "conv1": conv(3, 3, i, o),
             "norm2": norm(o), "conv2": conv(3, 3, o, o)}
        if i != o:
            p["conv_shortcut"] = conv(1, 1, i, o)
        return p

    def mid(c):
        return {"res1": resnet(c, c), "res2": resnet(c, c),
                "attn": {"group_norm": norm(c), "to_q": dense(c, c),
                         "to_k": dense(c, c), "to_v": dense(c, c),
                         "to_out": dense(c, c)}}

    bo = cfg.block_out_channels
    lc = cfg.latent_channels
    params = {}

    dec_bo = list(reversed(bo))
    ch = dec_bo[0]
    ups = []
    for i, out in enumerate(dec_bo):
        st = {"resnets": [resnet(ch if j == 0 else out, out)
                          for j in range(cfg.layers_per_block + 1)]}
        if i != len(dec_bo) - 1:
            st["upsamplers"] = conv(3, 3, out, out)
        ups.append(st)
        ch = out
    params["decoder"] = {"conv_in": conv(3, 3, lc, dec_bo[0]),
                         "mid": mid(dec_bo[0]), "up_blocks": ups,
                         "conv_norm_out": norm(dec_bo[-1]),
                         "conv_out": conv(3, 3, dec_bo[-1], cfg.out_channels)}
    if cfg.use_quant_conv:
        params["post_quant_conv"] = conv(1, 1, lc, lc)

    if include_encoder:
        downs, ch = [], bo[0]
        for i, out in enumerate(bo):
            st = {"resnets": [resnet(ch if j == 0 else out, out)
                              for j in range(cfg.layers_per_block)]}
            if i != len(bo) - 1:
                st["downsamplers"] = conv(3, 3, out, out)
            downs.append(st)
            ch = out
        params["encoder"] = {"conv_in": conv(3, 3, cfg.in_channels, bo[0]),
                             "down_blocks": downs, "mid": mid(bo[-1]),
                             "conv_norm_out": norm(bo[-1]),
                             "conv_out": conv(3, 3, bo[-1], 2 * lc)}
        if cfg.use_quant_conv:
            params["quant_conv"] = conv(1, 1, 2 * lc, 2 * lc)
    return params
