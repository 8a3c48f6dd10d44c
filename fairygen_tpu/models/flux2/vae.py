"""FLUX.2 VAE — shared AutoencoderKL + 2x2 latent packing + BatchNorm.

The reference (``animation/diffsynth/models/flux2_vae.py:1903-2135``) is
the standard diffusers AutoencoderKL (latent 32, quant convs) wrapped
with FLUX.2's latent normalization: the 64-channel (mean|logvar) encoder
output is 2x2-packed channelwise as (C P Q), the first 128 channels (the
means) are kept, and an affine-free BatchNorm2d's RUNNING statistics
normalize them (eps 1e-4); decode inverts.  Tokens flow to the DiT as
(B, H/16 * W/16, 128) sequences.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..sdxl.vae import (  # noqa: F401
    AutoencoderKLConfig,
    convert_autoencoder_kl_state_dict,
    vae_decode,
    vae_encode,
)

BN_EPS = 1e-4


def flux2_vae_config() -> AutoencoderKLConfig:
    return AutoencoderKLConfig(latent_channels=32, scaling_factor=1.0)


def _pack(z):
    """(B, C, H, W) -> (B, (C P Q), H/2, W/2) channel ordering (C, P, Q)."""
    b, c, h, w = z.shape
    z = z.reshape(b, c, h // 2, 2, w // 2, 2)
    return z.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * 4, h // 2, w // 2)


def _unpack(z):
    b, c4, h, w = z.shape
    c = c4 // 4
    z = z.reshape(b, c, 2, 2, h, w)
    return z.transpose(0, 1, 4, 2, 5, 3).reshape(b, c, h * 2, w * 2)


def flux2_vae_encode(params, cfg: AutoencoderKLConfig, images):
    """(B, 3, H, W) in [-1,1] -> tokens (B, H/16*W/16, 128), normalized
    (reference encode, flux2_vae.py:2057-2086)."""
    mean = vae_encode(params, cfg, images)  # (B, 32, H/8, W/8)
    z = _pack(mean)
    m = params["bn_mean"].astype(z.dtype)[None, :, None, None]
    s = jnp.sqrt(params["bn_var"].astype(jnp.float32) + BN_EPS).astype(
        z.dtype)[None, :, None, None]
    z = (z - m) / s
    b, c, h, w = z.shape
    return z.reshape(b, c, h * w).transpose(0, 2, 1)


def flux2_vae_decode(params, cfg: AutoencoderKLConfig, tokens,
                     h_tokens: int, w_tokens: int):
    """(B, L, 128) tokens -> images (B, 3, H, W)
    (reference decode, flux2_vae.py:2102-2135)."""
    b, l, c = tokens.shape
    z = tokens.transpose(0, 2, 1).reshape(b, c, h_tokens, w_tokens)
    m = params["bn_mean"].astype(z.dtype)[None, :, None, None]
    s = jnp.sqrt(params["bn_var"].astype(jnp.float32) + BN_EPS).astype(
        z.dtype)[None, :, None, None]
    z = z * s + m
    return vae_decode(params, cfg, _unpack(z))


def convert_flux2_vae_state_dict(sd: Dict[str, np.ndarray],
                                 cfg: AutoencoderKLConfig, dtype=None):
    params = convert_autoencoder_kl_state_dict(sd, cfg, dtype=dtype)
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    params["bn_mean"] = to(np.asarray(sd["bn.running_mean"]))
    params["bn_var"] = to(np.asarray(sd["bn.running_var"]))
    return params
