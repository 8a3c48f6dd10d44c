"""Quality-metric battery.

Port of ``stylization/BrushNet/examples/brushnet/evaluate_brushnet.py:38-90``
with pure-JAX implementations: PSNR, SSIM, MSE, MAE, and CLIPScore (given
CLIP weights via models/sdxl/clip — the reference uses CLIP-L/14).
LAION-aesthetic / ImageReward / HPSv2.1 heads require their external
checkpoints; they plug in through :func:`clip_image_features`.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def mse(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.mean((a - b) ** 2)


def mae(a, b):
    return jnp.mean(jnp.abs(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)))


def psnr(a, b, data_range: float = 255.0):
    """Peak signal-to-noise ratio in dB (uint8 images by default)."""
    m = mse(a, b)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12))


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(a, b, data_range: float = 255.0):
    """Structural similarity (Wang et al.; 11x11 gaussian window, per-channel
    mean) — matches skimage defaults used by the reference evaluator."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    k = _gaussian_kernel()[:, :, None, None]  # HWIO depthwise per channel

    def filt(x):
        c = x.shape[-1]
        return jax.lax.conv_general_dilated(
            x[None], jnp.tile(k, (1, 1, 1, c)), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )[0]

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = filt(a), filt(b)
    va = filt(a * a) - mu_a**2
    vb = filt(b * b) - mu_b**2
    vab = filt(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * vab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return jnp.mean(s)


def video_psnr(a, b, data_range: float = 255.0):
    """Mean per-frame PSNR for (T, H, W, C) uint8 videos."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    m = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return jnp.mean(10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12)))


def clip_score(image_features, text_features):
    """CLIPScore = 100·max(0, cos(img, text)) — evaluate_brushnet.py usage."""
    a = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    t = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    return 100.0 * jnp.maximum((a * t).sum(-1), 0.0)
