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


def clip_preprocess(image_uint8, size: int = 224):
    """PIL/uint8 HWC -> CLIP-normalized (1, 3, size, size) — bicubic resize
    + center crop + normalize (transformers CLIPProcessor defaults)."""
    from PIL import Image

    from ..models.sdxl.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    img = image_uint8
    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img))
    w, h = img.size
    short = min(w, h)
    img = img.resize((round(w * size / short), round(h * size / short)),
                     Image.BICUBIC)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    x = np.asarray(img, np.float32) / 255.0
    x = (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return jnp.asarray(x.transpose(2, 0, 1))[None]


def clip_score_from_pixels(image_uint8, text_ids, vision_params, vision_cfg,
                           text_params, text_cfg):
    """CLIPScore from a raw image + tokenized prompt through the in-repo
    CLIP towers (reference evaluate_brushnet.py:41,76-84 uses CLIP-L/14)."""
    from ..models.sdxl.clip import clip_text_encode, clip_vision_encode

    pix = clip_preprocess(image_uint8, vision_cfg.image_size)
    img_emb = clip_vision_encode(vision_params, vision_cfg, pix)
    txt = clip_text_encode(text_params, text_cfg, jnp.asarray(text_ids))
    return float(clip_score(img_emb, txt["text_embeds"])[0])


def lpips(img_a, img_b, lpips_params):
    """LPIPS-squeeze distance for images in [-1, 1] NCHW
    (reference evaluate_brushnet.py:43,110-118)."""
    from ..models.lpips import lpips_distance

    return lpips_distance(lpips_params, jnp.asarray(img_a), jnp.asarray(img_b))


def aesthetic_score(image_uint8, vision_params, vision_cfg, linear_w, linear_b):
    """LAION aesthetic predictor: linear head on unit-normalized CLIP-L
    image embeddings (reference evaluate_brushnet.py:46-73)."""
    from ..models.sdxl.clip import clip_vision_encode

    pix = clip_preprocess(image_uint8, vision_cfg.image_size)
    emb = clip_vision_encode(vision_params, vision_cfg, pix)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return float(jnp.dot(emb, jnp.asarray(linear_w).T)[0] + jnp.asarray(linear_b))


def hps_score(image_uint8, text_ids, visual_params, vision_cfg,
              text_params, text_cfg):
    """Human Preference Score v2: cosine(image, text) through an
    HPSv2.1-finetuned OpenCLIP ViT-H/14 (evaluate_brushnet.py:65-67;
    hpsv2.score computes the diagonal of the unit-normalized logits).

    Load the checkpoint with
    ``models.sdxl.clip.convert_open_clip_state_dict`` +
    ``CLIPVisionConfig.openclip_h14()`` / ``CLIPTextConfig.openclip_h14_text()``.
    """
    from ..models.sdxl.clip import clip_text_encode, clip_vision_encode

    pix = clip_preprocess(image_uint8, vision_cfg.image_size)
    img = clip_vision_encode(visual_params, vision_cfg, pix)
    txt = clip_text_encode(text_params, text_cfg, jnp.asarray(text_ids))
    t = txt["text_embeds"]
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    return float((img * t).sum(-1)[0])
