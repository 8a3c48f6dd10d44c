"""Image/video pre- and post-processing.

Math mirrors the reference ``BasePipeline`` helpers
(``animation/diffsynth/diffusion/base_pipeline.py:95-143``) exactly — PSNR
parity against reference outputs depends on identical value mapping
(``x*2/255 - 1`` in, ``(x+1)*255/2`` clipped out) and identical shape
rounding.  Arrays use numpy on the host; model code receives jnp arrays.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

__all__ = [
    "check_resize_height_width",
    "preprocess_image",
    "preprocess_video",
    "postprocess_image",
    "postprocess_video",
    "image_crop_and_resize",
]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def check_resize_height_width(
    height: int,
    width: int,
    num_frames: Optional[int] = None,
    height_division_factor: int = 32,
    width_division_factor: int = 32,
    time_division_factor: int = 4,
    time_division_remainder: int = 1,
):
    """Round shapes to the model's division factors.

    Reference: base_pipeline.py:95-109 (Wan TI2V-5B uses h/w factor
    vae.upsampling_factor*2 = 32, time factor 4 remainder 1).
    """
    if height % height_division_factor != 0:
        height = _round_up(height, height_division_factor)
    if width % width_division_factor != 0:
        width = _round_up(width, width_division_factor)
    if num_frames is None:
        return height, width
    if num_frames % time_division_factor != time_division_remainder:
        num_frames = _round_up(num_frames, time_division_factor) + time_division_remainder
    return height, width, num_frames


def preprocess_image(image, min_value=-1.0, max_value=1.0) -> np.ndarray:
    """PIL.Image (or HWC uint8 array) -> float32 CHW in [min, max].

    Reference: base_pipeline.py:112-118 (pattern "B C H W" without batch;
    batch dims are added by callers).
    """
    arr = np.asarray(image, dtype=np.float32)
    arr = arr * ((max_value - min_value) / 255.0) + min_value
    return np.transpose(arr, (2, 0, 1))  # C H W


def preprocess_video(video: List, min_value=-1.0, max_value=1.0) -> np.ndarray:
    """List of PIL.Image -> float32 (1, C, T, H, W). Ref: base_pipeline.py:121-125."""
    frames = [preprocess_image(im, min_value, max_value) for im in video]
    return np.stack(frames, axis=1)[None]  # B C T H W


def postprocess_image(arr: np.ndarray, min_value=-1.0, max_value=1.0) -> np.ndarray:
    """float (C, H, W) or (H, W, C) in [min,max] -> uint8 HWC.

    Reference: base_pipeline.py:128-135 (vae_output_to_image).
    """
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.transpose(arr, (1, 2, 0))
    arr = (arr - min_value) * (255.0 / (max_value - min_value))
    return np.clip(arr, 0, 255).astype(np.uint8)


def postprocess_video(arr: np.ndarray, min_value=-1.0, max_value=1.0) -> List[np.ndarray]:
    """float (B, C, T, H, W) -> list of uint8 HWC frames. Ref: base_pipeline.py:138-143."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 5:
        arr = arr.mean(axis=0)  # reduce batch, matching einops reduce "mean"
    # C T H W -> T H W C
    arr = np.transpose(arr, (1, 2, 3, 0))
    return [postprocess_image(f, min_value, max_value) for f in arr]


def image_crop_and_resize(
    image,
    height: int,
    width: int,
    division_factor: Tuple[int, int] = (16, 16),
) -> "np.ndarray":
    """Aspect-fill resize + center crop + division-factor rounding.

    Reference: core/data/operators.py ImageCropAndResize — scale so the image
    covers (height, width), center-crop, and round target dims down to the
    division factor.
    """
    from PIL import Image

    if not hasattr(image, "resize"):
        image = Image.fromarray(np.asarray(image))
    height = height // division_factor[0] * division_factor[0]
    width = width // division_factor[1] * division_factor[1]
    w0, h0 = image.size
    scale = max(width / w0, height / h0)
    image = image.resize((round(w0 * scale), round(h0 * scale)), Image.Resampling.LANCZOS)
    left = (image.size[0] - width) // 2
    top = (image.size[1] - height) // 2
    image = image.crop((left, top, left + width, top + height))
    return image
