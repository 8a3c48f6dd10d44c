"""Temporal sliding-window denoising for long-video generation.

Port of ``TemporalTiler_BCTHW`` (reference wan_video.py:1069-1118): run the
denoiser on overlapping temporal windows of the latent video, blend with
trapezoid masks ``(arange(border)+0.5)/border``, divide by summed weight.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


def _mask_1d(length, left_bound, right_bound, border_width):
    x = np.ones((length,), np.float32)
    if border_width == 0:
        return x
    ramp = (np.arange(border_width) + 0.5) / border_width
    if not left_bound:
        x[:border_width] = ramp
    if not right_bound:
        x[-border_width:] = np.flip(ramp)
    return x


def temporal_tiled_model_fn(
    model_fn: Callable,  # (latents, **kw) -> velocity, same BCTHW shape
    latents,
    sliding_window_size: int,
    sliding_window_stride: int,
    sliced_kwargs: Optional[dict] = None,  # BCTHW tensors sliced with latents
    **model_kwargs,
):
    """``sliced_kwargs`` mirrors the reference's ``tensor_names`` list
    (wan_video.py:1072, e.g. ``y`` for the I2V mask+latent conditioning):
    those tensors are windowed along T together with ``latents``."""
    B, C, T, H, W = latents.shape
    value = jnp.zeros(latents.shape, jnp.float32)
    weight = np.zeros((1, 1, T, 1, 1), np.float32)
    border = sliding_window_size - sliding_window_stride
    sliced_kwargs = sliced_kwargs or {}

    for t in range(0, T, sliding_window_stride):
        if t - sliding_window_stride >= 0 and t - sliding_window_stride + sliding_window_size >= T:
            continue
        t_ = min(t + sliding_window_size, T)
        window = latents[:, :, t:t_]
        sliced = {k: (v[:, :, t:t_] if v is not None else None)
                  for k, v in sliced_kwargs.items()}
        out = model_fn(window, **sliced, **model_kwargs).astype(jnp.float32)
        mask = _mask_1d(t_ - t, t == 0, t_ == T, border)
        mask5 = jnp.asarray(mask.reshape(1, 1, -1, 1, 1))
        value = value.at[:, :, t:t_].add(out * mask5)
        weight[:, :, t:t_] += mask.reshape(1, 1, -1, 1, 1)
    return (value / jnp.asarray(weight)).astype(latents.dtype)
