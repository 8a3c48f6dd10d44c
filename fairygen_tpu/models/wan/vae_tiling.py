"""Spatially tiled VAE encode/decode with linear feather blending.

Port of the reference tiling (``wan_video_vae.py:1081-1203``): overlapping
spatial tiles processed independently (each through the streamed causal
temporal path), blended with per-axis linear ramp masks
``(arange(border)+1)/border`` and min-combined 2D weights.

On TPU the motivation shifts from VRAM to HBM: tiling bounds decoder
activation memory at high resolutions / long clips, and every tile reuses
the same compiled chunk programs (shapes are fixed per tile size).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .vae import WanVAEConfig, vae38_decode, vae38_encode


def _build_mask(h: int, w: int, is_bound, border_width) -> np.ndarray:
    """Reference build_mask (wan_video_vae.py:1081-1100)."""

    def ramp1d(length, left_bound, right_bound, border):
        x = np.ones((length,), np.float32)
        if border > 0:
            if not left_bound:
                x[:border] = (np.arange(border) + 1) / border
            if not right_bound:
                x[-border:] = np.flip((np.arange(border) + 1) / border)
        return x

    hm = ramp1d(h, is_bound[0], is_bound[1], border_width[0])
    wm = ramp1d(w, is_bound[2], is_bound[3], border_width[1])
    return np.minimum(hm[:, None], wm[None, :])


def _tile_tasks(H, W, size, stride):
    size_h, size_w = size
    stride_h, stride_w = stride
    tasks = []
    for h in range(0, H, stride_h):
        if h - stride_h >= 0 and h - stride_h + size_h >= H:
            continue
        for w in range(0, W, stride_w):
            if w - stride_w >= 0 and w - stride_w + size_w >= W:
                continue
            tasks.append((h, min(h + size_h, H + size_h), w, min(w + size_w, W + size_w)))
    return tasks


def vae38_tiled_decode(params, cfg: WanVAEConfig, latents,
                       tile_size: Tuple[int, int] = (30, 52),
                       tile_stride: Tuple[int, int] = (15, 26),
                       streaming: bool = True, mesh=None):
    """latents (B, z, T, H, W) -> video (B, 3, T', H·f, W·f), tile sizes in
    latent units (reference defaults tile 30x52 stride 15x26 ≈ 480x832 px).

    ``mesh``: shard the independent tiles over the mesh ``data`` axis —
    same-shape tiles are stacked along the batch axis and decoded in one
    SPMD program (per-sample numerics identical to the sequential path;
    the 720p decode is the single-chip tail of the v5e-8 projection, and
    its tiles are embarrassingly parallel)."""
    B, C, T, H, W = latents.shape
    f = cfg.upsampling_factor
    size_h, size_w = tile_size
    stride_h, stride_w = tile_stride
    out_T = (T - 1) * 4 + 1

    # blend ON DEVICE: pulling each decoded tile to the host costs a full
    # fp32 video transfer per tile (9 x ~390 MB at 720p — measured 157 s
    # end-to-end through the tunneled host vs seconds of device compute);
    # .at[].add keeps the accumulation as small on-device update programs
    values = jnp.zeros((B, 3, out_T, H * f, W * f), jnp.float32)
    weight = jnp.zeros((1, 1, 1, H * f, W * f), jnp.float32)

    tasks = []
    for h, h_, w, w_ in _tile_tasks(H, W, tile_size, tile_stride):
        h_, w_ = min(h + size_h, H), min(w + size_w, W)
        tasks.append((h, h_, w, w_))

    # group same-shape tiles so each group decodes as ONE batched call
    groups: dict = {}
    for t in tasks:
        h, h_, w, w_ = t
        groups.setdefault((h_ - h, w_ - w), []).append(t)

    for (th_, tw_), group in groups.items():
        batch = jnp.concatenate(
            [latents[:, :, :, h:h_, w:w_] for h, h_, w, w_ in group], axis=0)
        if mesh is not None:
            from ...core.meshes import shard_batch_over_data

            batch, n_pad = shard_batch_over_data(batch, mesh)
        dec = vae38_decode(params, cfg, batch, streaming=streaming,
                           clamp=False).astype(jnp.float32)
        if mesh is not None:
            # re-replicate on device (ICI all-gather) before slicing the
            # tile group — a device_get here would round-trip the whole
            # decoded group through the host, the exact transfer cost the
            # on-device blend exists to avoid
            from ...core.meshes import replicated

            dec = jax.device_put(dec, replicated(mesh))
            if n_pad:
                dec = dec[: dec.shape[0] - n_pad]
        for i, (h, h_, w, w_) in enumerate(group):
            d = dec[i * B:(i + 1) * B]
            mask = jnp.asarray(_build_mask(
                d.shape[-2], d.shape[-1],
                is_bound=(h == 0, h_ >= H, w == 0, w_ >= W),
                border_width=((size_h - stride_h) * f,
                              (size_w - stride_w) * f),
            ))
            ph, pw = h * f, w * f
            values = values.at[:, :, :, ph:ph + d.shape[-2],
                               pw:pw + d.shape[-1]].add(d * mask)
            weight = weight.at[:, :, :, ph:ph + d.shape[-2],
                               pw:pw + d.shape[-1]].add(mask)
    return jnp.clip(values / weight, -1, 1)


def vae38_tiled_encode(params, cfg: WanVAEConfig, video,
                       tile_size: Tuple[int, int] = (34, 34),
                       tile_stride: Tuple[int, int] = (18, 16),
                       streaming: bool = True):
    """video (B, 3, T, H, W) -> latents; tile sizes in LATENT units
    (scaled to pixels by upsampling_factor, reference
    wan_video_vae.py:1218-1226)."""
    B, C, T, H, W = video.shape
    f = cfg.upsampling_factor
    size = (tile_size[0] * f, tile_size[1] * f)
    stride = (tile_stride[0] * f, tile_stride[1] * f)
    out_T = (T - 1) // 4 + 1
    zc = cfg.z_dim

    values = jnp.zeros((B, zc, out_T, H // f, W // f), jnp.float32)
    weight = jnp.zeros((1, 1, 1, H // f, W // f), jnp.float32)

    for h, h_, w, w_ in _tile_tasks(H, W, size, stride):
        h_, w_ = min(h + size[0], H), min(w + size[1], W)
        tile = video[:, :, :, h:h_, w:w_]
        z = vae38_encode(params, cfg, tile, streaming=streaming)
        z = z.astype(jnp.float32)
        mask = jnp.asarray(_build_mask(
            z.shape[-2], z.shape[-1],
            is_bound=(h == 0, h_ >= H, w == 0, w_ >= W),
            border_width=((size[0] - stride[0]) // f, (size[1] - stride[1]) // f),
        ))
        th, tw = h // f, w // f
        values = values.at[:, :, :, th:th + z.shape[-2],
                           tw:tw + z.shape[-1]].add(z * mask)
        weight = weight.at[:, :, :, th:th + z.shape[-2],
                           tw:tw + z.shape[-1]].add(mask)
    return values / weight
