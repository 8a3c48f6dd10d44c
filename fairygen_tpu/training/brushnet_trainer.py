"""BrushNet training — masked-inpainting dual-branch finetune.

Port of ``stylization/BrushNet/examples/brushnet/train_brushnet_sdxl.py``:
random brush-stroke / RLE segmentation masks (:863-911), masked-image
conditioning latents (VAE(masked)·sf ⊕ mask, :921-956, conditioning is
5-channel at the latent grid), ε-prediction MSE, training ONLY the BrushNet
branch while the SDXL UNet stays frozen.
"""
from __future__ import annotations

import functools
import math
import random
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.ddpm import DDPMScheduler
from ..models.sdxl.unet2d import UNet2DConfig, brushnet_forward, unet2d_forward
from .train_step import TrainState, _donate


# ----------------------------------------------------------- mask generation
def random_brush_gen(rng: np.random.RandomState, max_tries, h, w,
                     min_num_vertex=4, max_num_vertex=18,
                     mean_angle=2 * math.pi / 5, angle_range=2 * math.pi / 15,
                     min_width=12, max_width=48) -> np.ndarray:
    """Random brush strokes (train_brushnet_sdxl.py random_brush path):
    polyline walks with varying width, rasterised with PIL."""
    from PIL import Image, ImageDraw

    mask = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(mask)
    for _ in range(rng.randint(1, max_tries + 1)):
        num_vertex = rng.randint(min_num_vertex, max_num_vertex + 1)
        angle_min = mean_angle - rng.uniform(0, angle_range)
        angle_max = mean_angle + rng.uniform(0, angle_range)
        angles = []
        for i in range(num_vertex):
            a = rng.uniform(angle_min, angle_max)
            angles.append(2 * math.pi - a if i % 2 == 0 else a)
        vx, vy = rng.randint(0, w), rng.randint(0, h)
        vertex = [(vx, vy)]
        avg_radius = math.hypot(h, w) / 8
        for a in angles:
            r = np.clip(rng.normal(avg_radius, avg_radius // 2), 0, 2 * avg_radius)
            nx = np.clip(vertex[-1][0] + r * math.cos(a), 0, w)
            ny = np.clip(vertex[-1][1] + r * math.sin(a), 0, h)
            vertex.append((int(nx), int(ny)))
        width = int(rng.uniform(min_width, max_width))
        draw.line(vertex, fill=1, width=width)
        for vx, vy in vertex:
            draw.ellipse((vx - width // 2, vy - width // 2,
                          vx + width // 2, vy + width // 2), fill=1)
    return np.asarray(mask, np.uint8)


def random_mask_gen(rng: np.random.RandomState, h, w) -> np.ndarray:
    """reserved=1 / hole=0 mask (train_brushnet_sdxl.py:863-866)."""
    mask = np.ones((h, w), np.uint8)
    mask = np.logical_and(mask, 1 - random_brush_gen(rng, 4, h, w))
    return mask.astype(np.float32)


def rle2mask(mask_rle, shape) -> np.ndarray:
    """RLE segmentation decode (train_brushnet_sdxl.py:869-878)."""
    mask_rle = np.array(mask_rle)
    starts, lengths = mask_rle[0:][::2].astype(int), mask_rle[1:][::2].astype(int)
    starts -= 1
    img = np.zeros(shape[0] * shape[1], np.uint8)
    for lo, hi in zip(starts, starts + lengths):
        img[lo:hi] = 1
    return img.reshape(shape, order="F")


# ------------------------------------------------------------------ training
def make_brushnet_train_step(
    unet_cfg: UNet2DConfig,
    brushnet_cfg: UNet2DConfig,
    unet_params: Any,  # frozen SDXL UNet
    optimizer: optax.GradientTransformation,
    *,
    scheduler: Optional[DDPMScheduler] = None,
    conditioning_scale: float = 1.0,
):
    """(init_state, train_step) training the BrushNet branch only.

    Batch: {latents (B,4,h,w) scaled, cond_latents (B,4,h,w) VAE(masked)·sf,
            mask_latents (B,1,h,w), prompt_embeds, pooled, time_ids (B,6)}.
    """
    sched = scheduler or DDPMScheduler()

    def loss_fn(bn_params, batch, rng):
        latents = batch["latents"]
        b = latents.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        timesteps = jax.random.randint(rng_t, (b,), 0, sched.num_train_timesteps)
        noise = jax.random.normal(rng_n, latents.shape, latents.dtype)
        noisy = sched.add_noise(latents, noise, timesteps)

        cond = jnp.concatenate([batch["cond_latents"], batch["mask_latents"]], axis=1)
        down, mid, up = brushnet_forward(
            bn_params, brushnet_cfg, noisy, timesteps.astype(jnp.float32),
            batch["prompt_embeds"], cond,
            text_embeds=batch["pooled"], time_ids=batch["time_ids"],
            conditioning_scale=conditioning_scale,
        )
        pred = unet2d_forward(
            unet_params, unet_cfg, noisy, timesteps.astype(jnp.float32),
            batch["prompt_embeds"], text_embeds=batch["pooled"],
            time_ids=batch["time_ids"],
            down_block_add_samples=list(down), mid_block_add_sample=mid,
            up_block_add_samples=list(up),
        )
        return jnp.mean((pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)

    def init_state(bn_params):
        return TrainState(params=bn_params, opt_state=optimizer.init(bn_params),
                          step=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, donate_argnums=_donate())
    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_state, train_step
