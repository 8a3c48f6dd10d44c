"""Training losses.

flow_match_sft_loss mirrors the reference ``FlowMatchSFTLoss``
(``animation/diffsynth/diffusion/loss.py:5-21``): uniform random timestep
index within [min,max] boundary fractions, rectified-flow add_noise,
weighted MSE on the (ε − x₀) velocity target.  Pure function of
(params, batch, rng) so it jits/shards/differentiates cleanly.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def flow_match_sft_loss(
    model_fn: Callable,  # (params, noisy_latents, timestep, context) -> v_pred
    params,
    input_latents,  # (B, C, F, H, W) clean latents
    context,  # (B, L, text_dim)
    rng,
    *,
    sigmas: np.ndarray,  # training schedule (1000 steps)
    timesteps: np.ndarray,
    weights: np.ndarray,
    min_timestep_boundary: float = 0.0,
    max_timestep_boundary: float = 1.0,
    first_frame_clean: bool = False,
):
    n = len(timesteps)
    lo = int(min_timestep_boundary * n)
    hi = int(max_timestep_boundary * n)
    rng_t, rng_n = jax.random.split(rng)
    idx = jax.random.randint(rng_t, (), lo, hi)

    sig = jnp.asarray(sigmas, jnp.float32)[idx].astype(input_latents.dtype)
    noise = jax.random.normal(rng_n, input_latents.shape, input_latents.dtype)
    noisy = (1 - sig) * input_latents + sig * noise
    if first_frame_clean:
        # TI2V first-frame conditioning: the first latent frame stays clean
        # (ImageEmbedderFused overwrite, reference wan_video.py:490-497).
        noisy = jnp.concatenate([input_latents[:, :, :1], noisy[:, :, 1:]], axis=2)
    target = noise - input_latents

    timestep = jnp.broadcast_to(
        jnp.asarray(timesteps, jnp.float32)[idx], (input_latents.shape[0],)
    )
    pred = model_fn(params, noisy, timestep, context)

    loss = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    w = jnp.asarray(weights, jnp.float32)[idx]
    return loss * w


def direct_distill_loss(
    model_fn: Callable,  # (params, latents, timestep, context) -> v_pred
    params,
    input_latents,
    context,
    rng,
    *,
    num_inference_steps: int = 4,
    sigma_shift: float = 5.0,
):
    """Full-rollout latent-match distillation — reference
    ``diffusion/loss.py:24-33`` (DirectDistillLoss): run the student through
    the whole (few-step) sampling trajectory from pure noise and match the
    final latents to the clean targets.  The rollout is a ``fori_loop`` so
    the whole objective jits; gradients flow through every step.
    """
    from ..diffusion.flow_match import FlowMatchScheduler

    sched = FlowMatchScheduler("Wan").set_timesteps(num_inference_steps, shift=sigma_shift)
    sigmas = jnp.asarray(np.append(sched.sigmas, 0.0), jnp.float32)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)

    noise = jax.random.normal(rng, input_latents.shape, input_latents.dtype)

    def step(i, lat):
        t = jnp.broadcast_to(timesteps[i], (lat.shape[0],))
        v = model_fn(params, lat, t, context)
        return lat + v.astype(lat.dtype) * (sigmas[i + 1] - sigmas[i]).astype(lat.dtype)

    lat = jax.lax.fori_loop(0, num_inference_steps, step, noise)
    return jnp.mean((lat.astype(jnp.float32) - input_latents.astype(jnp.float32)) ** 2)
