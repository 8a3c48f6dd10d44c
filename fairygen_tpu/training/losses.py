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


def trajectory_imitation_loss(
    student_fn: Callable,  # (params, latents, timestep, context) -> v
    teacher_fn: Callable,  # (latents, timestep, context) -> v  (frozen)
    params,
    noise,
    context,
    *,
    num_student_steps: int = 8,
    num_teacher_steps: int = 50,
    sigma_shift: float = 5.0,
    perceptual_fn: Optional[Callable] = None,  # (img_a, img_b) -> scalar
    decode_fn: Optional[Callable] = None,  # latents -> images for perceptual_fn
):
    """Trajectory-imitation distillation — reference
    ``diffusion/loss.py:36-119`` (TrajectoryImitationLoss):

      1. roll the TEACHER from the same noise for ``num_teacher_steps``
         (timesteps snapped to include the student grid,
         set_timesteps_z_image-style target_timesteps), no gradients;
      2. at every student timestep, supervise the student's velocity with
         the teacher's finite-difference velocity between its snapped
         trajectory points (weighted MSE);
      3. optional perceptual regularizer between the student rollout's
         decode and the teacher's final decode (the reference uses LPIPS —
         pass any perceptual_fn).
    """
    from ..diffusion.flow_match import FlowMatchScheduler

    stu = FlowMatchScheduler("Wan").set_timesteps(
        num_student_steps, training=True, shift=sigma_shift
    )
    tea = FlowMatchScheduler("Wan").set_timesteps(num_teacher_steps, shift=sigma_shift)
    # snap teacher timesteps to contain the student grid (loss.py:49 —
    # target_timesteps argument of set_timesteps).  Only the TIMESTEPS are
    # snapped, not the sigmas — exactly like the reference
    # (flow_match.py:113-117 mutates timesteps only), so the rollout steps
    # with the teacher's own sigma grid.
    t_tea = np.asarray(tea.timesteps).copy()
    for t in stu.timesteps:
        t_tea[int(np.argmin(np.abs(t_tea - t)))] = t
    sig_tea = np.asarray(tea.sigmas)

    # 1. teacher rollout (stop-gradient)
    traj = [noise]
    lat = noise
    for i in range(num_teacher_steps):
        t = jnp.broadcast_to(jnp.asarray(t_tea[i], jnp.float32), (lat.shape[0],))
        v = jax.lax.stop_gradient(teacher_fn(lat, t, context))
        s_next = sig_tea[i + 1] if i + 1 < num_teacher_steps else 0.0
        lat = lat + v.astype(lat.dtype) * jnp.asarray(s_next - sig_tea[i], lat.dtype)
        traj.append(lat)

    # 2. align the student's velocity with teacher finite differences
    loss = jnp.float32(0)
    for i, t in enumerate(stu.timesteps):
        i_tea = int(np.argmin(np.abs(t_tea - t)))
        lat_i = jax.lax.stop_gradient(traj[i_tea])
        sigma = stu.sigmas[i]
        if i + 1 >= num_student_steps:
            sigma_next, lat_next = 0.0, traj[-1]
        else:
            sigma_next = stu.sigmas[i + 1]
            lat_next = traj[int(np.argmin(np.abs(t_tea - stu.timesteps[i + 1])))]
        lat_next = jax.lax.stop_gradient(lat_next)
        target = (lat_next.astype(jnp.float32) - lat_i.astype(jnp.float32)) / (
            sigma_next - sigma
        )
        tvec = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (lat_i.shape[0],))
        pred = student_fn(params, lat_i, tvec, context)
        w = jnp.asarray(stu.linear_timesteps_weights, jnp.float32)[i]
        loss = loss + jnp.mean((pred.astype(jnp.float32) - target) ** 2) * w

    # 3. optional perceptual regularization on the student rollout.
    # The per-step stop_gradient(v) is reference-exact: the reference's
    # compute_regularization steps its rollout with noise_pred.detach()
    # (loss.py:104), so there too the LPIPS term contributes the VALUE but
    # no gradient — preserved as a logged-loss-parity quirk, not a choice.
    if perceptual_fn is not None and decode_fn is not None:
        lat = traj[0]
        sig_stu = np.append(np.asarray(stu.sigmas), 0.0)
        for i, t in enumerate(stu.timesteps):
            tvec = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (lat.shape[0],))
            v = student_fn(params, lat, tvec, context)
            lat = lat + jax.lax.stop_gradient(v).astype(lat.dtype) * jnp.asarray(
                sig_stu[i + 1] - sig_stu[i], lat.dtype
            )
        loss = loss + jnp.mean(perceptual_fn(decode_fn(lat), decode_fn(traj[-1])))
    return loss
