"""SDXL few-step distillation (LCM / direct rollout-match).

The Wan-side distillation lives in ``train_step.make_wan_distill_train_step``
(the reference's ``--task direct_distill``, diffusion/loss.py:24-33).  This
module is its SDXL analogue — the recipe that turns the measured
0.111 img/s 50-step floor into the measured 1.85 img/s 4-step path
(docs/NOTES.md): distill the 50-step ε-prediction teacher into a student
whose 4-8 step LCM rollout reproduces the teacher's full rollout.

Two objectives:

  * ``method="direct"`` — the student's few-step LCM rollout from noise
    must match the frozen teacher's full DDIM rollout from the SAME noise
    (the reference DirectDistillLoss philosophy, loss.py:24-33, applied
    teacher->student instead of data->student; gradients flow through
    every student step).
  * ``method="consistency"`` — latent consistency distillation (LCM):
    noise data latents to a random origin-grid timestep, take ONE teacher
    DDIM step backwards along the grid, and require the student's
    boundary-scaled consistency function to agree between the two points
    (stop-gradient target; the tiny-scale recipe drops EMA and CFG
    augmentation).

Both jit end-to-end.  ``tools/run_distill_experiment.py`` runs the recipe
at tiny scale and ``tests/test_distillation.py`` gates the student's
rollout against its teacher with PSNR.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.lcm import LCMScheduler
from .train_step import TrainState, _donate

__all__ = [
    "ddim_tables",
    "sdxl_teacher_rollout",
    "sdxl_student_rollout",
    "make_sdxl_distill_train_step",
    "rollout_psnr",
]


def ddim_tables(num_steps: int, scheduler: Optional[LCMScheduler] = None):
    """Deterministic DDIM tables on the diffusers "leading"-spaced grid
    (SDXL scaled-linear betas)."""
    sched = scheduler or LCMScheduler()
    n_train = sched.num_train_timesteps
    t = (np.arange(num_steps) * (n_train // num_steps))[::-1].copy()
    alpha = sched.alphas_cumprod[t]
    alpha_prev = np.concatenate(
        [sched.alphas_cumprod[t[1:]], [sched.final_alpha_cumprod]])
    return dict(
        timesteps=jnp.asarray(t, jnp.float32),
        sqrt_alpha=jnp.asarray(np.sqrt(alpha), jnp.float32),
        sqrt_beta=jnp.asarray(np.sqrt(1 - alpha), jnp.float32),
        sqrt_alpha_prev=jnp.asarray(np.sqrt(alpha_prev), jnp.float32),
        sqrt_beta_prev=jnp.asarray(np.sqrt(1 - alpha_prev), jnp.float32),
    )


def sdxl_teacher_rollout(unet_fn: Callable, params, noise, ctx,
                         num_steps: int = 50):
    """Frozen ε-pred teacher, ``num_steps`` DDIM updates from pure noise.
    Returns the final x0 estimate (stop-gradient)."""
    tab = ddim_tables(num_steps)

    def step(i, x):
        t = jnp.broadcast_to(tab["timesteps"][i], (x.shape[0],))
        eps = unet_fn(params, x, t, ctx).astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        x0 = (x32 - tab["sqrt_beta"][i] * eps) / tab["sqrt_alpha"][i]
        return (tab["sqrt_alpha_prev"][i] * x0
                + tab["sqrt_beta_prev"][i] * eps).astype(x.dtype)

    out = jax.lax.fori_loop(0, num_steps, step, noise)
    return jax.lax.stop_gradient(out)


def sdxl_student_rollout(unet_fn: Callable, params, noise, ctx, rng,
                         num_steps: int = 4,
                         original_inference_steps: int = 50):
    """Few-step LCM rollout (scheduling_lcm.py semantics via
    ``LCMScheduler.step_from_tables``); differentiable through every step."""
    sched = LCMScheduler(original_inference_steps=original_inference_steps)
    sched.set_timesteps(num_steps)
    tab = sched.tables()
    noises = jax.random.normal(rng, (num_steps,) + noise.shape, noise.dtype)

    def step(i, carry):
        x, _ = carry
        t = jnp.broadcast_to(tab["timesteps"][i], (x.shape[0],))
        eps = unet_fn(params, x, t, ctx)
        return sched.step_from_tables(tab, eps, i, x, noises[i])

    _, denoised = jax.lax.fori_loop(0, num_steps, step,
                                    (noise, jnp.zeros_like(noise)))
    return denoised


def make_sdxl_distill_train_step(
    unet_fn: Callable,  # (params, sample, timestep, ctx) -> eps
    optimizer: optax.GradientTransformation,
    teacher_params,
    *,
    method: str = "direct",  # "direct" | "consistency"
    num_student_steps: int = 4,
    num_teacher_steps: int = 50,
    original_inference_steps: int = 50,
):
    """Returns (init_state, train_step).

    batch: {"noise": (B,4,H,W)} for "direct";
           {"latents": clean data latents} for "consistency".
    ``ctx`` is whatever pytree ``unet_fn`` expects as its conditioning
    argument (e.g. dict with prompt_embeds/pooled/time_ids) — passed
    through as ``batch["ctx"]``.
    """
    sched = LCMScheduler(original_inference_steps=original_inference_steps)
    # LCM origin grid (k·i − 1) and its one-step-back DDIM targets
    k = sched.num_train_timesteps // original_inference_steps
    origin_t = np.arange(1, original_inference_steps + 1) * k - 1
    prev_t = np.concatenate([[0], origin_t[:-1]])  # one grid step earlier
    alpha_o = sched.alphas_cumprod[origin_t]
    alpha_p = np.where(prev_t > 0, sched.alphas_cumprod[prev_t], 1.0)
    scaled = origin_t.astype(np.float64) * sched.timestep_scaling
    scaled_p = prev_t.astype(np.float64) * sched.timestep_scaling
    c = dict(
        origin_t=jnp.asarray(origin_t, jnp.float32),
        prev_t=jnp.asarray(prev_t, jnp.float32),
        sa=jnp.asarray(np.sqrt(alpha_o), jnp.float32),
        sb=jnp.asarray(np.sqrt(1 - alpha_o), jnp.float32),
        sa_p=jnp.asarray(np.sqrt(alpha_p), jnp.float32),
        sb_p=jnp.asarray(np.sqrt(1 - alpha_p), jnp.float32),
        c_skip=jnp.asarray(
            sched.sigma_data ** 2 / (scaled ** 2 + sched.sigma_data ** 2),
            jnp.float32),
        c_out=jnp.asarray(
            scaled / (scaled ** 2 + sched.sigma_data ** 2) ** 0.5,
            jnp.float32),
        c_skip_p=jnp.asarray(
            sched.sigma_data ** 2 / (scaled_p ** 2 + sched.sigma_data ** 2),
            jnp.float32),
        c_out_p=jnp.asarray(
            scaled_p / (scaled_p ** 2 + sched.sigma_data ** 2) ** 0.5,
            jnp.float32),
    )

    def consistency_fn(params, x, t_idx, ctx, skip, out):
        t = jnp.broadcast_to(c["origin_t"][t_idx], (x.shape[0],))
        eps = unet_fn(params, x, t, ctx).astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        x0 = (x32 - c["sb"][t_idx] * eps) / c["sa"][t_idx]
        return out[t_idx] * x0 + skip[t_idx] * x32

    def loss_direct(params, batch, rng):
        noise, ctx = batch["noise"], batch["ctx"]
        target = sdxl_teacher_rollout(unet_fn, teacher_params, noise, ctx,
                                      num_teacher_steps)
        student = sdxl_student_rollout(
            unet_fn, params, noise, ctx, rng, num_student_steps,
            original_inference_steps)
        return jnp.mean(
            (student.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    def loss_consistency(params, batch, rng):
        x0, ctx = batch["latents"], batch["ctx"]
        rng_t, rng_n = jax.random.split(rng)
        n = jax.random.randint(rng_t, (), 1, original_inference_steps)
        eps = jax.random.normal(rng_n, x0.shape, x0.dtype)
        x_n1 = (c["sa"][n] * x0.astype(jnp.float32)
                + c["sb"][n] * eps.astype(jnp.float32)).astype(x0.dtype)
        # one frozen-teacher DDIM step back along the origin grid
        t = jnp.broadcast_to(c["origin_t"][n], (x0.shape[0],))
        eps_t = jax.lax.stop_gradient(
            unet_fn(teacher_params, x_n1, t, ctx)).astype(jnp.float32)
        x0_t = (x_n1.astype(jnp.float32) - c["sb"][n] * eps_t) / c["sa"][n]
        x_n = (c["sa_p"][n] * x0_t + c["sb_p"][n] * eps_t).astype(x0.dtype)
        # f_theta(x_{n+1}, t_{n+1}) ~= stopgrad f_theta(x_n, t_n)
        online = consistency_fn(params, x_n1, n, ctx, c["c_skip"], c["c_out"])
        # target uses the PREVIOUS grid point's boundary scalings
        t_prev = jnp.broadcast_to(c["prev_t"][n], (x0.shape[0],))
        eps_s = unet_fn(params, x_n, t_prev, ctx).astype(jnp.float32)
        x0_s = jnp.where(
            c["prev_t"][n] > 0,
            (x_n.astype(jnp.float32) - c["sb_p"][n] * eps_s) / c["sa_p"][n],
            x_n.astype(jnp.float32))
        target = jax.lax.stop_gradient(
            c["c_out_p"][n] * x0_s + c["c_skip_p"][n] * x_n.astype(jnp.float32))
        return jnp.mean((online - target) ** 2)

    loss_fn = loss_direct if method == "direct" else loss_consistency

    def init_state(params):
        return TrainState(params=params, opt_state=optimizer.init(params),
                          step=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, donate_argnums=_donate())
    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), loss)

    return init_state, train_step


def rollout_psnr(a, b) -> float:
    """Data-range PSNR between two rollout outputs (the student-vs-teacher
    quality gate)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    rng = b.max() - b.min()
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(rng * rng / mse))
