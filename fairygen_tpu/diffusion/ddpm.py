"""DDPM (ε-prediction) scheduler for the SDXL stylization path.

Covers what FairyGen uses of diffusers' DDPMScheduler
(reference: ``stylization/BrushNet/src/diffusers/schedulers/scheduling_ddpm.py``;
DoRA trainer usage at ``stylization/dora_training/train.py:1226-1240``):
scaled-linear betas, ``add_noise``, velocity targets, SNR computation, and
ancestral sampling steps for inference.

Schedule tables are host-side numpy; ``add_noise``/``step`` are pure jnp.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DDPMScheduler"]


class DDPMScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "epsilon",
        timestep_spacing: str = "leading",
        steps_offset: int = 1,
        clip_sample: bool = False,
        variance_type: str = "fixed_small",
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        self.clip_sample = clip_sample
        self.variance_type = variance_type

        if beta_schedule == "scaled_linear":
            betas = (
                np.linspace(
                    beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
                )
                ** 2
            )
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
        elif beta_schedule == "squaredcos_cap_v2":
            t = np.arange(num_train_timesteps, dtype=np.float64)

            def bar(u):
                return np.cos((u + 0.008) / 1.008 * np.pi / 2) ** 2

            betas = np.minimum(
                1 - bar((t + 1) / num_train_timesteps) / bar(t / num_train_timesteps), 0.999
            )
        else:
            raise ValueError(beta_schedule)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas)
        self.timesteps = np.arange(num_train_timesteps)[::-1].copy()
        self.num_inference_steps: Optional[int] = None

    # ------------------------------------------------------------- schedules
    def set_timesteps(self, num_inference_steps: int):
        n, N = num_inference_steps, self.num_train_timesteps
        if self.timestep_spacing == "leading":
            step = N // n
            ts = (np.arange(n) * step).round()[::-1].astype(np.int64) + self.steps_offset
        elif self.timestep_spacing == "linspace":
            ts = np.linspace(0, N - 1, n).round()[::-1].astype(np.int64)
        elif self.timestep_spacing == "trailing":
            ts = np.arange(N, 0, -N / n).round().astype(np.int64) - 1
        else:
            raise ValueError(self.timestep_spacing)
        self.num_inference_steps = n
        self.timesteps = ts
        return self

    # ------------------------------------------------------------ pure jnp ops
    def add_noise(self, original_samples, noise, timesteps):
        ac = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[timesteps]
        sqrt_ac = jnp.sqrt(ac).astype(original_samples.dtype)
        sqrt_1mac = jnp.sqrt(1.0 - ac).astype(original_samples.dtype)
        shape = (-1,) + (1,) * (original_samples.ndim - 1)
        return sqrt_ac.reshape(shape) * original_samples + sqrt_1mac.reshape(shape) * noise

    def get_velocity(self, sample, noise, timesteps):
        ac = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[timesteps]
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sqrt_ac = jnp.sqrt(ac).reshape(shape).astype(sample.dtype)
        sqrt_1mac = jnp.sqrt(1.0 - ac).reshape(shape).astype(sample.dtype)
        return sqrt_ac * noise - sqrt_1mac * sample

    def snr(self, timesteps):
        ac = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[timesteps]
        return ac / (1.0 - ac)

    def _predict_x0(self, model_output, sample, ac_t):
        if self.prediction_type == "epsilon":
            return (sample - jnp.sqrt(1 - ac_t) * model_output) / jnp.sqrt(ac_t)
        if self.prediction_type == "v_prediction":
            return jnp.sqrt(ac_t) * sample - jnp.sqrt(1 - ac_t) * model_output
        if self.prediction_type == "sample":
            return model_output
        raise ValueError(self.prediction_type)

    def step(self, model_output, timestep, sample, noise=None):
        """One ancestral DDPM step (fixed_small variance)."""
        t = int(timestep)
        step_ratio = (
            self.num_train_timesteps // self.num_inference_steps
            if self.num_inference_steps
            else 1
        )
        prev_t = t - step_ratio
        ac = self.alphas_cumprod
        ac_t = jnp.float32(ac[t])
        ac_prev = jnp.float32(ac[prev_t]) if prev_t >= 0 else jnp.float32(1.0)
        beta_t = 1 - ac_t / ac_prev
        alpha_t = 1 - beta_t

        x0 = self._predict_x0(model_output.astype(jnp.float32), sample.astype(jnp.float32), ac_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1, 1)
        x0_coef = jnp.sqrt(ac_prev) * beta_t / (1 - ac_t)
        xt_coef = jnp.sqrt(alpha_t) * (1 - ac_prev) / (1 - ac_t)
        mean = x0_coef * x0 + xt_coef * sample.astype(jnp.float32)
        if prev_t >= 0 and noise is not None:
            var = jnp.clip((1 - ac_prev) / (1 - ac_t) * beta_t, 1e-20, None)
            mean = mean + jnp.sqrt(var) * noise.astype(jnp.float32)
        return mean.astype(sample.dtype)
