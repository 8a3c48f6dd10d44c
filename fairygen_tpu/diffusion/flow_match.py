"""Rectified-flow (flow matching) scheduler.

Math is identical to the reference
(``animation/diffsynth/diffusion/flow_match.py``): per-family sigma
templates, Euler step ``x += v·(σ' − σ)``, ``add_noise = (1−σ)x₀ + σε``,
training target ``ε − x₀``, and the Gaussian-bell training weights
(``set_training_weight``, flow_match.py:120-130).

JAX-native design: the schedule is a static numpy table computed host-side
at ``set_timesteps`` time; inside a jitted denoise loop, steps are indexed
by the integer step id (``lax.fori_loop`` friendly — no argmin over
timesteps needed at inference).  ``index_for_timestep`` reproduces the
reference's argmin lookup for training/compat paths.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["FlowMatchScheduler"]


def _sigmas_shifted(num_steps, denoising_strength, shift, endpoint: bool):
    """linspace(σ_start, 0) with rational shift σ ← s·σ/(1+(s−1)σ)."""
    sigma_start = denoising_strength  # sigma_min=0, sigma_max=1
    if endpoint:
        sigmas = np.linspace(sigma_start, 0.0, num_steps, dtype=np.float64)
    else:
        sigmas = np.linspace(sigma_start, 0.0, num_steps + 1, dtype=np.float64)[:-1]
    return shift * sigmas / (1 + (shift - 1) * sigmas)


def set_timesteps_wan(num_inference_steps=100, denoising_strength=1.0, shift=None):
    # reference flow_match.py:30-39
    shift = 5.0 if shift is None else shift
    sigmas = _sigmas_shifted(num_inference_steps, denoising_strength, shift, endpoint=False)
    return sigmas, sigmas * 1000.0


def set_timesteps_flux(num_inference_steps=100, denoising_strength=1.0, shift=None):
    # reference flow_match.py:18-27 (sigma_min = 0.003/1.002, endpoint linspace)
    shift = 3.0 if shift is None else shift
    sigma_min = 0.003 / 1.002
    sigma_start = sigma_min + (1.0 - sigma_min) * denoising_strength
    sigmas = np.linspace(sigma_start, sigma_min, num_inference_steps, dtype=np.float64)
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    return sigmas, sigmas * 1000.0


def _calculate_shift_qwen_image(
    image_seq_len, base_seq_len=256, max_seq_len=8192, base_shift=0.5, max_shift=0.9
):
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def set_timesteps_qwen_image(
    num_inference_steps=100,
    denoising_strength=1.0,
    exponential_shift_mu=None,
    dynamic_shift_len=None,
):
    # reference flow_match.py:49-71
    sigmas = np.linspace(
        denoising_strength, 0.0, num_inference_steps + 1, dtype=np.float64
    )[:-1]
    if exponential_shift_mu is not None:
        mu = exponential_shift_mu
    elif dynamic_shift_len is not None:
        mu = _calculate_shift_qwen_image(dynamic_shift_len)
    else:
        mu = 0.8
    sigmas = math.exp(mu) / (math.exp(mu) + (1 / sigmas - 1))
    one_minus_z = 1 - sigmas
    scale_factor = one_minus_z[-1] / (1 - 0.02)  # shift_terminal = 0.02
    sigmas = 1 - (one_minus_z / scale_factor)
    return sigmas, sigmas * 1000.0


def compute_empirical_mu(image_seq_len, num_steps):
    # reference flow_match.py:74-89
    a1, b1 = 8.73809524e-05, 1.89833333
    a2, b2 = 0.00016927, 0.45666666
    if image_seq_len > 4300:
        return float(a2 * image_seq_len + b2)
    m_200 = a2 * image_seq_len + b2
    m_10 = a1 * image_seq_len + b1
    a = (m_200 - m_10) / 190.0
    b = m_200 - 200.0 * a
    return float(a * num_steps + b)


def set_timesteps_flux2(
    num_inference_steps=100, denoising_strength=1.0, dynamic_shift_len=1024 // 16 * 1024 // 16
):
    # reference flow_match.py:92-101
    sigma_min = 1 / num_inference_steps
    sigma_start = sigma_min + (1.0 - sigma_min) * denoising_strength
    sigmas = np.linspace(sigma_start, sigma_min, num_inference_steps, dtype=np.float64)
    mu = compute_empirical_mu(dynamic_shift_len, num_inference_steps)
    sigmas = math.exp(mu) / (math.exp(mu) + (1 / sigmas - 1))
    return sigmas, sigmas * 1000.0


def set_timesteps_z_image(
    num_inference_steps=100, denoising_strength=1.0, shift=None, target_timesteps=None
):
    # reference flow_match.py:104-118
    shift = 3.0 if shift is None else shift
    sigmas = _sigmas_shifted(num_inference_steps, denoising_strength, shift, endpoint=False)
    timesteps = sigmas * 1000.0
    if target_timesteps is not None:
        for t in np.asarray(target_timesteps, dtype=np.float64):
            idx = int(np.argmin(np.abs(timesteps - t)))
            timesteps[idx] = t
    return sigmas, timesteps


_TEMPLATES = {
    "FLUX.1": set_timesteps_flux,
    "Wan": set_timesteps_wan,
    "Qwen-Image": set_timesteps_qwen_image,
    "FLUX.2": set_timesteps_flux2,
    "Z-Image": set_timesteps_z_image,
}


class FlowMatchScheduler:
    """Host-side schedule table + pure jnp step functions."""

    num_train_timesteps = 1000

    def __init__(self, template: str = "FLUX.1"):
        self.set_timesteps_fn = _TEMPLATES.get(template, set_timesteps_flux)
        self.sigmas: Optional[np.ndarray] = None
        self.timesteps: Optional[np.ndarray] = None
        self.training = False
        self.linear_timesteps_weights: Optional[np.ndarray] = None

    # ------------------------------------------------------------------ setup
    def set_timesteps(
        self, num_inference_steps=100, denoising_strength=1.0, training=False, **kwargs
    ):
        self.sigmas, self.timesteps = self.set_timesteps_fn(
            num_inference_steps=num_inference_steps,
            denoising_strength=denoising_strength,
            **kwargs,
        )
        self.training = training
        if training:
            self._set_training_weight()
        return self

    def _set_training_weight(self):
        # reference flow_match.py:120-130 (Gaussian bell over timesteps).
        # float32 to match torch's default dtype bit-for-bit.
        steps = 1000
        x = self.timesteps.astype(np.float32)
        y = np.exp(-2 * ((x - steps / 2) / steps) ** 2)
        y_shifted = y - y.min()
        w = y_shifted * (steps / y_shifted.sum())
        if len(self.timesteps) != 1000:
            w = w * (len(self.timesteps) / steps)
            w = w + w[1]
        self.linear_timesteps_weights = w

    # ------------------------------------------------------------- pure steps
    def index_for_timestep(self, timestep):
        """argmin |timesteps − t| — reference flow_match.py:147."""
        ts = jnp.asarray(self.timesteps)
        return jnp.argmin(jnp.abs(ts - timestep))

    def step(self, model_output, step_index, sample, to_final=False):
        """Euler flow step, indexed by integer step id (traced ok)."""
        sigmas = jnp.asarray(self.sigmas, dtype=jnp.float32)
        n = sigmas.shape[0]
        sigma = sigmas[step_index]
        if isinstance(step_index, int) and not to_final:
            sigma_next = sigmas[step_index + 1] if step_index + 1 < n else jnp.float32(0)
        elif to_final:
            sigma_next = jnp.float32(0.0)
        else:
            sigma_next = jnp.where(
                step_index + 1 >= n, 0.0, sigmas[jnp.minimum(step_index + 1, n - 1)]
            )
        coef = (sigma_next - sigma).astype(sample.dtype)
        return sample + model_output * coef

    def step_by_timestep(self, model_output, timestep, sample, to_final=False):
        return self.step(model_output, self.index_for_timestep(timestep), sample, to_final)

    def add_noise(self, original_samples, noise, step_index):
        sigma = jnp.asarray(self.sigmas, dtype=jnp.float32)[step_index].astype(
            original_samples.dtype
        )
        return (1 - sigma) * original_samples + sigma * noise

    def add_noise_by_timestep(self, original_samples, noise, timestep):
        return self.add_noise(original_samples, noise, self.index_for_timestep(timestep))

    def return_to_timestep(self, timestep, sample, sample_stablized):
        sigma = jnp.asarray(self.sigmas, dtype=jnp.float32)[
            self.index_for_timestep(timestep)
        ]
        return (sample - sample_stablized) / sigma

    @staticmethod
    def training_target(sample, noise, timestep=None):
        return noise - sample

    def training_weight(self, timestep):
        idx = self.index_for_timestep(timestep)
        return jnp.asarray(self.linear_timesteps_weights, dtype=jnp.float32)[idx]
