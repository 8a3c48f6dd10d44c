"""LCM (Latent Consistency Model) scheduler — the few-step SDXL sampler.

Implements the sampler behind the reference's inherited LCM-LoRA benchmark
harness (``stylization/BrushNet/benchmarks``; vendored diffusers v0.27
``schedulers/scheduling_lcm.py``): SDXL DDPM alphas (scaled-linear betas
0.00085→0.012), origin-grid timestep skipping, boundary-condition
scalings (sigma_data 0.5, timestep_scaling 10), and fresh noise injection
between multistep samples.

With an LCM-LoRA (or LCM-distilled student from
``training/train_step.make_wan_distill_train_step``'s SDXL analogue)
fused into the UNet, 50-step sampling collapses to 4-8 steps — the
published path past 1 img/s on a single chip.

Jit-friendly form: ``tables()`` returns per-step constants;
``step_from_tables`` is pure and takes the injected noise explicitly
(sampled by the caller from the seed), so a whole few-step rollout lives
in one compiled program.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["LCMScheduler"]


class LCMScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        original_inference_steps: int = 50,
        prediction_type: str = "epsilon",
        timestep_scaling: float = 10.0,
        sigma_data: float = 0.5,
        set_alpha_to_one: bool = True,
    ):
        assert beta_schedule == "scaled_linear"
        self.num_train_timesteps = num_train_timesteps
        self.original_inference_steps = original_inference_steps
        self.prediction_type = prediction_type
        self.timestep_scaling = timestep_scaling
        self.sigma_data = sigma_data

        betas = (
            np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
        )
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.final_alpha_cumprod = (1.0 if set_alpha_to_one
                                    else self.alphas_cumprod[0])
        self.timesteps: Optional[np.ndarray] = None
        self.num_inference_steps: Optional[int] = None

    def set_timesteps(self, num_inference_steps: int,
                      original_inference_steps: Optional[int] = None,
                      strength: float = 1.0):
        """Origin-grid skipping (scheduling_lcm.py:396-486): the LCM was
        distilled on ``original_inference_steps`` evenly spaced training
        timesteps; inference picks ``num_inference_steps`` of those."""
        original_steps = (original_inference_steps
                          or self.original_inference_steps)
        k = self.num_train_timesteps // original_steps
        lcm_origin = (np.arange(1, int(original_steps * strength) + 1)
                      * k - 1)
        if num_inference_steps > len(lcm_origin):
            raise ValueError(
                f"num_inference_steps={num_inference_steps} exceeds the "
                f"{len(lcm_origin)} origin timesteps")
        lcm_origin = lcm_origin[::-1].copy()
        idx = np.floor(
            np.linspace(0, len(lcm_origin), num=num_inference_steps,
                        endpoint=False)
        ).astype(np.int64)
        self.timesteps = lcm_origin[idx]
        self.num_inference_steps = num_inference_steps
        return self

    # -- pure/jit form -------------------------------------------------------
    def tables(self):
        """Per-step constants for a jitted rollout."""
        t = self.timesteps
        n = len(t)
        prev_t = np.concatenate([t[1:], t[-1:]])
        alpha = self.alphas_cumprod[t]
        alpha_prev = np.where(prev_t >= 0, self.alphas_cumprod[prev_t],
                              self.final_alpha_cumprod)
        scaled = t.astype(np.float64) * self.timestep_scaling
        c_skip = self.sigma_data ** 2 / (scaled ** 2 + self.sigma_data ** 2)
        c_out = scaled / (scaled ** 2 + self.sigma_data ** 2) ** 0.5
        # noise injected on every step except the last
        use_noise = (np.arange(n) != n - 1).astype(np.float64)
        return dict(
            timesteps=jnp.asarray(t, jnp.float32),
            sqrt_alpha=jnp.asarray(np.sqrt(alpha), jnp.float32),
            sqrt_beta=jnp.asarray(np.sqrt(1.0 - alpha), jnp.float32),
            sqrt_alpha_prev=jnp.asarray(np.sqrt(alpha_prev), jnp.float32),
            sqrt_beta_prev=jnp.asarray(np.sqrt(1.0 - alpha_prev),
                                       jnp.float32),
            c_skip=jnp.asarray(c_skip, jnp.float32),
            c_out=jnp.asarray(c_out, jnp.float32),
            use_noise=jnp.asarray(use_noise, jnp.float32),
        )

    def step_from_tables(self, tables, model_output, step_index, sample,
                         noise):
        """One LCM update (scheduling_lcm.py:500-590), pure.

        ``noise`` must be fresh N(0,1) per step (ignored on the last step
        via the ``use_noise`` gate, so a whole rollout stays shape-static).
        Returns (prev_sample, denoised).
        """
        i = step_index
        x = sample.astype(jnp.float32)
        m = model_output.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            x0 = (x - tables["sqrt_beta"][i] * m) / tables["sqrt_alpha"][i]
        elif self.prediction_type == "v_prediction":
            x0 = tables["sqrt_alpha"][i] * x - tables["sqrt_beta"][i] * m
        else:  # sample
            x0 = m
        denoised = tables["c_out"][i] * x0 + tables["c_skip"][i] * x
        g = tables["use_noise"][i]
        prev = jnp.where(
            g > 0,
            tables["sqrt_alpha_prev"][i] * denoised
            + tables["sqrt_beta_prev"][i] * noise.astype(jnp.float32),
            denoised,
        )
        return prev.astype(sample.dtype), denoised.astype(sample.dtype)
