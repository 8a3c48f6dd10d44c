"""DPM-Solver++ multistep scheduler (order 2, the BrushNet-SDXL sampler).

Implements the algorithm used by the reference stylization entry point
(``stylization/BrushNet/examples/brushnet/test_brushnet_sdxl.py:126`` creates
``DPMSolverMultistepScheduler.from_config`` over the SDXL DDPM config:
scaled-linear betas, ``algorithm_type="dpmsolver++"``, ``solver_order=2``,
``lower_order_final=True``, leading timestep spacing with offset 1).

State (previous model outputs) is carried explicitly so the step function
stays pure and jit-friendly: ``state = scheduler.init_state()``,
``x, state = scheduler.step(state, eps, i, x)``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["DPMSolverMultistepScheduler"]


@dataclasses.dataclass
class DPMState:
    prev_x0: jnp.ndarray  # model output (converted to x0) at step i-1
    has_prev: jnp.ndarray  # scalar bool/int — whether prev_x0 is valid


class DPMSolverMultistepScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "epsilon",
        timestep_spacing: str = "leading",
        steps_offset: int = 1,
        solver_order: int = 2,
        lower_order_final: bool = True,
    ):
        assert beta_schedule == "scaled_linear"
        assert solver_order == 2
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        self.lower_order_final = lower_order_final

        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.num_inference_steps: Optional[int] = None

    def set_timesteps(self, num_inference_steps: int):
        n, N = num_inference_steps, self.num_train_timesteps
        if self.timestep_spacing == "leading":
            step = N // (n + 1)
            ts = (np.arange(n + 1) * step).round()[::-1][:-1].astype(np.int64)
            ts += self.steps_offset
        elif self.timestep_spacing == "linspace":
            ts = (
                np.linspace(0, N - 1, n + 1).round()[::-1][:-1].astype(np.int64)
            )
        else:
            raise ValueError(self.timestep_spacing)
        self.num_inference_steps = n
        self.timesteps = ts

        ac = self.alphas_cumprod[ts]
        alpha_t = np.sqrt(ac)
        sigma_t = np.sqrt(1 - ac)
        # sigma-space (Karras convention σ = sqrt(1-ᾱ)/sqrt(ᾱ)), final σ = 0
        sig = sigma_t / alpha_t
        self.sigmas = np.concatenate([sig, [0.0]])
        # λ = log(α/σ); store α_t, σ_t in the "dpmsolver++" data space:
        # α̂ = 1/sqrt(1+σ²), σ̂ = σ·α̂ over the extended sigma grid
        full = self.sigmas
        self._alpha_hat = 1.0 / np.sqrt(full**2 + 1)
        self._sigma_hat = full * self._alpha_hat
        return self

    # ------------------------------------------------------------- state API
    def init_state(self, shape, dtype=jnp.float32) -> DPMState:
        return DPMState(
            prev_x0=jnp.zeros(shape, dtype=dtype), has_prev=jnp.zeros((), jnp.bool_)
        )

    def _to_x0(self, model_output, sample, step_index):
        """Convert ε (or v / x0) prediction to x0 in sigma space."""
        sigma = jnp.float32(self.sigmas[step_index])
        alpha_hat = jnp.float32(self._alpha_hat[step_index])
        sigma_hat = jnp.float32(self._sigma_hat[step_index])
        x = sample.astype(jnp.float32)
        m = model_output.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            return (x - sigma_hat * m) / alpha_hat
        if self.prediction_type == "v_prediction":
            return alpha_hat * x - sigma_hat * m
        if self.prediction_type == "sample":
            return m
        raise ValueError(self.prediction_type)

    def step(self, state: DPMState, model_output, step_index: int, sample):
        """DPM-Solver++(2M) step at static python int ``step_index``."""
        i = step_index
        n = self.num_inference_steps
        x0 = self._to_x0(model_output, sample, i)

        sig = self.sigmas
        ah, sh = self._alpha_hat, self._sigma_hat

        def lam(j):
            return np.log(ah[j]) - np.log(sh[j]) if sig[j] > 0 else np.inf

        s, t = i, i + 1  # current → next in the extended grid
        lam_s, lam_t = lam(s), lam(t)
        x = sample.astype(jnp.float32)

        use_first_order = (i == 0) or (self.lower_order_final and i == n - 1) or sig[t] == 0

        if use_first_order or not np.isfinite(lam_t):
            # DPM-Solver++ 1st order == DDIM:  x_t = (σ̂_t/σ̂_s)x − α̂_t(e^{−h}−1)x0
            if sig[t] == 0:
                x_next = x0
            else:
                h = lam_t - lam_s
                x_next = (sh[t] / sh[s]) * x - ah[t] * (np.exp(-h) - 1.0) * x0
            # still record x0 so a 2nd-order step can follow a forced 1st-order one
            new_state = DPMState(prev_x0=x0, has_prev=jnp.ones((), jnp.bool_))
            return x_next.astype(sample.dtype), new_state

        # 2nd order multistep: uses x0 at i and i-1
        lam_p = lam(i - 1)
        h = lam_t - lam_s
        h_prev = lam_s - lam_p
        r = h_prev / h
        D0 = x0
        D1 = (x0 - state.prev_x0) / r
        x_next = (
            (sh[t] / sh[s]) * x
            - ah[t] * (np.exp(-h) - 1.0) * D0
            - 0.5 * ah[t] * (np.exp(-h) - 1.0) * D1
        )
        # fall back to first order when no previous output is available
        x_first = (sh[t] / sh[s]) * x - ah[t] * (np.exp(-h) - 1.0) * D0
        x_next = jnp.where(state.has_prev, x_next, x_first)
        new_state = DPMState(prev_x0=x0, has_prev=jnp.ones((), jnp.bool_))
        return x_next.astype(sample.dtype), new_state
