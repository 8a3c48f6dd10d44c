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


import jax as _jax  # noqa: E402

_jax.tree_util.register_dataclass(
    DPMState, data_fields=["prev_x0", "has_prev"], meta_fields=[]
)


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
        self._build_step_tables()
        return self

    def _build_step_tables(self):
        """Per-step update coefficients so ``step`` is a pure table lookup:

            x_next = c_x[i]·x + c0[i]·x0 + c1[i]·(x0 − prev_x0)

        (c1 = 0 on forced first-order steps), which makes the whole solver
        indexable with a TRACED step index — the denoise loop can live
        inside one jitted ``lax.fori_loop``."""
        n = self.num_inference_steps
        sig, ah, sh = self.sigmas, self._alpha_hat, self._sigma_hat

        def lam(j):
            return np.log(ah[j]) - np.log(sh[j]) if sig[j] > 0 else np.inf

        c_x = np.zeros((n,), np.float64)
        c0 = np.zeros((n,), np.float64)
        c1 = np.zeros((n,), np.float64)
        for i in range(n):
            s, t = i, i + 1
            first = (i == 0) or (self.lower_order_final and i == n - 1) or sig[t] == 0
            if sig[t] == 0:
                c_x[i], c0[i], c1[i] = 0.0, 1.0, 0.0
                continue
            h = lam(t) - lam(s)
            e = np.exp(-h) - 1.0
            c_x[i] = sh[t] / sh[s]
            c0[i] = -ah[t] * e
            if not first and np.isfinite(h):
                r = (lam(s) - lam(i - 1)) / h
                c1[i] = -0.5 * ah[t] * e / r
        self._c_x, self._c0, self._c1 = c_x, c0, c1

    # ------------------------------------------------------------- state API
    def init_state(self, shape, dtype=jnp.float32) -> DPMState:
        return DPMState(
            prev_x0=jnp.zeros(shape, dtype=dtype), has_prev=jnp.zeros((), jnp.bool_)
        )

    def _to_x0(self, model_output, sample, step_index):
        """Convert ε (or v / x0) prediction to x0 in sigma space.
        ``step_index`` may be a static int or a traced scalar."""
        alpha_hat = jnp.asarray(self._alpha_hat[:-1], jnp.float32)[step_index]
        sigma_hat = jnp.asarray(self._sigma_hat[:-1], jnp.float32)[step_index]
        x = sample.astype(jnp.float32)
        m = model_output.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            return (x - sigma_hat * m) / alpha_hat
        if self.prediction_type == "v_prediction":
            return alpha_hat * x - sigma_hat * m
        if self.prediction_type == "sample":
            return m
        raise ValueError(self.prediction_type)

    def step(self, state: DPMState, model_output, step_index, sample):
        """DPM-Solver++(2M) step.  ``step_index`` may be a static python int
        OR a traced scalar (the coefficients are precomputed tables), so the
        whole denoise loop can run inside one jitted ``lax.fori_loop``."""
        return self.step_from_tables(
            self.tables(), state, model_output, step_index, sample,
            prediction_type=self.prediction_type,
        )

    def tables(self):
        """Step tables as a jnp pytree — pass into jitted loops as a traced
        argument so one compiled program serves any step count."""
        return dict(
            timesteps=jnp.asarray(self.timesteps, jnp.float32),
            alpha_hat=jnp.asarray(self._alpha_hat[:-1], jnp.float32),
            sigma_hat=jnp.asarray(self._sigma_hat[:-1], jnp.float32),
            c_x=jnp.asarray(self._c_x, jnp.float32),
            c0=jnp.asarray(self._c0, jnp.float32),
            c1=jnp.asarray(self._c1, jnp.float32),
        )

    @staticmethod
    def step_from_tables(tables, state: DPMState, model_output, step_index,
                         sample, prediction_type: str = "epsilon"):
        """Pure-function form of :meth:`step` over a :meth:`tables` pytree."""
        i = step_index
        x = sample.astype(jnp.float32)
        m = model_output.astype(jnp.float32)
        if prediction_type == "epsilon":
            x0 = (x - tables["sigma_hat"][i] * m) / tables["alpha_hat"][i]
        elif prediction_type == "v_prediction":
            x0 = tables["alpha_hat"][i] * x - tables["sigma_hat"][i] * m
        elif prediction_type == "sample":
            x0 = m
        else:
            raise ValueError(prediction_type)

        # c1 == 0 on first-order steps (i==0 / lower_order_final / σ_t==0),
        # so has_prev only matters for an externally-reset state mid-run
        d1 = jnp.where(state.has_prev, x0 - state.prev_x0, jnp.zeros_like(x0))
        x_next = tables["c_x"][i] * x + tables["c0"][i] * x0 + tables["c1"][i] * d1
        new_state = DPMState(prev_x0=x0, has_prev=jnp.ones((), jnp.bool_))
        return x_next.astype(sample.dtype), new_state
