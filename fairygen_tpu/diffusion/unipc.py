"""UniPC multistep scheduler (predictor-corrector, the SD1.5-BrushNet sampler).

Implements the algorithm used by the reference SD1.5 stylization entry point
(``examples/brushnet/test_brushnet.py:31`` wraps the base DDPM config in
``UniPCMultistepScheduler``): ``solver_order=2``, ``solver_type="bh2"``,
``predict_x0=True``, ``lower_order_final=True`` — behavior mirrored from
``src/diffusers/schedulers/scheduling_unipc_multistep.py:754-805`` (UniC
corrector applied to the PREVIOUS step's sample using the current model
output, then the UniP predictor).

All per-step coefficients are precomputed tables so ``step`` is pure array
math indexable with a TRACED step index — the whole denoise loop runs in
one jitted ``lax.fori_loop`` (same design as diffusion/dpm_solver.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["UniPCMultistepScheduler"]


@dataclasses.dataclass
class UniPCState:
    m_prev: jnp.ndarray  # x0 prediction at step i-1
    m_prev2: jnp.ndarray  # x0 prediction at step i-2
    last_sample: jnp.ndarray  # sample BEFORE the predictor at step i-1


jax.tree_util.register_dataclass(
    UniPCState, data_fields=["m_prev", "m_prev2", "last_sample"], meta_fields=[]
)


class UniPCMultistepScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "epsilon",
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
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
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps,
                        dtype=np.float64) ** 2
        )
        self.alphas_cumprod = np.cumprod(1.0 - betas)
        self.num_inference_steps: Optional[int] = None

    def set_timesteps(self, num_inference_steps: int):
        n, N = num_inference_steps, self.num_train_timesteps
        if self.timestep_spacing == "linspace":
            ts = (np.linspace(0, N - 1, n + 1).round()[::-1][:-1]
                  .astype(np.int64))
        elif self.timestep_spacing == "leading":
            step = N // (n + 1)
            ts = (np.arange(n + 1) * step).round()[::-1][:-1].astype(np.int64)
            ts += self.steps_offset
        else:
            raise ValueError(self.timestep_spacing)
        self.num_inference_steps = n
        self.timesteps = ts

        ac = self.alphas_cumprod[ts]
        sig = np.sqrt(1 - ac) / np.sqrt(ac)
        # v0.27 UniPC ends at sigma(alpha_bar_0) — NOT zero like DPMSolver's
        # final_sigmas_type="zero" (scheduling_unipc_multistep.py:273-274)
        sigma_last = np.sqrt((1 - self.alphas_cumprod[0]) / self.alphas_cumprod[0])
        self.sigmas = np.concatenate([sig, [sigma_last]])
        full = self.sigmas
        self._alpha_hat = 1.0 / np.sqrt(full**2 + 1)
        self._sigma_hat = full * self._alpha_hat
        self._build_step_tables()
        return self

    # ------------------------------------------------------------- tables
    def _build_step_tables(self):
        """Per-step coefficients for

          corrector (at step i, over the i-1 -> i interval):
            x_corr = cc_x[i]·x_last + cc0[i]·m_{i-1}
                     + cc1[i]·(m_{i-2} − m_{i-1}) + cc2[i]·(x0_i − m_{i-1})
          predictor (at step i, to step i+1):
            x_next = cp_x[i]·x_corr + cp0[i]·x0_i + cp1[i]·(m_{i-1} − x0_i)

        bh2 / predict_x0: B(h) = h·φ₁(h) = e^h − 1 in the hh = −h domain.
        Order warm-up and lower_order_final are folded into zeroed c1 rows.
        """
        n = self.num_inference_steps
        sig, ah, sh = self.sigmas, self._alpha_hat, self._sigma_hat

        def lam(j):
            return np.log(ah[j]) - np.log(sh[j]) if sig[j] > 0 else np.inf

        cp_x = np.zeros((n,)); cp0 = np.zeros((n,)); cp1 = np.zeros((n,))
        cc_x = np.zeros((n,)); cc0 = np.zeros((n,)); cc1 = np.zeros((n,))
        cc2 = np.zeros((n,))

        def bh2_coeffs(hh):
            """(h_phi_1, B_h, b1, b2) — scheduling_unipc_multistep.py:573-599."""
            h_phi_1 = np.expm1(hh)
            B_h = h_phi_1  # bh2
            h_phi_k = h_phi_1 / hh - 1.0
            b1 = h_phi_k * 1.0 / B_h
            h_phi_k = h_phi_k / hh - 1.0 / 2.0
            b2 = h_phi_k * 2.0 / B_h
            return h_phi_1, B_h, b1, b2

        # predictor order per step (reference step():782-787): warm-up from 1,
        # clamp to remaining steps when lower_order_final
        orders = []
        lower_order_nums = 0
        for i in range(n):
            o = min(2, n - i) if self.lower_order_final else 2
            o = min(o, lower_order_nums + 1)
            orders.append(o)
            lower_order_nums = min(lower_order_nums + 1, 2)

        for i in range(n):
            s, t = i, i + 1
            if sig[t] == 0:
                cp_x[i], cp0[i], cp1[i] = 0.0, 1.0, 0.0
            else:
                h = lam(t) - lam(s)
                hh = -h
                h_phi_1, B_h, _, _ = bh2_coeffs(hh)
                cp_x[i] = sh[t] / sh[s]
                cp0[i] = -ah[t] * h_phi_1
                if orders[i] == 2:
                    r0 = (lam(i - 1) - lam(s)) / h
                    # rhos_p = [0.5] (order-2 simplification, :602-603)
                    cp1[i] = -ah[t] * B_h * 0.5 / r0
            # (keeps the σ==0 branch for a future final_sigmas_type="zero")

            if i > 0:
                # corrector over i-1 -> i with the PREVIOUS step's order
                hc = lam(i) - lam(i - 1)
                hhc = -hc
                h_phi_1c, B_hc, b1, b2 = bh2_coeffs(hhc)
                cc_x[i] = sh[i] / sh[i - 1]
                cc0[i] = -ah[i] * h_phi_1c
                if orders[i - 1] >= 2 and i >= 2:
                    r0c = (lam(i - 2) - lam(i - 1)) / hc
                    # rhos_c = solve([[1,1],[r0,1]], [b1,b2])
                    A = np.array([[1.0, 1.0], [r0c, 1.0]])
                    rhos = np.linalg.solve(A, np.array([b1, b2]))
                    cc1[i] = -ah[i] * B_hc * rhos[0] / r0c
                    cc2[i] = -ah[i] * B_hc * rhos[1]
                else:
                    # order-1 corrector: rhos_c = [0.5] (:680-681)
                    cc2[i] = -ah[i] * B_hc * 0.5

        self._cp = (cp_x, cp0, cp1)
        self._cc = (cc_x, cc0, cc1, cc2)

    # ------------------------------------------------------------- state API
    def init_state(self, shape, dtype=jnp.float32) -> UniPCState:
        z = jnp.zeros(shape, dtype)
        return UniPCState(m_prev=z, m_prev2=z, last_sample=z)

    def tables(self):
        cp_x, cp0, cp1 = self._cp
        cc_x, cc0, cc1, cc2 = self._cc
        return dict(
            timesteps=jnp.asarray(self.timesteps, jnp.float32),
            alpha_hat=jnp.asarray(self._alpha_hat[:-1], jnp.float32),
            sigma_hat=jnp.asarray(self._sigma_hat[:-1], jnp.float32),
            cp_x=jnp.asarray(cp_x, jnp.float32),
            cp0=jnp.asarray(cp0, jnp.float32),
            cp1=jnp.asarray(cp1, jnp.float32),
            cc_x=jnp.asarray(cc_x, jnp.float32),
            cc0=jnp.asarray(cc0, jnp.float32),
            cc1=jnp.asarray(cc1, jnp.float32),
            cc2=jnp.asarray(cc2, jnp.float32),
        )

    def step(self, state: UniPCState, model_output, step_index, sample):
        return self.step_from_tables(self.tables(), state, model_output,
                                     step_index, sample,
                                     prediction_type=self.prediction_type)

    @staticmethod
    def step_from_tables(tables, state: UniPCState, model_output, step_index,
                         sample, prediction_type: str = "epsilon"):
        """One UniPC step: correct the previous interval with the fresh
        model output, then predict the next sample.  ``step_index`` may be
        static or traced."""
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

        # corrector (no-op at i==0: all cc tables are 0 there and we keep x)
        x_corr = (
            tables["cc_x"][i] * state.last_sample.astype(jnp.float32)
            + tables["cc0"][i] * state.m_prev
            + tables["cc1"][i] * (state.m_prev2 - state.m_prev)
            + tables["cc2"][i] * (x0 - state.m_prev)
        )
        first = jnp.asarray(i, jnp.int32) == 0
        x_corr = jnp.where(first, x, x_corr)

        # predictor
        x_next = (
            tables["cp_x"][i] * x_corr
            + tables["cp0"][i] * x0
            + tables["cp1"][i] * (state.m_prev - x0)
        )
        new_state = UniPCState(m_prev=x0, m_prev2=state.m_prev,
                               last_sample=x_corr)
        return x_next.astype(sample.dtype), new_state
