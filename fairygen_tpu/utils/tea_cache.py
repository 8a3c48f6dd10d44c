"""TeaCache — skip DiT block stacks when the modulation signal drifts little.

Functional port of the reference TeaCache (``wan_video.py:1016-1065``):
keyed on the rescaled L1 drift of ``t_mod`` with per-model-id polynomial
coefficients; stores/applies a hidden-state residual.  State is an explicit
pytree so the whole denoise loop stays inside one jit (the skip decision
becomes a ``lax.cond``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

TEACACHE_COEFFICIENTS = {
    "Wan2.1-T2V-1.3B": [-5.21862437e04, 9.23041404e03, -5.28275948e02, 1.36987616e01, -4.99875664e-02],
    "Wan2.1-T2V-14B": [-3.03318725e05, 4.90537029e04, -2.65530556e03, 5.87365115e01, -3.15583525e-01],
    "Wan2.1-I2V-14B-480P": [2.57151496e05, -3.54229917e04, 1.40286849e03, -1.35890334e01, 1.32517977e-01],
    "Wan2.1-I2V-14B-720P": [8.10705460e03, 2.13393892e03, -3.72934672e02, 1.66203073e01, -4.17769401e-02],
    # FLUX gate (reference flux_image.py:925) — drift signal is block 0's
    # norm1_a-modulated hidden states, not t_mod
    "FLUX.1": [4.98651651e02, -2.83781631e02, 5.58554382e01, -3.82021401e00, 2.64230861e-01],
}


@dataclasses.dataclass
class TeaCacheState:
    step: jnp.ndarray  # () int32
    accumulated: jnp.ndarray  # () float32
    prev_modulated: jnp.ndarray  # t_mod shape
    prev_residual: jnp.ndarray  # hidden-state shape
    prev_hidden: jnp.ndarray  # hidden-state shape


jax.tree_util.register_dataclass(
    TeaCacheState,
    data_fields=["step", "accumulated", "prev_modulated", "prev_residual", "prev_hidden"],
    meta_fields=[],
)


def init_tea_cache_state(t_mod_shape, hidden_shape, dtype=jnp.float32) -> TeaCacheState:
    return TeaCacheState(
        step=jnp.zeros((), jnp.int32),
        accumulated=jnp.zeros((), jnp.float32),
        prev_modulated=jnp.zeros(t_mod_shape, dtype),
        prev_residual=jnp.zeros(hidden_shape, dtype),
        prev_hidden=jnp.zeros(hidden_shape, dtype),
    )


def tea_cache_blocks(
    state: TeaCacheState,
    x,
    t_mod,
    blocks_fn,
    *,
    model_id: Optional[str] = None,
    rel_l1_thresh: float = 0.0,
    num_inference_steps: int = 50,
    forced_calc_mask=None,
):
    """Run ``blocks_fn(x)`` or reuse the cached residual, per the reference
    decision rule (wan_video.py:1037-1065). Returns (x_out, new_state).

    ``forced_calc_mask``: optional (num_inference_steps,) bool array that
    REPLACES the drift-accumulator rule — step i calculates iff
    mask[i].  This is the mechanical-replay mode: the calibrate->gate
    flow (training/tea_cache_experiment.py) selects an operating
    schedule offline (its replayed accumulator rule matches the runtime
    gate to <=1 f32 boundary flip), and the bench replays that schedule
    on the flagship program to measure wall-clock at the operating point
    independent of the weights loaded (zero-init bench weights would
    otherwise drive the drift gate to max-skip)."""
    if forced_calc_mask is not None:
        accumulated = state.accumulated
        should_calc = jnp.asarray(forced_calc_mask)[state.step]
    else:
        if model_id not in TEACACHE_COEFFICIENTS:
            raise KeyError(
                f"unknown TeaCache model_id {model_id!r}; known ids: "
                f"{sorted(TEACACHE_COEFFICIENTS)}"
            )
        coeffs = jnp.asarray(TEACACHE_COEFFICIENTS[model_id], jnp.float32)

        drift = jnp.abs(t_mod.astype(jnp.float32) - state.prev_modulated.astype(jnp.float32)).mean()
        denom = jnp.abs(state.prev_modulated.astype(jnp.float32)).mean()
        rel = drift / jnp.maximum(denom, 1e-12)
        rescaled = jnp.polyval(coeffs, rel)
        accumulated = state.accumulated + rescaled

        is_edge = (state.step == 0) | (state.step == num_inference_steps - 1)
        should_calc = is_edge | (accumulated >= rel_l1_thresh)
        accumulated = jnp.where(is_edge | (accumulated >= rel_l1_thresh), 0.0, accumulated)

    def calc(_):
        y = blocks_fn(x)
        return y, (y - x)

    def skip(_):
        return x + state.prev_residual.astype(x.dtype), state.prev_residual

    y, residual = jax.lax.cond(should_calc, calc, skip, None)

    step = state.step + 1
    step = jnp.where(step == num_inference_steps, 0, step)
    new_state = TeaCacheState(
        step=step,
        accumulated=accumulated,
        prev_modulated=t_mod.astype(state.prev_modulated.dtype),
        prev_residual=residual.astype(state.prev_residual.dtype),
        prev_hidden=state.prev_hidden,
    )
    return y, new_state
