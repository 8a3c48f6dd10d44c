"""TeaCache calibrate → gate demonstration at trained-tiny scale.

VERDICT round-3 item 7: the calibration tooling
(``utils/tea_cache_calibration.py``, ``tools/calibrate_tea_cache.py``)
existed but the full flow — *fit coefficients on a trained model, pick an
operating threshold, run the gated rollout, measure the quality cost* —
had only "needs real weights" standing.  This module demonstrates it
end-to-end on the same in-suite trained tiny Wan DiT the int8 experiment
uses (``quant_experiment.train_tiny_wan_dit``):

  1. train to convergence (fixed-draw eval-loss collapse);
  2. calibrate: dense rollouts over fresh noise draws → per-step
     (t_mod drift, output drift) pairs → degree-4 polynomial fit
     (the recipe behind the reference's shipped tables,
     ``wan_video.py:1026-1035``, which have no TI2V-5B entry);
  3. pick the threshold from the calibration trace itself: replay the
     runtime accumulator rule (``utils/tea_cache.tea_cache_blocks``) over
     the captured drifts and binary-search the threshold that hits a
     target compute fraction — ``t_mod`` depends only on the timestep, so
     the replay predicts the gated run's skip schedule step-for-step (up
     to f32 rounding at accumulator-threshold crossings; see
     ``simulate_calc_schedule``);
  4. gate: run the TeaCache rollout at that threshold on a held-out draw
     and measure PSNR vs the dense rollout + the realized skip count.

At full scale the identical flow runs from checkpoint files via
``tools/calibrate_tea_cache.py`` the day real weights mount.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.flow_match import FlowMatchScheduler
from ..models.wan.dit import WanDiTConfig, time_embedding, wan_dit_forward
from .distill import rollout_psnr
from .quant_experiment import (
    _CTX_LEN,
    _LAT_SHAPE,
    train_tiny_wan_dit_cached,
    wan_rollout,
)

__all__ = [
    "simulate_calc_schedule",
    "pick_threshold",
    "tea_cache_rollout",
    "run_tea_cache_experiment",
]


def simulate_calc_schedule(coeffs, xs, thresh: float,
                           num_steps: int) -> np.ndarray:
    """Replay the runtime gate's accumulator rule over a captured t_mod
    drift trace ``xs`` (``num_steps - 1`` transitions).  Returns the
    boolean calc mask (True = full block compute) — same semantics as
    ``tea_cache_blocks``: first/last step always calc; otherwise calc when
    the accumulated polynomial-predicted output drift crosses ``thresh``,
    resetting the accumulator on every calc.

    The replay runs in f32 like the runtime, but the runtime recomputes
    the t_mod drift inside XLA with its own reduction order, so an
    accumulator value landing within an ulp of the threshold can flip one
    step — prediction is exact up to such boundary crossings (observed:
    ≤1 step in 50)."""
    xs = np.asarray(xs, np.float32)
    c32 = np.asarray(coeffs, np.float32)
    assert len(xs) == num_steps - 1, (len(xs), num_steps)
    acc = np.float32(0.0)
    mask = [True]  # step 0: prev_modulated is zeros -> edge calc
    for i in range(1, num_steps):
        acc = np.float32(acc + np.polyval(c32, xs[i - 1]))
        edge = i == num_steps - 1
        calc = edge or acc >= np.float32(thresh)
        if calc:
            acc = np.float32(0.0)
        mask.append(bool(calc))
    return np.asarray(mask)


def pick_threshold(coeffs, xs, num_steps: int, target_calc_frac: float,
                   iters: int = 40) -> float:
    """Binary-search the threshold whose replayed schedule computes
    closest to ``target_calc_frac`` of the steps (from above — quality
    beats speed on ties)."""
    lo, hi = 0.0, 1e3
    target = target_calc_frac * num_steps
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        n = int(simulate_calc_schedule(coeffs, xs, mid, num_steps).sum())
        if n > target:
            lo = mid  # too many calcs -> raise threshold
        else:
            hi = mid
    return hi  # the conservative side: >= target calc count


def tea_cache_rollout(params, cfg: WanDiTConfig, noise, ctx,
                      num_steps: int, *, model_id: str, thresh: float,
                      sigma_shift: float = 5.0):
    """Flow-match Euler rollout with the TeaCache gate threaded through
    (same integration as ``wan_rollout``).  Returns (final_latents,
    calc_mask) — the realized per-step compute decisions, detected from
    the state's residual slot (a skip step reuses it bit-for-bit)."""
    from ..utils.tea_cache import init_tea_cache_state

    sched = FlowMatchScheduler("Wan").set_timesteps(num_steps,
                                                    shift=sigma_shift)
    sigmas = np.append(np.asarray(sched.sigmas, np.float32), 0.0)
    timesteps = np.asarray(sched.timesteps, np.float32)

    t0 = jnp.broadcast_to(jnp.asarray(timesteps[0]), (noise.shape[0],))
    _, t_mod0 = time_embedding(params, cfg, t0)
    b, c, f, h, w = noise.shape
    pt, ph, pw = cfg.patch_size
    hidden_shape = (b, (f // pt) * (h // ph) * (w // pw), cfg.dim)
    state = init_tea_cache_state(t_mod0[:, None].shape, hidden_shape)

    opts = dict(model_id=model_id, rel_l1_thresh=float(thresh),
                num_inference_steps=num_steps)

    @jax.jit
    def step(params, x, t, dsig, state):
        v, new_state = wan_dit_forward(
            params, cfg, x, t, ctx, tea_cache_state=state,
            tea_cache_opts=opts)
        return x + v.astype(x.dtype) * dsig, new_state

    lat = noise
    calc_mask = []
    for i in range(num_steps):
        t = jnp.broadcast_to(jnp.asarray(timesteps[i]), (lat.shape[0],))
        prev_res = np.asarray(state.prev_residual)
        lat, state = step(params, lat, t,
                          jnp.asarray(sigmas[i + 1] - sigmas[i]), state)
        calc_mask.append(
            not np.array_equal(np.asarray(state.prev_residual), prev_res))
    return lat, np.asarray(calc_mask)


def run_tea_cache_experiment(
    *,
    num_train_steps: int = 800,
    rollout_steps: int = 50,
    calib_rollouts: int = 2,
    target_calc_frac: float = 0.7,
    seed: int = 0,
    log_every: int = 0,
) -> Dict[str, object]:
    """Full calibrate→gate flow on a trained tiny DiT; returns fit quality,
    the chosen operating point, predicted-vs-realized skip schedules, and
    the gated rollout's PSNR vs dense."""
    from ..utils.tea_cache_calibration import (
        calibrate_wan_tea_cache,
        register_tea_cache_coefficients,
    )

    trained, cfg, train_info = train_tiny_wan_dit_cached(
        num_train_steps=num_train_steps, seed=seed, log_every=log_every)

    # -- calibrate over fresh trajectories
    kc = jax.random.PRNGKey(seed + 31)
    lats = [jax.random.normal(jax.random.fold_in(kc, 2 * i), _LAT_SHAPE,
                              jnp.float32) for i in range(calib_rollouts)]
    ctxs = [jax.random.normal(jax.random.fold_in(kc, 2 * i + 1),
                              (1, _CTX_LEN, cfg.text_dim), jnp.float32)
            for i in range(calib_rollouts)]
    coeffs, (xs, ys) = calibrate_wan_tea_cache(
        trained, cfg, lats, ctxs, num_inference_steps=rollout_steps)
    pred = np.polyval(np.asarray(coeffs), xs)
    ss_res = float(np.sum((ys - pred) ** 2))
    ss_tot = float(np.sum((ys - ys.mean()) ** 2))
    r2 = 1.0 - ss_res / max(ss_tot, 1e-12)

    model_id = "tiny-trained-calibrated"
    register_tea_cache_coefficients(model_id, coeffs)

    # -- operating point from the calibration trace (one trajectory's xs;
    # t_mod depends only on t, so every rollout shares the same trace)
    xs_one = xs[: rollout_steps - 1]
    thresh = pick_threshold(coeffs, xs_one, rollout_steps, target_calc_frac)
    predicted_mask = simulate_calc_schedule(coeffs, xs_one, thresh,
                                            rollout_steps)

    # -- gate on a held-out draw
    kh = jax.random.PRNGKey(seed + 77)
    noise = jax.random.normal(kh, _LAT_SHAPE, jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(kh, 1),
                            (1, _CTX_LEN, cfg.text_dim), jnp.float32)
    dense = wan_rollout(trained, cfg, noise, ctx, rollout_steps)
    gated, calc_mask = tea_cache_rollout(
        trained, cfg, noise, ctx, rollout_steps, model_id=model_id,
        thresh=thresh)

    return dict(
        eval_before=train_info["eval_before"],
        eval_after=train_info["eval_after"],
        coefficients=[float(c) for c in coeffs],
        fit_r2=r2,
        drift_pairs=(xs, ys),
        threshold=float(thresh),
        predicted_calc_mask=predicted_mask,
        calc_mask=calc_mask,
        n_calc=int(calc_mask.sum()),
        n_skip=int(rollout_steps - calc_mask.sum()),
        psnr_gated=rollout_psnr(np.asarray(gated), np.asarray(dense)),
    )
