"""Quantized matmul path — the TPU equivalent of the reference's FP8 linear.

The reference stores weights in fp8-e4m3 and computes
``torch._scaled_mm`` with dynamic per-row input scaling
(``animation/diffsynth/core/vram/layers.py:321-357``).  On v5e the fast
low-precision unit is INT8 (2× bf16 MXU throughput), so the native port is
W8A8: weights quantized per-OUTPUT-column (symmetric, static), activations
per-row (symmetric, dynamic — same granularity as the reference's
``input_float8`` rows), int32 accumulation, fused rescale.

Usage: ``qp = quantize_dense_params(p)`` then ``quantized_dense(qp, x)``;
``quantize_wan_dit_ffn(params)`` swaps the DiT FFN projections in place
(the FFN is ~55% of DiT FLOPs).
"""
from __future__ import annotations

import contextlib
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp


# ------------------------------------------------------- activation stats
# Per-row symmetric int8 quantization has rms error ≈ step/√12 with
# step = amax/127, so the per-row quantization SNR is
#   SNR = rms / (amax/(127·√12)) = 127·√12 / crest ≈ 440 / crest,
# where crest = amax/rms is the row's crest factor.  Outlier-heavy rows
# (large crest) are exactly where W8A8 loses precision — these taps
# measure that directly on real forwards instead of assuming
# Gaussian-ness (crest ≈ 4–5 for Gaussian rows at dim 3072).
_ACT_TAP: Optional[List] = None
_ACT_TAP_MODE: str = "stats"


@contextlib.contextmanager
def activation_stats_tap(tap: List, mode: str = "stats"):
    """While active, every `_apply_dense`-style call that routes through
    ``record_activation_stats`` appends a (label, stats-dict) entry to
    ``tap``.  Entries are JAX values: captured eagerly they are concrete;
    captured while tracing a function whose body runs entirely inside the
    active context they are tracers the caller can return as outputs
    (do NOT let scan-body tracers escape the scan — instrument a single
    unrolled block instead, see tools/activation_stats.py).

    mode="channel_amax" records the per-INPUT-channel absolute maximum
    (a (K,) array) instead of the scalar crest stats — the calibration
    signal for SmoothQuant-style scale migration (entries arrive in
    call order; callers map them to layers by the block's static dense
    call order, see training/quant_experiment.calibrate_wan_dit_act_amax).
    """
    global _ACT_TAP, _ACT_TAP_MODE
    prev, prev_mode = _ACT_TAP, _ACT_TAP_MODE
    _ACT_TAP = tap
    _ACT_TAP_MODE = mode
    try:
        yield tap
    finally:
        _ACT_TAP = prev
        _ACT_TAP_MODE = prev_mode


def activation_row_stats(x) -> Dict[str, Any]:
    """Crest-factor statistics of the rows that per-row dynamic activation
    scaling would quantize: (N, K) rows over the last axis."""
    xf = jnp.asarray(x, jnp.float32).reshape(-1, x.shape[-1])
    amax = jnp.max(jnp.abs(xf), axis=-1)
    rms = jnp.sqrt(jnp.mean(xf * xf, axis=-1) + 1e-30)
    crest = amax / rms
    return {
        "amax_max": jnp.max(amax),
        "rms_mean": jnp.mean(rms),
        "crest_mean": jnp.mean(crest),
        "crest_p99": jnp.quantile(crest, 0.99),
        "crest_max": jnp.max(crest),
    }


def record_activation_stats(label: str, x) -> None:
    """Hook point for dense helpers (no-op unless a tap is active)."""
    if _ACT_TAP is not None:
        if _ACT_TAP_MODE == "channel_amax":
            xf = jnp.asarray(x, jnp.float32).reshape(-1, x.shape[-1])
            _ACT_TAP.append((label, jnp.max(jnp.abs(xf), axis=0)))
        else:
            _ACT_TAP.append((label, activation_row_stats(x)))


def weight_quant_report(w) -> Dict[str, float]:
    """Per-column int8 weight-quant error for one (in, out) matrix:
    relative rms reconstruction error and column crest factors."""
    q = quantize_weight_int8(w)
    wf = jnp.asarray(w, jnp.float32)
    rec = q["w_int8"].astype(jnp.float32) * q["w_scale"][None, :]
    rel = jnp.sqrt(jnp.sum((rec - wf) ** 2) / jnp.maximum(jnp.sum(wf**2), 1e-30))
    amax = jnp.max(jnp.abs(wf), axis=0)
    rms = jnp.sqrt(jnp.mean(wf * wf, axis=0) + 1e-30)
    crest = amax / rms
    return {"rel_rms_err": float(rel), "crest_mean": float(jnp.mean(crest)),
            "crest_max": float(jnp.max(crest))}


def quantize_weight_int8(w) -> Dict[str, Any]:
    """(in, out) float weight -> int8 + per-column fp32 scales."""
    wf = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0  # (out,)
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_int8": q, "w_scale": scale}


# ------------------------------------------- outlier-robust W8A8 (round 5)
# Per-row dynamic activation scaling keeps the int8 error budget bounded
# ONLY while rows are outlier-free: one channel at A x the typical
# magnitude sets step = A·σ/127, burying every other channel's signal at
# SNR ≈ 440·σ/amax.  Published W8A8 literature (SmoothQuant, LLM.int8())
# shows trained-transformer activation outliers are CHANNEL-structured
# and grow with scale — so the mitigation below is engineered in before
# real Wan-5B weights can break the deployment mode (VERDICT r4 item 1):
#
#  1. scale migration (SmoothQuant): per-input-channel smoothing scales
#     s_j = amax_j^α / wmax_j^(1-α) folded INTO the stored weight
#     (w' = s ⊙ w); runtime pays one fused elementwise multiply
#     x' = x ⊙ (1/s) before quantization.  Works for any dense, no
#     predecessor analysis (the canonical worst case — the GELU-tailed
#     ffn down-proj input — has no linear predecessor to fold into).
#  2. bf16 outlier-channel fallback (LLM.int8()-style): the top-k
#     channels by *smoothed* calibration amax are zeroed out of both the
#     int8 weight and the quantized activation (so they stop inflating
#     row scales) and contribute through an exact thin (k × out) bf16
#     matmul added to the int8 result.
#
# Reference anchor this replaces/beats: the FP8 linear's plain dynamic
# per-row scaling, animation/diffsynth/core/vram/layers.py:321-357,
# which has no outlier story at all.


def smooth_scales(act_amax, w, alpha: float = 0.5):
    """SmoothQuant migration scales s (K,): divide the activation by s,
    multiply the weight rows by s.  s_j = amax_j^α / wmax_j^(1-α) with
    wmax_j = max_out |w[j, :]|; channels with degenerate stats keep s=1.
    """
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.asarray(act_amax, jnp.float32)
    wmax = jnp.max(jnp.abs(wf), axis=-1)  # (K,)
    ok = (amax > 1e-12) & (wmax > 1e-12)
    s = jnp.power(jnp.maximum(amax, 1e-12), alpha) / \
        jnp.power(jnp.maximum(wmax, 1e-12), 1.0 - alpha)
    # normalize the geometric mean (over live channels) to 1 so the
    # smoothing is a pure redistribution (keeps weight magnitudes in a
    # sane float range)
    log_s = jnp.where(ok, jnp.log(s), 0.0)
    denom = jnp.maximum(jnp.sum(ok), 1)
    s = jnp.exp(log_s - jnp.sum(log_s) / denom)
    return jnp.where(ok, s, 1.0)


def quantize_weight_int8_robust(w, act_amax, alpha: float = 0.5,
                                outlier_k: int = 0,
                                out_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """(in, out) weight + calibration per-channel activation amax (K,)
    -> outlier-robust W8A8 params: {"w_int8", "w_scale", "act_smooth"
    [, "outlier_idx", "outlier_mask", "w_outlier"]}.

    ``quantized_dense`` consumes every key; layers quantized this way
    remain drop-in for the scan-stacked layouts (all aux arrays stack on
    a leading L axis and slice per scan step)."""
    wf = jnp.asarray(w, jnp.float32)
    s = smooth_scales(act_amax, wf, alpha) if alpha is not None \
        else jnp.ones((wf.shape[0],), jnp.float32)
    inv_s = 1.0 / s
    w2 = wf * s[:, None]
    out: Dict[str, Any] = {"act_smooth": inv_s}
    if outlier_k:
        smoothed_amax = jnp.asarray(act_amax, jnp.float32) / s
        _, idx = jax.lax.top_k(smoothed_amax, outlier_k)
        mask = jnp.ones((wf.shape[0],), jnp.float32).at[idx].set(0.0)
        # the runtime multiplies ONE premul vector (smooth + outlier
        # zeroing fused) and routes the outlier channels through two
        # thin MXU matmuls via a one-hot selection matrix with the
        # smoothing folded in — a per-row gather here measured +27%
        # on-chip (TPU lane gathers), the matmul form ~free
        out["act_smooth"] = inv_s * mask
        sel = jnp.zeros((wf.shape[0], outlier_k), jnp.float32)
        sel = sel.at[idx, jnp.arange(outlier_k)].set(inv_s[idx])
        out["outlier_sel"] = sel.astype(out_dtype)
        out["w_outlier"] = w2[idx, :].astype(out_dtype)
        w2 = w2 * mask[:, None]
    out.update(quantize_weight_int8(w2))
    return out


def quantize_dense_params(p: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(quantize_weight_int8(p["w"]))
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantized_dense(p: Dict[str, Any], x):
    """y = (x_q @ w_q) · (row_scale ⊗ col_scale) + b, int32 accumulation.

    Dynamic symmetric per-row activation scaling (reference layers.py:342:
    per-row amax -> fp8; here -> int8).  Optional outlier-robust keys
    (quantize_weight_int8_robust): "act_smooth" applies the SmoothQuant
    migration + outlier zeroing in ONE fused multiply;
    "outlier_sel"/"w_outlier" route the top-k outlier channels through
    two thin MXU matmuls (x @ sel @ w_outlier — the smoothing is folded
    into sel; no gather, which measured +27% on-chip)."""
    orig_shape = x.shape
    x2d = x.reshape(-1, orig_shape[-1])
    xf = x2d.astype(jnp.float32)
    if "act_smooth" in p:
        # fused form: the smoothing multiply is inlined into BOTH
        # consumers (the amax reduction and the quantize elementwise)
        # instead of materializing a smoothed f32 copy — measured
        # +3.6% -> ~free at flagship scale (x is read twice either way;
        # the recomputed multiply is ALU-cheap)
        sm = p["act_smooth"][None, :]
        row_scale = jnp.max(jnp.abs(xf) * sm, axis=-1,
                            keepdims=True) / 127.0  # (N, 1)
        row_scale = jnp.maximum(row_scale, 1e-12)
        xq = jnp.clip(jnp.round(xf * (sm / row_scale)), -127, 127
                      ).astype(jnp.int8)
    else:
        row_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        row_scale = jnp.maximum(row_scale, 1e-12)
        xq = jnp.clip(jnp.round(xf / row_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, p["w_int8"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * row_scale * p["w_scale"][None, :]
    if "outlier_sel" in p:
        x_out = jnp.dot(x2d.astype(p["outlier_sel"].dtype),
                        p["outlier_sel"],
                        preferred_element_type=jnp.float32)  # (N, k)
        y = y + jnp.dot(x_out.astype(p["w_outlier"].dtype), p["w_outlier"],
                        preferred_element_type=jnp.float32)
    y = y.astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y.reshape(orig_shape[:-1] + (p["w_int8"].shape[1],))


def _check_int8_backend():
    """Refuse int8 where it is known to hang the compiler.

    History: the int8 ``dot_general`` hung the tunneled 'axon' remote
    compiler in rounds 1-2 (docs/NOTES.md); re-probed 2026-08-18 it
    compiles in <1 s and the W8A8 FFN probe runs at 203 TF/s
    (tools/bench_int8.py), so the gate is now open everywhere.  Set
    FAIRYGEN_DISABLE_INT8=1 to refuse again if a backend regresses.
    """
    import os

    if os.environ.get("FAIRYGEN_DISABLE_INT8") == "1":
        raise RuntimeError(
            "int8 W8A8 disabled by FAIRYGEN_DISABLE_INT8=1")


def _quantizers(consume: bool):
    """(stacked-3D, single-2D) jitted quantizers.  consume=True donates
    the input buffer so the bf16 original frees as soon as its int8
    replacement exists — required to quantize models whose bf16+int8
    copies don't fit HBM together (Z-Image 12.2+6.1 GiB on a 16 GiB v5e).
    The caller must own the only reference (pop it from the tree first).
    """
    # per-layer stacked (L, in, out): lax.map runs the quantizer one
    # layer at a time (a vmap materializes the whole stack in fp32 —
    # 5.3 GB for the 30-layer fc1 — and OOMs a 16 GB chip alongside
    # the bf16 originals)
    donate = (0,) if consume else ()
    qmap = jax.jit(lambda ws: jax.lax.map(quantize_weight_int8, ws),
                   donate_argnums=donate)
    qone = jax.jit(quantize_weight_int8, donate_argnums=donate)
    return qmap, qone


def quantize_wan_dit_linears(params, groups=("ffn",),
                             consume: bool = False,
                             act_amax: Optional[Dict[str, Any]] = None,
                             alpha: float = 0.5,
                             outlier_k: int = 0) -> Any:
    """Swap the (stacked) DiT block projections in ``groups`` to W8A8.

    groups ⊆ {"ffn", "self_attn", "cross_attn"} — every dense layer
    ({"w": ...}) found directly under those block sub-trees is replaced
    by {"w_int8", "w_scale"}; ``_apply_dense`` dispatches on the key.
    consume=True DESTROYS the input tree's quantized weights (donated
    buffers) — use when the caller replaces its params with the result.

    act_amax: optional calibration stats {group: {name: (L, K) amax}}
    (training/quant_experiment.calibrate_wan_dit_act_amax) — layers with
    stats get the outlier-robust path (SmoothQuant migration at the given
    ``alpha`` + bf16 fallback for the ``outlier_k`` worst channels);
    layers without stay plain W8A8.

    ``outlier_k``: int (every calibrated layer), or a dict selecting
    WHERE the fallback pays its rank-k matmul pair — {"ffn": 8} or
    {"ffn": {"fc2": 8}}.  The fallback on every dense measured +14% at
    flagship scale (the rank-8 contraction pads to MXU tiles); the
    ffn-down-proj-only form — the measured worst outlier site — is the
    deployment recommendation (smoothing itself is ~free everywhere).
    """
    _check_int8_backend()
    qmap, qone = _quantizers(consume)

    def _k_for(g, name):
        if isinstance(outlier_k, dict):
            gk = outlier_k.get(g, 0)
            return gk.get(name, 0) if isinstance(gk, dict) else gk
        return outlier_k

    def _robust_fns(k):
        def _robust(args):
            w, amax = args
            return quantize_weight_int8_robust(w, amax, alpha=alpha,
                                               outlier_k=k)

        rmap = jax.jit(lambda ws, am: jax.lax.map(_robust, (ws, am)))
        rone = jax.jit(lambda w, am: quantize_weight_int8_robust(
            w, am, alpha=alpha, outlier_k=k))
        return rmap, rone
    params = dict(params)
    blocks = dict(params["blocks"])
    for g in groups:
        grp = dict(blocks[g])
        for name, layer in list(grp.items()):
            if not (isinstance(layer, dict) and "w" in layer):
                continue
            orig = layer
            layer = dict(layer)
            w = layer.pop("w")
            if consume:
                orig.pop("w")  # drop the tree's reference for donation
            amax = None if act_amax is None else \
                act_amax.get(g, {}).get(name)
            if amax is not None:
                rmap, rone = _robust_fns(_k_for(g, name))
                qw = rmap(w, jnp.asarray(amax)) if w.ndim == 3 \
                    else rone(w, jnp.asarray(amax))
            else:
                qw = qmap(w) if w.ndim == 3 else qone(w)
            del w
            layer.update(qw)
            grp[name] = layer
        blocks[g] = grp
    params["blocks"] = blocks
    return params


def quantize_wan_dit_ffn(params) -> Any:
    """Swap the (stacked) DiT FFN projections to W8A8 (~55% of DiT FLOPs)."""
    return quantize_wan_dit_linears(params, groups=("ffn",))


_SKIP_SUBSTRINGS = ("mod", "norm", "adaln", "emb")


def quantize_blocks_tree(tree, skip_substrings=_SKIP_SUBSTRINGS,
                         min_dim: int = 512, consume: bool = False,
                         act_amax: Any = None, alpha: float = 0.5,
                         outlier_k: int = 0) -> Any:
    """Recursively swap every dense ({"w": 2-D/3-D}) in a block pytree to
    W8A8, skipping keys that contain any of ``skip_substrings``
    (modulation/AdaLN/embedding linears: FLOP-light, error-sensitive) and
    layers smaller than ``min_dim`` on either matmul axis.  Works on the
    stacked (L, in, out) scan layouts — the quantizer streams per layer.
    consume=True donates the bf16 weights (frees them as it goes; the
    input tree is destroyed — see _quantizers).

    This is the generic entry for the image DiTs (FLUX.1/FLUX.2, Qwen,
    Z-Image) whose `_dense` helpers dispatch on "w_int8".

    ``act_amax``: optional calibration pytree MIRRORING ``tree`` — at any
    dense node, a {"amax": (L, K)/(K,) [, "outlier_k": int]} dict (extra
    nodes are ignored; dense nodes without one stay plain W8A8).  Layers
    with stats get the outlier-robust path (SmoothQuant migration at
    ``alpha`` + bf16 fallback for the per-node or default ``outlier_k``
    channels — see quantize_weight_int8_robust).  The Wan stack's
    calibrate_wan_dit_act_amax is the reference calibration
    implementation; any per-family collector that records per-channel
    amax at dense inputs can feed this."""
    _check_int8_backend()
    qmap, qone = _quantizers(consume)

    def robust(w, amax, k):
        def one(args):
            return quantize_weight_int8_robust(args[0], args[1],
                                               alpha=alpha, outlier_k=k)

        if w.ndim == 3:
            return jax.jit(lambda ws, am: jax.lax.map(one, (ws, am)))(
                w, jnp.asarray(amax))
        return jax.jit(lambda wv, am: one((wv, am)))(w, jnp.asarray(amax))

    def rec(node, name="", cal=None):
        if isinstance(node, (list, tuple)):  # per-layer lists (refiners)
            cals = cal if isinstance(cal, (list, tuple)) \
                else [None] * len(node)
            out = [rec(v, name, c) for v, c in zip(node, cals)]
            return type(node)(out) if isinstance(node, tuple) else out
        if not isinstance(node, dict):
            return node
        if "w" in node and hasattr(node["w"], "ndim") \
                and node["w"].ndim in (2, 3) \
                and min(node["w"].shape[-2:]) >= min_dim:
            out = dict(node)
            w = out.pop("w")
            if consume:
                node.pop("w")  # drop the tree's reference for donation
            amax = cal.get("amax") if isinstance(cal, dict) else None
            if amax is not None:
                k = cal.get("outlier_k", outlier_k)
                qw = robust(w, amax, k)
                out.update(qw)
            else:
                qw = qmap(w) if w.ndim == 3 else qone(w)
                out["w_int8"] = qw["w_int8"]
                out["w_scale"] = qw["w_scale"]
            del w
            return out
        return {k: (v if any(s in k for s in skip_substrings)
                    else rec(v, k, cal.get(k) if isinstance(cal, dict)
                             else None))
                for k, v in node.items()}

    return rec(tree, cal=act_amax)


# image-DiT block sub-trees eligible for W8A8 (embedders/heads stay bf16)
_IMAGE_DIT_BLOCK_KEYS = ("double_blocks", "single_blocks", "blocks",
                         "layers", "noise_refiner", "context_refiner")


# fit-driven skip list: quantize the modulation linears too (they are
# 33% of Qwen-Image's 20B params — the difference between fitting one
# v5e chip and needing four).  The reference's FP8 wrap also covers every
# nn.Linear incl. modulation (configs/vram_management_module_maps.py).
_FIT_SKIP = ("norm", "emb")


def quantize_image_dit_params(params, block_keys=_IMAGE_DIT_BLOCK_KEYS,
                              min_dim: int = 512,
                              consume: bool = False,
                              skip_substrings=_SKIP_SUBSTRINGS,
                              act_amax: Any = None, alpha: float = 0.5,
                              outlier_k: int = 0) -> Any:
    """Swap the transformer-block projections of an image DiT
    (FLUX.1/FLUX.2/Qwen-Image/Z-Image) to W8A8, leaving the patch/text
    embedders, modulation linears, and the output head in bf16.  The
    models' ``_dense`` helpers dispatch on the "w_int8" key.
    consume=True frees each bf16 weight as it is quantized (destroys the
    input tree) — required where bf16+int8 don't fit HBM together.
    skip_substrings=_FIT_SKIP additionally quantizes the modulation
    linears (max memory reduction — Qwen-Image's ~19.2B-param DiT drops
    to ~19 GiB: halved for TP over >=2 v5e chips, or one >=24 GB chip;
    FLUX.1 12B -> ~12 GiB, ONE v5e, but note FLUX names its modulation
    linears norm1_a/norm1_b/norm, so pass skip_substrings=("emb",) there
    — real norm gammas are 1-D and excluded by the ndim/min_dim guards
    anyway)."""
    params = dict(params)
    for k in block_keys:
        if k in params:
            params[k] = quantize_blocks_tree(
                params[k], min_dim=min_dim, consume=consume,
                skip_substrings=skip_substrings,
                act_amax=None if act_amax is None else act_amax.get(k),
                alpha=alpha, outlier_k=outlier_k)
    return params
