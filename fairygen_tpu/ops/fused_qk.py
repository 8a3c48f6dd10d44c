"""Fused rms-norm -> RoPE -> head-major relayout for the Wan DiT attention.

The legacy q/k preparation chain (``ops/norms.rms_norm`` ->
``ops/rope.rope_apply`` -> the head-major transpose + pad inside
``ops/flash_attention``) costs ~3 extra HBM round trips over the 50 MB
q and k activations per block at flagship shapes (S=8190, D=3072): XLA
cannot fuse across the rms reduction, the RoPE pair shuffle, and the
layout change.  This kernel does norm-apply + rotate + relayout in ONE
HBM pass per tensor; only a cheap stat pass (read-only rsqrt(mean(x^2)))
stays in XLA.

The RoPE pair rotation (reference ``wan_video_dit.py:91-96``: adjacent
(2i, 2i+1) complex pairs along the head dim) is expressed without any
gather/interleave: with full-width tables

  cos_full[s, j]  =  cos[s, j // 2]
  sin_sign[s, j]  = -sin[s, j // 2]  if j even else  +sin[s, j // 2]

the rotation is ``y * cos_full + swap_adjacent(y) * sin_sign`` where
``swap_adjacent`` (x[2i] <-> x[2i+1]) is two lane rolls and a select --
cheap VPU ops on the (8, 128) vreg layout, unlike the strided pair
access which forces a relayout.  The rotation computes the same two
products and one add as the reference formula; the norm part is
bit-identical to rms_norm, the rotation agrees to 1 bf16 ulp (the two
graphs make different FMA-contraction choices, both valid roundings of
the same fp32 expression — verified elementwise in tests/test_fused_qk).

Differentiable via custom_vjp: the backward recomputes through the
reference XLA chain (rms_norm -> rope_apply -> flash_attention's vjp),
so training/remat paths are numerically unchanged.

Consumers: the Wan DiT (full-row rms + 3D rope; XLA stat pass feeds the
kernel a rowscale) and Z-Image (per-head rms + interleaved rope; fully
self-contained kernel).  Qwen-Image / FLUX have the same per-head shape
but run JOINT txt+img attention with per-stream projections — fusing
them would require mid-sequence gap masking in the head-major layout
(the txt segment is shorter than a prep tile), judged not worth the
~2-3% for their block shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _on_tpu
from .norms import rms_norm
from .rope import apply_interleaved_rope, rope_apply

import os

# A/B switch: write attention outputs straight into the natural
# (B, S, N, d) layout from the kernel (strided stores) instead of the XLA
# transpose-back pass.  Default from hardware measurement (docs/NOTES.md).
_NATURAL_OUT = os.environ.get("FAIRYGEN_FLASH_NATURAL_OUT", "1") == "1"

# Single source of truth for the fused-prep gate: every consumer (Wan DiT,
# Z-Image, FLUX.1/FLUX.2 single blocks, S2V) calls this, so flipping the
# hardware-validated default is a one-line change HERE.
# Hardware-validated 2026-08-18 (tools/bench_fused_qk.py on v5e):
# Wan 30-block 21.12 -> 19.80 ms/block (fused+natural_out), Z-Image block
# 18.34 -> 16.29 ms, FLUX single block 13.83 -> 11.94 ms; numerics agree
# to 1 bf16 ulp per block (docs/NOTES.md).
_DEFAULT_ENABLED = "1"


def fused_qk_enabled() -> bool:
    return os.environ.get("FAIRYGEN_FUSED_QK", _DEFAULT_ENABLED) == "1"


def build_freqs_full_pairs(cos, sin) -> jnp.ndarray:
    """(L, hd/2) interleaved-pair tables -> (2, L, hd) full-width
    (cos_full, sin_sign) tables for the fused kernel."""
    cos_full = jnp.repeat(cos, 2, axis=-1)
    sin_full = jnp.repeat(sin, 2, axis=-1)
    sign = jnp.tile(jnp.asarray([-1.0, 1.0], jnp.float32), cos.shape[-1])
    return jnp.stack([cos_full, sin_full * sign])


def build_freqs_full(freqs: jnp.ndarray) -> jnp.ndarray:
    """(2, S, hd/2) (cos, sin) pair tables -> (2, S, hd) full-width
    (cos_full, sin_sign) tables for the fused kernel.  Computed once per
    forward OUTSIDE the block scan (a few MB, S x hd fp32)."""
    return build_freqs_full_pairs(freqs[0], freqs[1])


def _prep_kernel(x_ref, rs_ref, g_ref, cos_ref, sin_ref, o_ref, *,
                 rope, bq, s_actual):
    """One (head, s-tile) instance: y = rms-apply(x) * gamma, rotate, store.

    x   (1, bq, hd) bf16   natural-layout tile of the projection output
    rs  (1, bq, 128) fp32  rsqrt(mean(x_row^2) + eps), lane-broadcast
    g   (1, hd)            per-head gamma slice (q: pre-scaled by
                           scale*log2e -- the flash prescale fold)
    cos/sin (bq, hd) fp32  full-width rotation tables
    o   (1, bq, hd)        head-major output tile, rows >= s_actual zeroed

    Grid order is (s-tile, head) with the HEAD index innermost: the
    cos/sin/rs block indices are then unchanged across consecutive
    iterations, so Pallas keeps them resident instead of re-streaming
    the fp32 tables once per head (24x the intended table traffic).
    """
    i = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)                      # (bq, hd)
    rs = rs_ref[0][:, : x.shape[-1]]                      # (bq, hd<=128)
    # identical op order to ops/norms.rms_norm: fp32 scale, bf16 cast,
    # bf16 gamma multiply
    y = (x * rs).astype(o_ref.dtype) * g_ref[0, 0][None, :]
    _rotate_mask_store(y, cos_ref, sin_ref, o_ref, rope=rope, bq=bq,
                       s_actual=s_actual, i=i)


def _rotate_mask_store(y, cos_ref, sin_ref, o_ref, *, rope, bq, s_actual, i):
    if rope:
        yf = y.astype(jnp.float32)
        hd = yf.shape[-1]
        nxt = pltpu.roll(yf, hd - 1, 1)                   # lane j -> x[j+1]
        prv = pltpu.roll(yf, 1, 1)                        # lane j -> x[j-1]
        even = (lax.broadcasted_iota(jnp.int32, yf.shape, 1) % 2) == 0
        swp = jnp.where(even, nxt, prv)                   # adjacent-pair swap
        y = (yf * cos_ref[...] + swp * sin_ref[...]).astype(o_ref.dtype)
    # zero the padded tail rows EXACTLY (k-side pad_correct in the bounded
    # flash kernels relies on padded k rows being exact zeros); also kills
    # any garbage read past the input's last (non-tile-aligned) row
    row = lax.broadcasted_iota(jnp.int32, y.shape, 0) + i * bq
    o_ref[0] = jnp.where(row < s_actual, y, jnp.zeros_like(y))


def _prep_kernel_per_head(x_ref, g_ref, cos_ref, sin_ref, o_ref, *,
                          rope, bq, s_actual, eps):
    """Per-head rms variant (FLUX/Qwen/Z-Image qk-norm: weight (hd,)):
    the reduction runs over the head's own 128 lanes, so no XLA stat
    pass is needed at all — the kernel is fully self-contained."""
    i = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)                      # (bq, hd)
    rs = lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    y = (x * rs).astype(o_ref.dtype) * g_ref[0][None, :]
    _rotate_mask_store(y, cos_ref, sin_ref, o_ref, rope=rope, bq=bq,
                       s_actual=s_actual, i=i)


def rms_rope_heads_major(x, gamma, rowscale, freqs_full, n_heads: int,
                         s_pad: int, *, rope: bool = True, bq: int = 512):
    """(B, S, N*hd) bf16 -> (B*N, s_pad, hd) head-major, normalized (+RoPE).

    rowscale: (B, S) fp32 = rsqrt(mean(x^2, -1) + eps) -- the rms stat,
    computed by the caller in XLA (one read-only pass; everything else is
    one read + one write here).
    """
    b, s, d = x.shape
    hd = d // n_heads
    assert hd <= 128 and 128 % hd == 0, hd
    bq = min(bq, s_pad)
    assert s_pad % bq == 0, (s_pad, bq)
    n_tiles = s_pad // bq

    rs_b = jnp.broadcast_to(rowscale[..., None], (b, s, 128))
    # (n, 1, hd) so the per-head block's last two dims (1, hd) EQUAL the
    # array's — Mosaic rejects a (1, hd) block on an (n, hd) array (the
    # sublane dim must be 8-divisible or full).
    gam = gamma.reshape(n_heads, 1, hd)
    if rope:
        ff = freqs_full
    else:
        ff = jnp.zeros((2, s_pad, hd), jnp.float32)
    n = n_heads
    # s_pad may overshoot the input by more than one tile (flash wants
    # round tile counts); a fully-OOB input block is invalid in Mosaic
    # (crashes the device), so clamp the s-block index to the last block
    # holding valid rows — re-read rows are zeroed by the s_actual row
    # mask in the kernel.
    i_last = (s - 1) // bq
    cl = functools.partial(jnp.minimum, i_last)
    return pl.pallas_call(
        functools.partial(_prep_kernel, rope=rope, bq=bq, s_actual=s),
        grid=(n_tiles, b * n),  # head innermost: table blocks stay resident
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, hc: (hc // n, cl(i), hc % n)),
            pl.BlockSpec((1, bq, 128), lambda i, hc: (hc // n, cl(i), 0)),
            pl.BlockSpec((1, 1, hd), lambda i, hc: (hc % n, 0, 0)),
            pl.BlockSpec((bq, hd), lambda i, hc: (cl(i), 0)),
            pl.BlockSpec((bq, hd), lambda i, hc: (cl(i), 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda i, hc: (hc, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, s_pad, hd), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x, rs_b, gam, ff[0], ff[1])


def rms_rope_heads_major_per_head(x, gamma, freqs_full, n_heads: int,
                                  s_pad: int, *, eps: float,
                                  rope: bool = True, bq: int = 512):
    """Per-head-rms variant: x (B, S, N*hd), gamma (hd,) shared across
    heads (the FLUX/Qwen/Z-Image qk-norm shape) -> (B*N, s_pad, hd)."""
    b, s, d = x.shape
    hd = d // n_heads
    assert hd <= 128 and 128 % hd == 0, hd
    bq = min(bq, s_pad)
    assert s_pad % bq == 0, (s_pad, bq)
    gam = gamma.reshape(1, hd)
    if rope:
        ff = freqs_full
    else:
        ff = jnp.zeros((2, s_pad, hd), jnp.float32)
    n = n_heads
    i_last = (s - 1) // bq  # clamp: see rms_rope_heads_major
    cl = functools.partial(jnp.minimum, i_last)
    return pl.pallas_call(
        functools.partial(_prep_kernel_per_head, rope=rope, bq=bq,
                          s_actual=s, eps=eps),
        grid=(s_pad // bq, b * n),  # head innermost (see _prep_kernel)
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, hc: (hc // n, cl(i), hc % n)),
            pl.BlockSpec((1, hd), lambda i, hc: (0, 0)),
            pl.BlockSpec((bq, hd), lambda i, hc: (cl(i), 0)),
            pl.BlockSpec((bq, hd), lambda i, hc: (cl(i), 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda i, hc: (hc, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, s_pad, hd), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x, gam, ff[0], ff[1])


def _prep_kernel_joint(xi_ref, xt_ref, gi_ref, gt_ref, cos_ref, sin_ref,
                       o_ref, *, rope, bq, img_tiles, s_img, s_txt, eps):
    """Two-stream per-head-rms prep for JOINT txt+img attention (Qwen,
    FLUX.1/FLUX.2 double blocks): grid tiles < img_tiles pull from the img
    stream (rows [0, s_img) of the output), the rest from txt (rows
    [img_tiles*bq, ...)), sharing one output buffer and one joint rope
    table indexed by OUTPUT row.  Gap rows (img tail-of-region, txt
    tail) are stored as exact zeros — the bounded flash kernels' l -= pad
    correction only depends on the zero-row COUNT, not position, so an
    interior gap is exactly as legal as the usual tail pad."""
    i = pl.program_id(0)

    @pl.when(i < img_tiles)
    def _():
        x = xi_ref[0].astype(jnp.float32)
        rs = lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        y = (x * rs).astype(o_ref.dtype) * gi_ref[0][None, :]
        _rotate_mask_store(y, cos_ref, sin_ref, o_ref, rope=rope, bq=bq,
                           s_actual=s_img, i=i)

    @pl.when(i >= img_tiles)
    def _():
        x = xt_ref[0].astype(jnp.float32)
        rs = lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
        y = (x * rs).astype(o_ref.dtype) * gt_ref[0][None, :]
        _rotate_mask_store(y, cos_ref, sin_ref, o_ref, rope=rope, bq=bq,
                           s_actual=s_txt, i=i - img_tiles)


def rms_rope_heads_major_joint(x_img, x_txt, g_img, g_txt, ff_joint,
                               n_heads: int, i_pad: int, s_pad: int, *,
                               eps: float, bq: int = 512):
    """Joint two-stream variant of rms_rope_heads_major_per_head:
    x_img/x_txt (B, S_img/S_txt, N*hd) raw projections, g_* (hd,) per-head
    gammas (q gammas pre-scaled by the caller), ff_joint (2, s_pad, hd)
    full-width tables in the OUTPUT (img-first) row layout.  Returns
    (B*N, s_pad, hd) with img rows at 0, txt rows at i_pad, all other
    rows exactly zero."""
    b, s_img, d = x_img.shape
    s_txt = x_txt.shape[1]
    hd = d // n_heads
    assert hd <= 128 and 128 % hd == 0, hd
    assert i_pad % bq == 0 and s_pad % bq == 0, (i_pad, s_pad, bq)
    img_tiles = i_pad // bq
    n = n_heads
    gi = g_img.reshape(1, hd)
    gt = g_txt.reshape(1, hd)
    il = (s_img - 1) // bq   # clamps: fully-OOB input blocks are invalid
    tl = (s_txt - 1) // bq
    cli = lambda i: jnp.minimum(i, il)
    clt = lambda i: jnp.minimum(jnp.maximum(i - img_tiles, 0), tl)
    return pl.pallas_call(
        functools.partial(_prep_kernel_joint, rope=True, bq=bq,
                          img_tiles=img_tiles, s_img=s_img, s_txt=s_txt,
                          eps=eps),
        grid=(s_pad // bq, b * n),  # head innermost (see _prep_kernel)
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, hc: (hc // n, cli(i), hc % n)),
            pl.BlockSpec((1, bq, hd), lambda i, hc: (hc // n, clt(i), hc % n)),
            pl.BlockSpec((1, hd), lambda i, hc: (0, 0)),
            pl.BlockSpec((1, hd), lambda i, hc: (0, 0)),
            pl.BlockSpec((bq, hd), lambda i, hc: (i, 0)),
            pl.BlockSpec((bq, hd), lambda i, hc: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda i, hc: (hc, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, s_pad, hd), x_img.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x_img, x_txt, gi, gt, ff_joint[0], ff_joint[1])


def build_freqs_full_joint(cos_img, sin_img, cos_txt, sin_txt,
                           i_pad: int, s_pad: int) -> jnp.ndarray:
    """Per-segment (L, hd/2) pair tables -> (2, s_pad, hd) full-width
    joint tables in the img-first fused layout (img rows at 0, txt rows
    at i_pad; gap rows zero — their outputs are masked anyway)."""
    fi = build_freqs_full_pairs(cos_img, sin_img)
    ft = build_freqs_full_pairs(cos_txt, sin_txt)
    out = jnp.zeros((2, s_pad, fi.shape[-1]), jnp.float32)
    out = lax.dynamic_update_slice(out, fi, (0, 0, 0))
    return lax.dynamic_update_slice(out, ft, (0, i_pad, 0))


def _rowscale(x, eps: float):
    xf = x.astype(jnp.float32)
    return lax.rsqrt(jnp.mean(xf * xf, axis=-1) + eps)


_PREP_BQ = 512


def _pad_for_flash(s: int):
    """(s_pad, bq, bk) so the prep output plugs straight into the bounded
    flash kernels.  s_pad rounds up to a 1024 multiple so the flash
    kernels always get their measured-good tiles (q 2048/1024, k 1024)
    instead of degrading to 512/512 at odd lengths (720p S=18480 used to
    pad to 18944=37*512); the prep grid clamps its input block index so
    the overshoot past the last valid row is legal (see
    rms_rope_heads_major)."""
    s_pad = max(-(-s // 1024) * 1024, _PREP_BQ)
    bq = 2048 if s_pad % 2048 == 0 else 1024
    bk = 1024
    return s_pad, min(bq, s_pad), min(bk, s_pad)


def _fused_fwd(xq, xk, v, gamma_q, gamma_k, freqs_full, n_heads: int,
               eps: float):
    from .flash_attention import flash_attention_heads_major

    b, s, d = xq.shape
    s_pad, bq, bk = _pad_for_flash(s)
    prep_bq = min(_PREP_BQ, s_pad)
    qh = rms_rope_heads_major(xq, gamma_q, _rowscale(xq, eps), freqs_full,
                              n_heads, s_pad, bq=prep_bq)
    kh = rms_rope_heads_major(xk, gamma_k, _rowscale(xk, eps), freqs_full,
                              n_heads, s_pad, bq=prep_bq)
    return flash_attention_heads_major(qh, kh, v, b=b, n=n_heads, sq=s,
                                       sk_actual=s, bq=bq, bk=bk,
                                       natural_out=_NATURAL_OUT)


def _reference_chain(xq, xk, v, gamma_q, gamma_k, freqs, n_heads, eps):
    """The legacy path -- the backward rule and the non-TPU fallback.
    gamma_q arrives pre-scaled by scale*log2e (the caller's prescale
    fold), hence prescaled=True."""
    from .attention import attention

    b, s, d = xq.shape
    hd = d // n_heads
    q = rms_norm(xq, gamma_q, eps)
    k = rms_norm(xk, gamma_k, eps)
    q = rope_apply(q.reshape(b, s, n_heads, hd), freqs)
    k = rope_apply(k.reshape(b, s, n_heads, hd), freqs)
    return attention(q, k, v, prescaled=True, bounded_logits=True)


def _cross_reference_chain(xq, k, v, gamma_q, n_heads, eps):
    from .attention import attention

    b, s, d = xq.shape
    hd = d // n_heads
    q = rms_norm(xq, gamma_q, eps).reshape(b, s, n_heads, hd)
    return attention(q, k, v, prescaled=True, bounded_logits=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_q_attention(xq, k, v, gamma_q, n_heads: int, eps: float):
    """Cross-attention with fused q-side prep: rms-apply + head-major
    relayout in one pass (no RoPE on the Wan cross-attention).  k/v are
    already per-head (B, Lk, N, hd) — small (text tokens), relayouted in
    XLA.  gamma_q pre-scaled by scale*log2e.  Returns (B, S, N, hd)."""
    hd = xq.shape[-1] // n_heads
    if not (_on_tpu() and hd == 128 and k.shape[1] <= 1024):
        return _cross_reference_chain(xq, k, v, gamma_q, n_heads, eps)
    from .flash_attention import flash_attention_heads_major

    b, s, d = xq.shape
    lk = k.shape[1]
    s_pad, bq, _ = _pad_for_flash(s)
    qh = rms_rope_heads_major(xq, gamma_q, _rowscale(xq, eps), None,
                              n_heads, s_pad, rope=False,
                              bq=min(_PREP_BQ, s_pad))
    bk = max(128, -(-lk // 128) * 128)
    kh = k.transpose(0, 2, 1, 3).reshape(b * n_heads, lk, hd)
    kh = jnp.pad(kh, ((0, 0), (0, bk - lk), (0, 0))) if bk != lk else kh
    return flash_attention_heads_major(qh, kh, v, b=b, n=n_heads, sq=s,
                                       sk_actual=lk, bq=bq, bk=bk,
                                       natural_out=_NATURAL_OUT)


def _fused_q_vjp_fwd(xq, k, v, gamma_q, n_heads, eps):
    out = fused_q_attention(xq, k, v, gamma_q, n_heads, eps)
    return out, (xq, k, v, gamma_q)


def _fused_q_vjp_bwd(n_heads, eps, res, g):
    xq, k, v, gamma_q = res
    _, vjp = jax.vjp(
        lambda a, b_, c, gq: _cross_reference_chain(a, b_, c, gq, n_heads,
                                                    eps),
        xq, k, v, gamma_q)
    return vjp(g)


fused_q_attention.defvjp(_fused_q_vjp_fwd, _fused_q_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_qk_attention(xq, xk, v, gamma_q, gamma_k, freqs, freqs_full,
                       n_heads: int, eps: float):
    """Self-attention from raw q/k projections: fused prep + bounded flash.

    xq/xk (B, S, D) projection outputs, v (B, S, N, hd); gamma_q MUST be
    pre-scaled by scale*log2e (see dit._self_attention).  Returns
    (B, S, N, hd).  Forward is bit-compatible with the legacy chain; the
    backward differentiates the legacy chain (gradients for xq, xk, v and
    both gammas)."""
    if _on_tpu() and (xq.shape[-1] // n_heads) == 128:
        return _fused_fwd(xq, xk, v, gamma_q, gamma_k, freqs_full,
                          n_heads, eps)
    return _reference_chain(xq, xk, v, gamma_q, gamma_k, freqs, n_heads, eps)


def _fused_vjp_fwd(xq, xk, v, gamma_q, gamma_k, freqs, freqs_full,
                   n_heads, eps):
    out = fused_qk_attention(xq, xk, v, gamma_q, gamma_k, freqs, freqs_full,
                             n_heads, eps)
    return out, (xq, xk, v, gamma_q, gamma_k, freqs, freqs_full)


def _fused_vjp_bwd(n_heads, eps, res, g):
    xq, xk, v, gamma_q, gamma_k, freqs, freqs_full = res
    _, vjp = jax.vjp(
        lambda a, b_, c, gq, gk, fr: _reference_chain(
            a, b_, c, gq, gk, fr, n_heads, eps),
        xq, xk, v, gamma_q, gamma_k, freqs)
    dxq, dxk, dv, dgq, dgk, dfr = vjp(g)
    return dxq, dxk, dv, dgq, dgk, dfr, jnp.zeros_like(freqs_full)


fused_qk_attention.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


_LOG2E = 1.4426950408889634


def _reference_chain_per_head(xq, xk, v, gamma_q, gamma_k, cos, sin,
                              n_heads, eps, fold_scale=True):
    """The legacy per-head path (exactly ops-for-ops what the Z-Image /
    FLUX-single attentions do: reshape -> per-head rms -> interleaved
    rope -> bounded flash).  fold_scale=False means the caller already
    folded scale*log2e into gamma_q at convert time (FLUX), i.e. the
    legacy call passes prescaled=True."""
    from .attention import attention

    b, s, d = xq.shape
    hd = d // n_heads
    q = rms_norm(xq.reshape(b, s, n_heads, hd), gamma_q, eps)
    k = rms_norm(xk.reshape(b, s, n_heads, hd), gamma_k, eps)
    q = apply_interleaved_rope(q, cos, sin)
    k = apply_interleaved_rope(k, cos, sin)
    return attention(q, k, v, prescaled=not fold_scale, bounded_logits=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_qk_attention_per_head(xq, xk, v, gamma_q, gamma_k, cos, sin,
                                n_heads: int, eps: float,
                                fold_scale: bool = True):
    """Self-attention from raw q/k projections for the per-head-rms +
    interleaved-rope image DiTs (Z-Image, FLUX single blocks).

    xq/xk (B, S, D), v (B, S, N, hd), gamma_q/k (hd,); cos/sin (S, hd/2)
    pair tables.  fold_scale=True: gamma_q is raw, fold scale*log2e here
    (Z-Image); False: already folded at convert time (FLUX).  Returns
    (B, S, N, hd).  Backward routes through the legacy chain."""
    hd = xq.shape[-1] // n_heads
    if not (_on_tpu() and hd == 128):
        return _reference_chain_per_head(xq, xk, v, gamma_q, gamma_k, cos,
                                         sin, n_heads, eps, fold_scale)
    from .flash_attention import flash_attention_heads_major

    b, s, d = xq.shape
    ff = build_freqs_full_pairs(cos, sin)  # tiny vs the q/k traffic saved
    if fold_scale:
        c = jnp.asarray(hd**-0.5 * _LOG2E, jnp.float32)
        gq = (gamma_q.astype(jnp.float32) * c).astype(gamma_q.dtype)
    else:
        gq = gamma_q
    s_pad, bq, bk = _pad_for_flash(s)
    prep_bq = min(_PREP_BQ, s_pad)
    qh = rms_rope_heads_major_per_head(xq, gq, ff, n_heads, s_pad, eps=eps,
                                       bq=prep_bq)
    kh = rms_rope_heads_major_per_head(xk, gamma_k, ff, n_heads, s_pad,
                                       eps=eps, bq=prep_bq)
    return flash_attention_heads_major(qh, kh, v, b=b, n=n_heads, sq=s,
                                       sk_actual=s, bq=bq, bk=bk,
                                       natural_out=_NATURAL_OUT)


def _fused_ph_vjp_fwd(xq, xk, v, gamma_q, gamma_k, cos, sin, n_heads, eps,
                      fold_scale):
    out = fused_qk_attention_per_head(xq, xk, v, gamma_q, gamma_k, cos, sin,
                                      n_heads, eps, fold_scale)
    return out, (xq, xk, v, gamma_q, gamma_k, cos, sin)


def _fused_ph_vjp_bwd(n_heads, eps, fold_scale, res, g):
    xq, xk, v, gamma_q, gamma_k, cos, sin = res
    _, vjp = jax.vjp(
        lambda a, b_, c_, gq, gk, co, si: _reference_chain_per_head(
            a, b_, c_, gq, gk, co, si, n_heads, eps, fold_scale),
        xq, xk, v, gamma_q, gamma_k, cos, sin)
    return vjp(g)


fused_qk_attention_per_head.defvjp(_fused_ph_vjp_fwd, _fused_ph_vjp_bwd)


def _reference_chain_joint(xq_t, xk_t, v_t, xq_i, xk_i, v_i, gq_t, gk_t,
                           gq_i, gk_i, cos_t, sin_t, cos_i, sin_i,
                           n_heads, eps, fold_scale):
    """The legacy joint path (ops-for-ops what the Qwen / FLUX double
    blocks do: per-stream per-head rms -> per-stream interleaved rope ->
    txt-first concat -> bounded flash) — the backward rule and non-TPU
    fallback.  Returns (o_txt, o_img) in natural (B, L, N, hd) layout."""
    from .attention import attention

    b, s_t, d = xq_t.shape
    s_i = xq_i.shape[1]
    hd = d // n_heads
    qt = rms_norm(xq_t.reshape(b, s_t, n_heads, hd), gq_t, eps)
    kt = rms_norm(xk_t.reshape(b, s_t, n_heads, hd), gk_t, eps)
    qi = rms_norm(xq_i.reshape(b, s_i, n_heads, hd), gq_i, eps)
    ki = rms_norm(xk_i.reshape(b, s_i, n_heads, hd), gk_i, eps)
    qt = apply_interleaved_rope(qt, cos_t, sin_t)
    kt = apply_interleaved_rope(kt, cos_t, sin_t)
    qi = apply_interleaved_rope(qi, cos_i, sin_i)
    ki = apply_interleaved_rope(ki, cos_i, sin_i)
    q = jnp.concatenate([qt, qi], axis=1)
    k = jnp.concatenate([kt, ki], axis=1)
    v = jnp.concatenate([v_t, v_i], axis=1)
    o = attention(q, k, v, prescaled=not fold_scale, bounded_logits=True)
    return o[:, :s_t], o[:, s_t:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16))
def fused_qk_attention_joint(xq_t, xk_t, v_t, xq_i, xk_i, v_i,
                             gq_t, gk_t, gq_i, gk_i,
                             cos_t, sin_t, cos_i, sin_i,
                             n_heads: int, eps: float,
                             fold_scale: bool = True):
    """JOINT txt+img self-attention from raw per-stream projections
    (Qwen-Image / FLUX.1 / FLUX.2 double blocks): fused two-stream prep +
    bounded flash over one buffer with the img segment at row 0 (padded
    to a 1024 multiple) and the txt segment after it.  Exactness: full
    attention is permutation-invariant over the key axis and the zeroed
    gap rows add exp2(0)=1 each to every denominator — corrected by the
    same count-based `l -= pad` the tail pad already uses.

    xq/xk (B, L, N*hd) raw projection outputs, v (B, L, N, hd) natural;
    gq/gk (hd,) per-stream per-head gammas; cos/sin (L, hd/2) per-stream
    pair tables.  fold_scale as in fused_qk_attention_per_head.  Returns
    (o_txt, o_img) in natural layout — reference txt-first concat order.
    Backward routes through the legacy chain (exact legacy gradients)."""
    hd = xq_i.shape[-1] // n_heads
    if not (_on_tpu() and hd == 128):
        return _reference_chain_joint(xq_t, xk_t, v_t, xq_i, xk_i, v_i,
                                      gq_t, gk_t, gq_i, gk_i,
                                      cos_t, sin_t, cos_i, sin_i,
                                      n_heads, eps, fold_scale)
    from .flash_attention import _heads_major, flash_attention_heads_major

    b, s_i, d = xq_i.shape
    s_t = xq_t.shape[1]
    i_pad = -(-s_i // 1024) * 1024
    t_pad = -(-s_t // 1024) * 1024
    s_pad = i_pad + t_pad
    bq = 2048 if s_pad % 2048 == 0 else 1024
    ff = build_freqs_full_joint(cos_i, sin_i, cos_t, sin_t, i_pad, s_pad)
    if fold_scale:
        c = jnp.asarray(hd**-0.5 * _LOG2E, jnp.float32)
        gq_t = (gq_t.astype(jnp.float32) * c).astype(gq_t.dtype)
        gq_i = (gq_i.astype(jnp.float32) * c).astype(gq_i.dtype)
    qh = rms_rope_heads_major_joint(xq_i, xq_t, gq_i, gq_t, ff, n_heads,
                                    i_pad, s_pad, eps=eps)
    kh = rms_rope_heads_major_joint(xk_i, xk_t, gk_i, gk_t, ff, n_heads,
                                    i_pad, s_pad, eps=eps)
    vh = jnp.concatenate([_heads_major(v_i, b, n_heads, s_i, hd, i_pad),
                          _heads_major(v_t, b, n_heads, s_t, hd, t_pad)],
                         axis=1)
    o = flash_attention_heads_major(qh, kh, None, b=b, n=n_heads,
                                    sq=i_pad + s_t, sk_actual=s_i + s_t,
                                    bq=bq, bk=1024, natural_out=_NATURAL_OUT,
                                    vh=vh)
    return o[:, i_pad:], o[:, :s_i]


def _fused_joint_vjp_fwd(xq_t, xk_t, v_t, xq_i, xk_i, v_i, gq_t, gk_t,
                         gq_i, gk_i, cos_t, sin_t, cos_i, sin_i,
                         n_heads, eps, fold_scale):
    out = fused_qk_attention_joint(xq_t, xk_t, v_t, xq_i, xk_i, v_i,
                                   gq_t, gk_t, gq_i, gk_i,
                                   cos_t, sin_t, cos_i, sin_i,
                                   n_heads, eps, fold_scale)
    return out, (xq_t, xk_t, v_t, xq_i, xk_i, v_i, gq_t, gk_t, gq_i, gk_i,
                 cos_t, sin_t, cos_i, sin_i)


def _fused_joint_vjp_bwd(n_heads, eps, fold_scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: _reference_chain_joint(*a, n_heads, eps, fold_scale),
        *res)
    return vjp(g)


fused_qk_attention_joint.defvjp(_fused_joint_vjp_fwd, _fused_joint_vjp_bwd)
