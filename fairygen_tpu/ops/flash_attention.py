"""Pallas TPU flash attention (dense, unmasked — video DiT self/cross attn).

Replaces the reference's external flash-attn-2/3 / SageAttention kernels
(``animation/diffsynth/core/attention/attention.py``,
``models/wan_video_dit.py:27-60``) with a TPU-native online-softmax kernel:

  - grid (B·N, Sq/bq, Sk/bk); the k-tile axis is innermost so partial
    (m, l, acc) state lives in VMEM scratch across iterations;
  - logits on the MXU in fp32 (`preferred_element_type`), softmax in fp32,
    bf16 p·v matmul with fp32 accumulation;
  - ragged tails handled by padding to tile multiples + column masking.

Differentiable via custom_vjp with Pallas backward kernels (flash-style
O(S) memory): the forward saves per-row logsumexp; backward runs a dq
kernel (accumulate over k tiles) and a dkv kernel (accumulate over q
tiles) with the standard dS = P∘(dP − δ) recomputation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 1024
DEFAULT_BK = 1024
_NEG_INF = -1e30


_LOG2E = 1.4426950408889634


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, sk_actual, bk, masked):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, d) — pre-scaled by scale·log2e (see _prescale_q)
    k = k_ref[0]  # (bk, d)
    # softmax in base-2 (exp2 is the cheap transcendental on the VPU):
    # exp(s·scale) == exp2(s·scale·log2e); the scale·log2e factor is folded
    # into q OUTSIDE the kernel (fused into the producing elementwise chain
    # by XLA), saving one full VPU pass over every (bq, bk) logits tile —
    # measured +12%% on v5e (93 -> 104 TF/s at S=8192, d=128).
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    if masked:
        # mask padded key columns (compiled out for exact-multiple shapes)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
        s = jnp.where(col < sk_actual, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _fa_kernel_bounded(q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref, *,
                       sk_actual, bk, masked, pad_correct=0):
    """Streaming kernel WITHOUT max tracking, for provably bounded logits.

    When q and k are rms-normed (every Wan/FLUX attention: norm_q/norm_k),
    |q·k·scale·log2e| <= sqrt(d)·log2e ~= 16.3 << 127, so exp2 can never
    overflow and the softmax shift is unnecessary: softmax(s) ==
    exp2(s)/sum(exp2(s)) exactly.  Drops the per-tile max pass and the
    rescale of the accumulator (measured ~9%% on the S=8192 self-attn).

    pad_correct > 0: the only masked-out columns are the trailing
    `pad_correct` zero rows _pad_to appended to k/v.  Those columns carry
    s = q·0 = 0 exactly, so they add exactly exp2(0)·pad = pad to every
    row's denominator (and nothing to acc — the v rows are zero).
    Subtracting `pad` from l at the end is EXACT and saves the
    iota+compare+select VPU pass over every logits tile (bounded range
    keeps all real exp2(s) in [2^-17, 2^17], so l - pad never cancels to
    zero)."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if masked and not pad_correct:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
        s = jnp.where(col < sk_actual, s, _NEG_INF)
    p = jnp.exp2(s)  # bounded: no shift needed, exp2(-1e30) == 0 masks
    l_ref[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] += jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _():
        l = l_ref[:, :1]
        if pad_correct:
            l = l - jnp.float32(pad_correct)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype).reshape(o_ref[0].shape)


def _fa_small_kv_kernel(q_ref, k_ref, v_ref, o_ref, *, sk_actual, masked,
                        bounded=False, pad_correct=0):
    """Single-k-tile fast path (cross-attention: kv length <= one block).

    The whole key range sits in VMEM, so no online-softmax state machine is
    needed: one max, one exp2, one sum, one p·v — about half the VPU passes
    of the streaming kernel.  Measured 2.13 -> ~1.2 ms for the DiT
    cross-attention (S=8190, L=512, 24 heads) on v5e.

    pad_correct: see _fa_kernel_bounded — exact l correction for trailing
    zero-padding, skipping the mask pass (bounded path only)."""
    q = q_ref[0]  # (bq, d), pre-scaled by scale·log2e
    k = k_ref[0]  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if masked and not (bounded and pad_correct):
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < sk_actual, s, _NEG_INF)
    if bounded:
        p = jnp.exp2(s)  # rms-normed q/k: |s| < 17, overflow impossible
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if bounded and masked and pad_correct:
        l = l - jnp.float32(pad_correct)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (pv / l).astype(o_ref.dtype).reshape(o_ref[0].shape)


def _fa_bias_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, acc_ref, m_ref,
                    l_ref):
    """Forward with an additive logits bias (EliGen regional masks): the
    bias arrives in the NATURAL log domain (torch SDPA attn_mask
    semantics) and is converted to the kernel's base-2 domain in-tile.
    Bias is head-shared (B, Sq, Sk) — the block index maps h -> h // n so
    the (Sq, Sk) tile streams once per batch row, not per head."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + bias_ref[0] * _LOG2E

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def flash_attention_bias(q, k, v, bias, scale=None, prescaled=False):
    """Forward-only flash attention with a head-shared additive bias
    (B|1, Sq, Sk) fp32 — the EliGen fast path.  Padded kv columns are
    masked through the bias itself (-1e30 pad)."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    scale_val = float(d ** -0.5) if scale is None else float(scale)
    bq = min(DEFAULT_BQ, max(128, sq))
    bk = min(DEFAULT_BK, max(128, sk))
    if not prescaled:
        q = _prescale_q(q, scale_val)
    qh = _heads_major(q, b, n, sq, d, bq)
    kh = _heads_major(k, b, n, sk, d, bk)
    vh = _heads_major(v, b, n, sk, d, bk)
    sq_p, sk_p = qh.shape[1], kh.shape[1]

    bias = jnp.broadcast_to(bias.astype(jnp.float32), (b, sq, sk))
    bias = jnp.pad(bias, ((0, 0), (0, sq_p - sq), (0, sk_p - sk)),
                   constant_values=_NEG_INF)

    grid = (b * n, sq_p // bq, sk_p // bk)
    out = pl.pallas_call(
        _fa_bias_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bq, bk), lambda h, i, j: (h // n, i, j)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh, vh, bias)
    return out[:, :sq].reshape(b, n, sq, d).transpose(0, 2, 1, 3)


def _fa_fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref,
                       l_ref, *, sk_actual, bk, masked):
    """Forward that also emits per-row logsumexp (base-2) for the backward."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
        s = jnp.where(col < sk_actual, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:, :1] = m_new
    l_ref[:, :1] = l_new

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log2(l_ref[:, :1])
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _fa_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                      acc_ref, *, dq_factor, sk_actual, bk, masked):
    """dQ_i = scale · Σ_j [P∘(dP − δ)] K_j — accumulate over k tiles."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
        s = jnp.where(col < sk_actual, s, _NEG_INF)
    p = jnp.exp2(s - lse_ref[0, :, :1])  # (bq, bk)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, :, :1])
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = (acc_ref[:] * dq_factor).astype(dq_ref.dtype)


def _fa_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dk_ref, dv_ref, dk_acc, dv_acc, *, sk_actual, bk, masked):
    """dV_j = Σ_i Pᵀ dO_i ; dK_j = scale · Σ_i [P∘(dP − δ)]ᵀ Q_i."""
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if masked:
        j = pl.program_id(1)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
        s = jnp.where(col < sk_actual, s, _NEG_INF)
    p = jnp.exp2(s - lse_ref[0, :, :1])  # (bq, bk)
    do = do_ref[0]
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0, :, :1])
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == ni - 1)
    def _():
        # q arrives pre-scaled by scale·log2e: dK = dSᵀ·q_raw·scale
        #   = dSᵀ·q_pre·(scale / (scale·log2e)) = dSᵀ·q_pre / log2e
        dk_ref[0] = (dk_acc[:] * (1.0 / _LOG2E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _prescale_q(q, scale_val):
    """Fold the softmax scale and the base-2 conversion into q — XLA fuses
    this multiply into the elementwise chain that produces q (RoPE), so it
    costs nothing, while removing a full-logits VPU pass in the kernel."""
    return (q.astype(jnp.float32) * (scale_val * _LOG2E)).astype(q.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, scale=None, prescaled=False, kv_len=None,
                    bounded_logits=False):
    """prescaled=True: the caller already folded scale·log2e into q (e.g.
    into the rms_norm gamma — exactly free); gradients are then w.r.t. the
    pre-scaled q.  kv_len: only the first kv_len key/value tokens attend —
    padded kv columns (e.g. Ulysses seq padding) are masked EXACTLY, unlike
    the reference's let-padding-attend approximation
    (xdit_context_parallel.py:95-99).  bounded_logits=True skips softmax
    max-tracking — safe ONLY when q/k are rms-normed (|logits2| < 17)."""
    return _flash_fwd_impl(q, k, v, scale, prescaled, kv_len,
                           bounded_logits=bounded_logits)


def flash_attention_with_lse(q, k, v, scale=None, prescaled=False,
                             kv_len=None):
    """Forward that also returns the per-row logsumexp in base 2
    (B,Sq,N) float32 — the merge statistic for ring/context-parallel
    attention (parallel/ring.py).  Reuses the LSE-emitting kernel the
    backward pass already uses; forward-only (no VJP through lse)."""
    b, sq, n, d = q.shape
    o, (_, _, _, _, lse) = _flash_fwd(q, k, v, scale, prescaled, kv_len)
    lse = lse[:, :sq, 0].reshape(b, n, sq).transpose(0, 2, 1)
    return o, lse


def _flash_fwd_impl(q, k, v, scale=None, prescaled=False, kv_len=None,
                    bounded_logits=False, bq=None, bk=None):
    """q (B,Sq,N,D), k/v (B,Sk,N,D) -> (B,Sq,N,D).

    bq/bk override the tile sizes (tools/bench_attention_sweep.py tunes
    them on hardware; production uses the measured defaults below)."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    scale_val = float(d**-0.5) if scale is None else float(scale)

    # the max-free kernel carries no (m) scratch and fewer VPU passes, so a
    # taller q tile fits VMEM and amortizes k/v streaming better
    # (measured 6.6 -> 5.9 ms at S=8192 with bq=2048 on v5e)
    bq_default = 2048 if bounded_logits else DEFAULT_BQ
    bq = min(bq_default if bq is None else bq, max(128, sq))
    bk = min((DEFAULT_BK if bk is None else bk), max(128, sk))

    # head-major layout: blocks must keep (seq, d) as the trailing dims
    if not prescaled:
        q = _prescale_q(q, scale_val)
    qh = _pad_to(q.transpose(0, 2, 1, 3).reshape(b * n, sq, d), 1, bq)
    kh = _pad_to(k.transpose(0, 2, 1, 3).reshape(b * n, sk, d), 1, bk)
    vh = _pad_to(v.transpose(0, 2, 1, 3).reshape(b * n, sk, d), 1, bk)
    sq_p, sk_p = qh.shape[1], kh.shape[1]
    sk_act = sk if kv_len is None else int(kv_len)
    masked = sk_act != sk_p
    # trailing _pad_to zeros (no caller raggedness): the bounded kernels
    # replace the per-tile mask pass with an exact l -= pad correction
    pad_correct = (sk_p - sk) if (kv_len is None and bounded_logits) else 0

    if sk_p == bk:
        # kv fits one block -> stateless single-pass kernel
        out = pl.pallas_call(
            functools.partial(_fa_small_kv_kernel, sk_actual=sk_act,
                              masked=masked, bounded=bounded_logits,
                              pad_correct=pad_correct),
            grid=(b * n, sq_p // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda h, i: (h, i, 0)),
                pl.BlockSpec((1, bk, d), lambda h, i: (h, 0, 0)),
                pl.BlockSpec((1, bk, d), lambda h, i: (h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda h, i: (h, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b * n, sq_p, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(qh, kh, vh)
        return out[:, :sq].reshape(b, n, sq, d).transpose(0, 2, 1, 3)

    grid = (b * n, sq_p // bq, sk_p // bk)
    if bounded_logits:
        out = pl.pallas_call(
            functools.partial(_fa_kernel_bounded, sk_actual=sk_act, bk=bk,
                              masked=masked, pad_correct=pad_correct),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
                pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
                pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b * n, sq_p, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qh, kh, vh)
        return out[:, :sq].reshape(b, n, sq, d).transpose(0, 2, 1, 3)
    out = pl.pallas_call(
        functools.partial(_fa_kernel, sk_actual=sk_act, bk=bk, masked=masked),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh, vh)

    return out[:, :sq].reshape(b, n, sq, d).transpose(0, 2, 1, 3)


def _heads_major(x, b, n, s, d, bs):
    return _pad_to(x.transpose(0, 2, 1, 3).reshape(b * n, s, d), 1, bs)


def flash_attention_heads_major(qh, kh, v, *, b, n, sq, sk_actual,
                                bq=2048, bk=1024, natural_out=False,
                                vh=None):
    """Forward-only bounded-logits attention on PRE-FORMATTED head-major
    q/k (from ops/fused_qk.rms_rope_heads_major): qh (B*N, S_pad, d)
    prescaled + rotated, kh (B*N, S_pad, d) with rows >= sk_actual exactly
    zero (the pad_correct contract), v (B, S, N, d) natural layout.
    Returns (B, sq, N, d).  Skips the q/k transpose+pad passes the generic
    entry pays; only v is relayouted here.

    natural_out=True writes the output blocks straight into a
    (B, S_pad, N, d) array (strided DMA stores), skipping the XLA
    transpose-back pass — A/B this on hardware (docs/NOTES.md)."""
    d = qh.shape[-1]
    sq_p, sk_p = qh.shape[1], kh.shape[1]
    assert sq_p % bq == 0 and sk_p % bk == 0, (sq_p, sk_p, bq, bk)
    if vh is None:
        vh = _heads_major(v, b, n, v.shape[1], d, bk)
    # vh may be pre-assembled by the caller (the joint txt+img path, with
    # an interior zero gap); pad_correct is a pure zero-row COUNT, so the
    # correction is exact wherever the zeros sit.
    assert vh.shape[1] == sk_p, (vh.shape, sk_p)
    pad_correct = sk_p - sk_actual
    masked = pad_correct > 0

    if natural_out:
        # (B, S_pad, N*d) view of the natural (B, S, N, d) layout: Mosaic
        # rejects a (1, bq, 1, d) block (sublane dim 1 on an N-sized axis),
        # but blocking the fused N*d axis into per-head d-slices is legal
        # and byte-identical; the reshape back below is free.
        out_spec2 = pl.BlockSpec((1, bq, d), lambda h, i: (h // n, i, h % n))
        out_spec3 = pl.BlockSpec((1, bq, d), lambda h, i, j: (h // n, i, h % n))
        out_shape = jax.ShapeDtypeStruct((b, sq_p, n * d), qh.dtype)
    else:
        out_spec2 = pl.BlockSpec((1, bq, d), lambda h, i: (h, i, 0))
        out_spec3 = pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0))
        out_shape = jax.ShapeDtypeStruct((b * n, sq_p, d), qh.dtype)

    if sk_p == bk:
        out = pl.pallas_call(
            functools.partial(_fa_small_kv_kernel, sk_actual=sk_actual,
                              masked=masked, bounded=True,
                              pad_correct=pad_correct),
            grid=(b * n, sq_p // bq),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda h, i: (h, i, 0)),
                pl.BlockSpec((1, bk, d), lambda h, i: (h, 0, 0)),
                pl.BlockSpec((1, bk, d), lambda h, i: (h, 0, 0)),
            ],
            out_specs=out_spec2,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(qh, kh, vh)
    else:
        out = pl.pallas_call(
            functools.partial(_fa_kernel_bounded, sk_actual=sk_actual,
                              bk=bk, masked=masked, pad_correct=pad_correct),
            grid=(b * n, sq_p // bq, sk_p // bk),
            in_specs=[
                pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
                pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
                pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
            ],
            out_specs=out_spec3,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((bq, d), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qh, kh, vh)
    if natural_out:
        return out[:, :sq].reshape(b, sq, n, d)
    return out[:, :sq].reshape(b, n, sq, d).transpose(0, 2, 1, 3)


def _flash_fwd(q, k, v, scale, prescaled=False, kv_len=None,
               bounded_logits=False):
    # bounded_logits only affects the inference fast path; the vjp forward
    # uses the LSE-emitting kernel either way (gradients need the lse).
    """Forward for the vjp: also computes per-row logsumexp via the
    LSE-emitting kernel."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    scale_val = float(d**-0.5) if scale is None else float(scale)
    bq = min(DEFAULT_BQ, max(128, sq))
    bk = min(DEFAULT_BK, max(128, sk))
    qp = q if prescaled else _prescale_q(q, scale_val)
    qh = _heads_major(qp, b, n, sq, d, bq)
    kh = _heads_major(k, b, n, sk, d, bk)
    vh = _heads_major(v, b, n, sk, d, bk)
    sq_p, sk_p = qh.shape[1], kh.shape[1]
    sk_act = sk if kv_len is None else int(kv_len)
    masked = sk_act != sk_p

    grid = (b * n, sq_p // bq, sk_p // bk)
    out, lse = pl.pallas_call(
        functools.partial(_fa_fwd_lse_kernel, sk_actual=sk_act, bk=bk,
                          masked=masked),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda h, i, j: (h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * n, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * n, sq_p, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh, vh)

    o = out[:, :sq].reshape(b, n, sq, d).transpose(0, 2, 1, 3)
    return o, (q, k, v, out, lse)


def _flash_bwd(scale, prescaled, kv_len, bounded_logits, res, g):
    """Flash-style backward: dq kernel + dkv kernel, O(S) memory.

    With prescaled q the kernel's s is q_pre·kᵀ in the base-2 domain:
    dL/ds₂ = P∘(dP − δ)/log2e, so dq_pre = [P∘(dP−δ)]·K/log2e (dq factor
    1/log2e instead of scale) and dK keeps its 1/log2e factor either way
    (the kernel always sees pre-scaled q)."""
    q, k, v, o_hm, lse = res
    b, sq, n, d = q.shape
    sk = k.shape[1]
    scale_val = float(d**-0.5) if scale is None else float(scale)
    dq_factor = (1.0 / _LOG2E) if prescaled else scale_val
    bq = min(DEFAULT_BQ, max(128, sq))
    bk = min(DEFAULT_BK, max(128, sk))

    qp = q if prescaled else _prescale_q(q, scale_val)
    qh = _heads_major(qp, b, n, sq, d, bq)
    kh = _heads_major(k, b, n, sk, d, bk)
    vh = _heads_major(v, b, n, sk, d, bk)
    doh = _heads_major(g, b, n, sq, d, bq)
    sq_p, sk_p = qh.shape[1], kh.shape[1]
    sk_act = sk if kv_len is None else int(kv_len)
    masked = sk_act != sk_p

    # δ_i = Σ_d dO·O per row, broadcast over 128 lanes (cheap XLA pass)
    delta = jnp.sum(doh.astype(jnp.float32) * o_hm.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], delta.shape + (128,))

    common = dict(sk_actual=sk_act, bk=bk, masked=masked)
    dq = pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, dq_factor=dq_factor, **common),
        grid=(b * n, sq_p // bq, sk_p // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda h, i, j: (h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh, vh, doh, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_dkv_kernel, **common),
        grid=(b * n, sk_p // bk, sq_p // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, j, i: (h, i, 0)),
            pl.BlockSpec((1, bk, d), lambda h, j, i: (h, j, 0)),
            pl.BlockSpec((1, bk, d), lambda h, j, i: (h, j, 0)),
            pl.BlockSpec((1, bq, d), lambda h, j, i: (h, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda h, j, i: (h, i, 0)),
            pl.BlockSpec((1, bq, 128), lambda h, j, i: (h, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda h, j, i: (h, j, 0)),
            pl.BlockSpec((1, bk, d), lambda h, j, i: (h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * n, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * n, sk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qh, kh, vh, doh, lse, delta)

    def back(x, s_orig):
        return x[:, :s_orig].reshape(b, n, s_orig, d).transpose(0, 2, 1, 3)

    return back(dq, sq), back(dk, sk), back(dv, sk)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
