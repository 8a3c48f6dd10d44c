"""Pallas TPU flash attention (dense, unmasked — video DiT self/cross attn).

Replaces the reference's external flash-attn-2/3 / SageAttention kernels
(``animation/diffsynth/core/attention/attention.py``,
``models/wan_video_dit.py:27-60``) with a TPU-native online-softmax kernel:

  - grid (B·N, Sq/bq, Sk/bk); the k-tile axis is innermost so partial
    (m, l, acc) state lives in VMEM scratch across iterations;
  - logits on the MXU in fp32 (`preferred_element_type`), softmax in fp32,
    bf16 p·v matmul with fp32 accumulation;
  - ragged tails handled by padding to tile multiples + column masking.

Differentiable via custom_vjp: forward = this kernel; backward currently
recomputes attention with the XLA path (exact, memory O(S²) — fine at
training resolutions; a Pallas backward kernel is the planned upgrade).
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


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, sk_actual, bk):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale

    # mask padded key columns
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
    s = jnp.where(col < sk_actual, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
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


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale=None):
    return _flash_fwd_impl(q, k, v, scale)


def _flash_fwd_impl(q, k, v, scale=None):
    """q (B,Sq,N,D), k/v (B,Sk,N,D) -> (B,Sq,N,D)."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    scale_val = float(d**-0.5) if scale is None else float(scale)

    bq = min(DEFAULT_BQ, max(128, sq))
    bk = min(DEFAULT_BK, max(128, sk))

    # head-major layout: blocks must keep (seq, d) as the trailing dims
    qh = _pad_to(q.transpose(0, 2, 1, 3).reshape(b * n, sq, d), 1, bq)
    kh = _pad_to(k.transpose(0, 2, 1, 3).reshape(b * n, sk, d), 1, bk)
    vh = _pad_to(v.transpose(0, 2, 1, 3).reshape(b * n, sk, d), 1, bk)
    sq_p, sk_p = qh.shape[1], kh.shape[1]

    grid = (b * n, sq_p // bq, sk_p // bk)
    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale_val, sk_actual=sk, bk=bk),
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


def _flash_fwd(q, k, v, scale):
    return _flash_fwd_impl(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    """Exact backward via fp32 XLA recompute (O(S²) memory)."""
    q, k, v = res
    d = q.shape[-1]
    scale_val = d**-0.5 if scale is None else scale

    def ref(q, k, v):
        logits = jnp.einsum("bsnd,btnd->bnst", q, k).astype(jnp.float32) * scale_val
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bnst,btnd->bsnd", p, v)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
