"""int8 QK^T flash-attention experiment — VERDICT round-3 item 5.

The last exact-path lever: in-scan self-attention runs 5.89 ms vs a
~4.2 ms matmul-only bound, and kernel-body reordering is mined out
(docs/NOTES.md softmax-overlap entry).  This tries the ALGORITHM change:
quantize the (rms-normed, provably bounded) q/k rows to int8 with per-row
dynamic scales, compute s = QK^T on the MXU at int8 (2x bf16 MXU
throughput on v5e), dequantize with the scale outer product, softmax in
f32 exactly as the bounded kernel does.

Hypothesis being tested: if the per-tile critical path has MXU time in it
(QK^T is half the kernel's matmul FLOPs), halving QK^T time shortens the
pipeline; if the kernel is purely VPU-bound the added dequant multiply
(one VPU op/element) makes it WORSE.  Either way the result is a
measured number.

Accuracy: per-row int8 on rms-normed rows gives |ds| <~ 1% of |s|
(<= 0.16 in log2 units at the sqrt(d)*log2e = 16.3 bound); printed as
max|o - o_f32| alongside the bf16 baseline's own error.

Run: python tools/bench_attn_int8qk.py  (real chip)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/fairygen_jax"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fairygen_tpu.ops.flash_attention import flash_attention

LOG2E = 1.4426950408889634


def _int8qk_kernel(q_ref, k_ref, qs_ref, ks_ref, v_ref, o_ref, acc_ref,
                   l_ref, *, pad_correct):
    """Bounded-logits streaming kernel with int8 QK^T.

    Padded k rows carry scale 0 -> s = 0 exactly -> the same exact
    l -= pad correction as _fa_kernel_bounded applies.
    """
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]          # (bq, d) int8
    k = k_ref[0]          # (bk, d) int8
    s32 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    scale = qs_ref[0] * ks_ref[0].reshape(1, -1)  # (bq,1)*(1,bk)
    p = jnp.exp2(s32.astype(jnp.float32) * scale)
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


def _quant_rows(x):
    """(H, S, D) -> int8 rows + (H, S) f32 scales (amax/127 per row)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(amax / 127.0, 1e-12)
    xi = jnp.round(x.astype(jnp.float32) / s[..., None]).astype(jnp.int8)
    return xi, s


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention_int8qk(q, k, v, bq=2048, bk=512):
    """bsnd layout; bounded-logits path only (rms-normed q/k)."""
    b, sq, n, d = q.shape
    sk = k.shape[1]
    scale_val = float(d**-0.5) * LOG2E

    qh = _pad_to((q.astype(jnp.float32) * scale_val).astype(q.dtype)
                 .transpose(0, 2, 1, 3).reshape(b * n, sq, d), 1, bq)
    kh = _pad_to(k.transpose(0, 2, 1, 3).reshape(b * n, sk, d), 1, bk)
    vh = _pad_to(v.transpose(0, 2, 1, 3).reshape(b * n, sk, d), 1, bk)
    sq_p, sk_p = qh.shape[1], kh.shape[1]
    pad_correct = sk_p - sk

    qi, qs = _quant_rows(qh)
    ki, ks = _quant_rows(kh)
    qs, ks = qs[..., None], ks[..., None]  # (H, S, 1) for the block spec

    grid = (b * n, sq_p // bq, sk_p // bk)
    out = pl.pallas_call(
        functools.partial(_int8qk_kernel, pad_correct=pad_correct),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
            # scales carry a trailing unit dim: pallas requires the last
            # two block dims (bq, 1) to divide (8, =array) — (1, bq)
            # would put the row axis in the 128-lane slot
            pl.BlockSpec((1, bq, 1), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bk, 1), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * n, sq_p, d), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qi, ki, qs, ks, vh)
    return out[:, :sq].reshape(b, n, sq, d).transpose(0, 2, 1, 3)


def _time(fn, *args, n_iter=20):
    o = fn(*args)
    float(o.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = fn(*args)
    float(o.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / n_iter


def main():
    dtype = jnp.bfloat16
    b, n, hd = 1, 24, 128
    cases = (("self 480p", 8190, 8190), ("self 720p", 18480, 18480))
    if len(sys.argv) > 1:  # e.g. `480p` to run one case (slow tunnel compiles)
        cases = [c for c in cases if sys.argv[1] in c[0]]
    for name, sq, sk in cases:
        ksit = iter(jax.random.split(jax.random.key(0), 3))
        q = jax.random.normal(next(ksit), (b, sq, n, hd), dtype)
        k = jax.random.normal(next(ksit), (b, sk, n, hd), dtype)
        v = jax.random.normal(next(ksit), (b, sk, n, hd), dtype)
        q = q / jnp.sqrt(jnp.mean(q.astype(jnp.float32)**2, -1,
                                  keepdims=True)).astype(dtype)
        k = k / jnp.sqrt(jnp.mean(k.astype(jnp.float32)**2, -1,
                                  keepdims=True)).astype(dtype)
        flops = 4.0 * b * n * sq * sk * hd

        base = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, bounded_logits=True))
        dt = _time(base, q, k, v)
        print(f"{name}: bounded-bf16        {dt*1e3:7.2f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s", flush=True)

        i8 = jax.jit(flash_attention_int8qk)
        dt8 = _time(i8, q, k, v)
        print(f"{name}: int8-QK (w/ quant)  {dt8*1e3:7.2f} ms  "
              f"{flops/dt8/1e12:6.1f} TF/s", flush=True)

        # error vs f32 dense reference (sampled rows to bound memory)
        if sq <= 8192:
            o8 = np.asarray(i8(q, k, v), np.float32)
            ob = np.asarray(base(q, k, v), np.float32)
            qf = np.asarray(q, np.float32) * float(hd**-0.5)
            kf = np.asarray(k, np.float32)
            vf = np.asarray(v, np.float32)
            rows = slice(0, 256)
            s = np.einsum("bsnd,btnd->bnst", qf[:, rows], kf)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            of = np.einsum("bnst,btnd->bsnd", p, vf)
            e8 = np.abs(o8[:, rows] - of).max()
            eb = np.abs(ob[:, rows] - of).max()
            print(f"{name}: max|err| vs f32: bf16 {eb:.4f}  int8qk {e8:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
