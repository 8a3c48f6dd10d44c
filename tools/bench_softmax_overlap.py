"""Attack the last exact-path attention gap: exp2 VPU time.

The bounded streaming kernel (ops/flash_attention.py:_fa_kernel_bounded)
measures 5.89 ms at the Wan 480p self-attn shapes vs a ~4.2 ms
matmul-only bound; the gap is the fp32 exp2 sweep over the (bq, bk)
logits tile serializing with the two MXU matmuls.  Variants measured
here on the real chip:

  base        current production kernel (bq=2048, bk=1024)
  split2/4    k-tile split into 2/4 column sub-tiles with all s-matmuls
              issued before the exp/pv chain — gives Mosaic's scheduler
              the chance to run sub-tile i's exp2 (VPU) under sub-tile
              i+1's s-matmul (MXU)
  interleave2 s0; p0=exp2(s0); s1 issued between p0 and pv0
  bf16exp     exp2 computed at bf16 lane width (accuracy impact printed;
              candidate only if the win is large)

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_softmax_overlap.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_base(q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref, *, pad):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(s)
    l_ref[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] += jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / (l_ref[:, :1] - jnp.float32(pad))
                    ).astype(o_ref.dtype).reshape(o_ref[0].shape)


def _kernel_split(q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref, *, pad,
                  nsplit, interleave=False):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    bk = k_ref.shape[1]
    c = bk // nsplit
    ks = [k_ref[0, i * c:(i + 1) * c, :] for i in range(nsplit)]
    vs = [v_ref[0, i * c:(i + 1) * c, :] for i in range(nsplit)]
    if interleave:
        # s0; p0; s1; pv0; p1; pv1 ... (MXU issue between VPU sweeps)
        ss = [jax.lax.dot_general(q, ks[0], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)]
        ps = []
        for i in range(nsplit):
            ps.append(jnp.exp2(ss[i]))
            if i + 1 < nsplit:
                ss.append(jax.lax.dot_general(
                    q, ks[i + 1], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
            l_ref[:, :1] += jnp.sum(ps[i], axis=-1, keepdims=True)
            acc_ref[:] += jax.lax.dot_general(
                ps[i].astype(v_ref.dtype), vs[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    else:
        ss = [jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for kk in ks]
        for i in range(nsplit):
            p = jnp.exp2(ss[i])
            l_ref[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
            acc_ref[:] += jax.lax.dot_general(
                p.astype(v_ref.dtype), vs[i], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / (l_ref[:, :1] - jnp.float32(pad))
                    ).astype(o_ref.dtype).reshape(o_ref[0].shape)


def _kernel_bf16exp(q_ref, k_ref, v_ref, o_ref, acc_ref, l_ref, *, pad):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(s.astype(jnp.bfloat16))
    l_ref[:, :1] += jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    acc_ref[:] += jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / (l_ref[:, :1] - jnp.float32(pad))
                    ).astype(o_ref.dtype).reshape(o_ref[0].shape)


def _call(kernel, qh, kh, vh, bq, bk, **kw):
    hn, sq_p, d = qh.shape
    sk_p = kh.shape[1]
    return pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(hn, sq_p // bq, sk_p // bk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((hn, sq_p, d), qh.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32),
                        pltpu.VMEM((bq, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(qh, kh, vh)


def _time(fn, *args, n_iter=10):
    o = fn(*args)
    float(o.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = fn(*args)
    float(o.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / n_iter, o


def main():
    b, n, d = 1, 24, 128
    sq = 8190
    sq_p = 8192
    pad = sq_p - sq
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    scale = (d ** -0.5) * 1.4426950408889634
    # head-major, prescaled, rms-normed-magnitude q/k (bounded regime)
    qh = (jax.random.normal(kq, (b * n, sq_p, d), jnp.bfloat16) * scale)
    kh = jax.random.normal(kk, (b * n, sq_p, d), jnp.bfloat16)
    vh = jax.random.normal(kv, (b * n, sq_p, d), jnp.bfloat16)
    qh = qh.at[:, sq:].set(0)
    kh = kh.at[:, sq:].set(0)
    vh = vh.at[:, sq:].set(0)

    flops = 4 * n * sq * sq * d
    bq, bk = 2048, 1024

    variants = [
        ("base", lambda q_, k_, v_: _call(_kernel_base, q_, k_, v_, bq, bk,
                                          pad=pad)),
        ("split2", lambda q_, k_, v_: _call(_kernel_split, q_, k_, v_, bq, bk,
                                            pad=pad, nsplit=2)),
        ("split4", lambda q_, k_, v_: _call(_kernel_split, q_, k_, v_, bq, bk,
                                            pad=pad, nsplit=4)),
        ("interleave2", lambda q_, k_, v_: _call(
            _kernel_split, q_, k_, v_, bq, bk, pad=pad, nsplit=2,
            interleave=True)),
        ("interleave4", lambda q_, k_, v_: _call(
            _kernel_split, q_, k_, v_, bq, bk, pad=pad, nsplit=4,
            interleave=True)),
        ("bf16exp", lambda q_, k_, v_: _call(_kernel_bf16exp, q_, k_, v_,
                                             bq, bk, pad=pad)),
    ]

    ref = None
    for name, fn in variants:
        jf = jax.jit(fn)
        try:
            dt, o = _time(jf, qh, kh, vh)
        except Exception as e:
            print(f"{name:12s}: FAIL {type(e).__name__}: {e}")
            continue
        of = o.astype(jnp.float32)
        if ref is None:
            ref = of
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(of - ref)))
        print(f"{name:12s}: {dt*1e3:7.3f} ms ({flops/dt/1e12:6.1f} TF/s) "
              f"maxdiff={err:.4g}")


if __name__ == "__main__":
    main()
