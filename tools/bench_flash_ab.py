"""A/B our Pallas flash attention vs the official JAX pallas TPU kernel
(jax.experimental.pallas.ops.tpu.flash_attention) and XLA dense softmax
attention at the flagship Wan self/cross-attention shapes.

Goal: find headroom in the ~53%-MFU self-attention (104 TF/s measured
standalone round 2; bounded kernel ~125 TF/s in-block).  The official
kernel has different pipelining/tile heuristics — if it wins, route
through it.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_flash_ab.py
"""
import time

import jax
import jax.numpy as jnp

from fairygen_tpu.ops.flash_attention import flash_attention


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
    for name, sq, sk in (("self 480p", 8190, 8190),
                         ("cross 480p", 8190, 512),
                         ("self 720p", 18480, 18480)):
        ks = iter(jax.random.split(jax.random.key(0), 3))
        # bsnd layout (ours); official kernel wants bnsd
        q = jax.random.normal(next(ks), (b, sq, n, hd), dtype)
        k = jax.random.normal(next(ks), (b, sk, n, hd), dtype)
        v = jax.random.normal(next(ks), (b, sk, n, hd), dtype)
        # rms-normed q/k bound: emulate by normalizing rows
        q = q / jnp.sqrt(jnp.mean(q.astype(jnp.float32)**2, -1,
                                  keepdims=True)).astype(dtype)
        k = k / jnp.sqrt(jnp.mean(k.astype(jnp.float32)**2, -1,
                                  keepdims=True)).astype(dtype)
        flops = 4.0 * b * n * sq * sk * hd

        ours = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, bounded_logits=True))
        dt = _time(ours, q, k, v)
        print(f"{name}: ours(bounded)      {dt*1e3:7.2f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s")

        ours_u = jax.jit(lambda q, k, v: flash_attention(q, k, v))
        dt = _time(ours_u, q, k, v)
        print(f"{name}: ours(max-tracking) {dt*1e3:7.2f} ms  "
              f"{flops/dt/1e12:6.1f} TF/s")

        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, flash_attention as official)

            # the official kernel requires seq % block == 0: pad with zero
            # rows (changes the result — padded keys attend — but this is
            # a TIMING comparison at the padded size our kernel also pays)
            def padto(x, m):
                pad = (-x.shape[1]) % m
                return jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))

            qn = padto(q, 2048).transpose(0, 2, 1, 3)
            kn = padto(k, 2048).transpose(0, 2, 1, 3)
            vn = padto(v, 2048).transpose(0, 2, 1, 3)
            for bq, bkv in ((2048, 1024), (1024, 1024), (512, 1024),
                            (2048, 2048)):
                try:
                    bs = BlockSizes(
                        block_q=min(bq, sq), block_k_major=min(bkv, sk),
                        block_k=min(bkv, sk), block_b=1,
                        block_q_major_dkv=min(bq, sq),
                        block_k_major_dkv=min(bkv, sk),
                        block_k_dkv=min(bkv, sk),
                        block_q_dkv=min(bq, sq),
                        block_k_major_dq=min(bkv, sk),
                        block_k_dq=min(bkv, sk),
                        block_q_dq=min(bq, sq),
                    )
                    off = jax.jit(lambda q, k, v: official(
                        q, k, v, sm_scale=hd**-0.5, block_sizes=bs))
                    dt = _time(off, qn, kn, vn)
                    print(f"{name}: official bq={bq} bk={bkv}"
                          f"   {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TF/s")
                except Exception as e:
                    print(f"{name}: official bq={bq} bk={bkv} FAILED: "
                          f"{str(e)[:80]}")
        except ImportError:
            print("official kernel unavailable")

        if sk <= 512:
            # XLA dense path for small KV
            def dense(q, k, v):
                s = jnp.einsum("bsnd,bknd->bnsk", q, k) * (hd**-0.5)
                p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
                return jnp.einsum("bnsk,bknd->bsnd", p.astype(q.dtype), v)

            dt = _time(jax.jit(dense), q, k, v)
            print(f"{name}: XLA dense          {dt*1e3:7.2f} ms  "
                  f"{flops/dt/1e12:6.1f} TF/s")
        print()


if __name__ == "__main__":
    main()
