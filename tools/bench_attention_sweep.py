"""Flash-attention tile-size sweep at the flagship Wan 480p shapes.

Self-attn: S=8190, 24 heads x 128; cross-attn: S=8190 q / 512 kv.
Sweeps (bq, bk) for the bounded kernel and bq for the single-pass
small-KV kernel, on the real chip. Results feed the defaults in
ops/flash_attention.py (docs/NOTES.md round-3 perf log).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_attention_sweep.py
"""
import time

import jax
import jax.numpy as jnp

from fairygen_tpu.ops.flash_attention import _flash_fwd_impl


def _time(fn, *args, n_iter=10):
    o = fn(*args)
    float(o.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = fn(*args)
    float(o.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / n_iter


def main():
    key = jax.random.key(0)
    b, n, d = 1, 24, 128
    sq, sk_cross = 8190, 512
    kq, kk, kv, kc = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, sq, n, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, sq, n, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, sq, n, d), jnp.bfloat16)
    kx = jax.random.normal(kc, (b, sk_cross, n, d), jnp.bfloat16)
    vx = jax.random.normal(kc, (b, sk_cross, n, d), jnp.bfloat16)

    self_flops = 4 * n * sq * sq * d
    cross_flops = 4 * n * sq * sk_cross * d

    print("== self-attn (bounded) sweep ==")
    for bq, bk in [(1024, 1024), (2048, 512), (2048, 1024), (2048, 2048),
                   (4096, 512), (4096, 1024)]:
        fn = jax.jit(lambda q_, k_, v_, bq=bq, bk=bk: _flash_fwd_impl(
            q_, k_, v_, bounded_logits=True, bq=bq, bk=bk))
        try:
            dt = _time(fn, q, k, v)
            print(f"  bq={bq:5d} bk={bk:5d}: {dt*1e3:7.3f} ms "
                  f"({self_flops/dt/1e12:6.1f} TF/s)")
        except Exception as e:  # VMEM OOM etc.
            print(f"  bq={bq:5d} bk={bk:5d}: FAIL {type(e).__name__}")

    print("== cross-attn (small-KV, bounded) sweep ==")
    for bq in [512, 1024, 2048, 4096, 8192]:
        fn = jax.jit(lambda q_, k_, v_, bq=bq: _flash_fwd_impl(
            q_, k_, v_, bounded_logits=True, bq=bq))
        try:
            dt = _time(fn, q, kx, vx)
            print(f"  bq={bq:5d}: {dt*1e3:7.3f} ms "
                  f"({cross_flops/dt/1e12:6.1f} TF/s)")
        except Exception as e:
            print(f"  bq={bq:5d}: FAIL {type(e).__name__}")


if __name__ == "__main__":
    main()
