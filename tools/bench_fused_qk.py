"""A/B the fused q/k prep path (ops/fused_qk) at flagship shapes.

Times the 30-block scan at Wan2.2-TI2V-5B 480p/81f shapes (8190 tokens)
three ways:
  legacy   — rms_norm -> rope_apply -> flash (freqs_full=None)
  fused    — fused prep kernel + head-major flash
  fused+no — fused prep + natural-layout output stores

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_fused_qk.py
"""
import time

import jax
import jax.numpy as jnp

import fairygen_tpu.ops.fused_qk as fq
from fairygen_tpu.models.wan.dit import (
    WanDiTConfig, blocks_forward, init_dit_params,
)
from fairygen_tpu.ops.rope import build_freqs_grid, precompute_freqs_3d


def _time(fn, *args, n_iter=10):
    o = fn(*args)
    jax.tree.map(lambda t: float(t.astype(jnp.float32).sum()), o)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = fn(*args)
    jax.tree.map(lambda t: float(t.astype(jnp.float32).sum()), o)
    return (time.perf_counter() - t0) / n_iter


def main():
    dtype = jnp.bfloat16
    cfg = WanDiTConfig.ti2v_5b()
    shapes = jax.eval_shape(
        lambda: init_dit_params(jax.random.key(0), cfg, dtype=dtype))
    params = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    s = 21 * 15 * 26  # 8190 tokens
    x = jnp.zeros((1, s, cfg.dim), dtype)
    ctx_e = jnp.zeros((1, 512, cfg.dim), dtype)
    t_mod = jnp.zeros((1, 2, 6, cfg.dim), dtype)
    freqs = build_freqs_grid(precompute_freqs_3d(cfg.head_dim), 21, 15, 26)
    ff = fq.build_freqs_full(freqs)
    seg = 15 * 26

    legacy = jax.jit(lambda p, xx: blocks_forward(
        p["blocks"], xx, ctx_e, t_mod, freqs, cfg, seg=seg))
    dt = _time(legacy, params, x)
    print(f"legacy 30-block scan: {dt*1e3:8.2f} ms ({dt/30*1e3:6.3f} ms/block)")

    fused = jax.jit(lambda p, xx: blocks_forward(
        p["blocks"], xx, ctx_e, t_mod, freqs, cfg, seg=seg, freqs_full=ff))
    dt_f = _time(fused, params, x)
    print(f"fused  30-block scan: {dt_f*1e3:8.2f} ms ({dt_f/30*1e3:6.3f} ms/block)")

    fq._NATURAL_OUT = True
    fused_no = jax.jit(lambda p, xx: blocks_forward(
        p["blocks"], xx, ctx_e, t_mod, freqs, cfg, seg=seg, freqs_full=ff))
    dt_n = _time(fused_no, params, x)
    print(f"fused+natural_out:    {dt_n*1e3:8.2f} ms ({dt_n/30*1e3:6.3f} ms/block)")
    fq._NATURAL_OUT = False

    # numeric sanity on-chip: fused vs legacy on random data
    key = jax.random.key(1)
    xr = jax.random.normal(key, x.shape, dtype)
    a = legacy(params, xr)
    b = fused(params, xr)
    diff = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    print(f"max |legacy - fused| on random x (zero params): {diff:.3e}")


if __name__ == "__main__":
    main()
