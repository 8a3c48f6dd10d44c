"""A/B lax.scan unroll over the 30 Wan DiT blocks at flagship shapes.

Hypothesis: with unroll=1 XLA serializes layer-i compute behind the
layer-i weight DMA (~19 MB/block streamed from HBM); unrolling lets the
scheduler prefetch layer i+1 weights during layer i compute.  If a win
shows, blocks_forward grows an `unroll` knob.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_scan_unroll.py
"""
import time

import jax
import jax.numpy as jnp

from fairygen_tpu.models.wan.dit import (
    WanDiTConfig, dit_block, init_dit_params,
)
from fairygen_tpu.ops.rope import build_freqs_grid, precompute_freqs_3d


def _time(fn, *args, n_iter=10):
    o = fn(*args)
    float(o.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = fn(*args)
    float(o.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / n_iter


def main():
    dtype = jnp.bfloat16
    cfg = WanDiTConfig.ti2v_5b()
    shapes = jax.eval_shape(
        lambda: init_dit_params(jax.random.key(0), cfg, dtype=dtype))
    params = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    s = 21 * 15 * 26
    x = jnp.zeros((1, s, cfg.dim), dtype)
    ctx = jnp.zeros((1, 512, cfg.dim), dtype)
    t_mod = jnp.zeros((1, 2, 6, cfg.dim), dtype)
    freqs = build_freqs_grid(precompute_freqs_3d(cfg.head_dim), 21, 15, 26)
    seg = 15 * 26

    def scan_with(unroll):
        def body(carry, p):
            return dit_block(p, carry, ctx, t_mod, freqs, cfg, seg=seg), None

        def run(blocks, xx):
            out, _ = jax.lax.scan(body, xx, blocks, unroll=unroll)
            return out

        return jax.jit(run)

    for unroll in (1, 2, 3, 5):
        dt = _time(scan_with(unroll), params["blocks"], x)
        print(f"unroll={unroll}:  {dt*1e3:8.2f} ms total  "
              f"({dt/30*1e3:6.2f} ms/block)")


if __name__ == "__main__":
    main()
