"""Decompose one flagship Wan TI2V-5B denoise sweep (480p/81f) on chip.

Times, as separate jits:
  full      — wan_dit_forward (what the bench's step runs, x2 per step)
  blocks    — the 30-block scan alone at the same (S, D)
  one_block — a single dit_block (x30 = ideal scan time)
Differences localize the non-block overhead (patchify/embeddings/head).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_denoise_profile.py
"""
import time

import jax
import jax.numpy as jnp

from fairygen_tpu.models.wan.dit import (
    WanDiTConfig, blocks_forward, dit_block, init_dit_params,
    wan_dit_forward,
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

    lat = jnp.zeros((1, 48, 21, 30, 52), dtype)
    ctx = jnp.zeros((1, 512, 4096), dtype)
    t1 = jnp.zeros((1,), jnp.float32)

    full = jax.jit(lambda p, x: wan_dit_forward(
        p, cfg, x, t1, ctx, fuse_vae_embedding_in_latents=True))
    dt_full = _time(full, params, lat)
    print(f"full sweep:          {dt_full*1e3:8.2f} ms")

    s = 21 * 15 * 26  # 8190 tokens
    x = jnp.zeros((1, s, cfg.dim), dtype)
    ctx_e = jnp.zeros((1, 512, cfg.dim), dtype)
    t_mod = jnp.zeros((1, 2, 6, cfg.dim), dtype)
    freqs = build_freqs_grid(precompute_freqs_3d(cfg.head_dim), 21, 15, 26)
    seg = 15 * 26

    blocks = jax.jit(lambda p, xx: blocks_forward(
        p["blocks"], xx, ctx_e, t_mod, freqs, cfg, seg=seg))
    dt_blocks = _time(blocks, params, x)
    print(f"30-block scan:       {dt_blocks*1e3:8.2f} ms"
          f"  ({dt_blocks/30*1e3:6.2f} ms/block)")

    blk = jax.tree.map(lambda a: a[0], params["blocks"])
    one = jax.jit(lambda p, xx: dit_block(
        p, xx, ctx_e, t_mod, freqs, cfg, seg=seg))
    dt_one = _time(one, blk, x)
    print(f"single block:        {dt_one*1e3:8.2f} ms  (x30 ="
          f" {dt_one*30*1e3:7.2f} ms)")

    print(f"non-block overhead:  {(dt_full-dt_blocks)*1e3:8.2f} ms"
          f"  (patchify+t-embed+text-embed+head)")


if __name__ == "__main__":
    main()
