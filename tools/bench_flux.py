"""FLUX.1 single-chip benchmark on the attached TPU.

FLUX.1-dev is 12B params — 24 GB bf16, beyond one v5e's 16 GB HBM — so
full-size blocks are measured at REDUCED DEPTH (the compute per block is
exact: dim 3072, 24 heads, 4096 image + 512 text tokens at 1024px) and
the full-depth step time is extrapolated as
19/D_double + 38/D_single block times + embed/head.  The full model
fits with FSDP/tensor sharding on >= 2 chips (parallel/).

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_flux.py
"""
import time

import jax
import jax.numpy as jnp

from fairygen_tpu.models.flux.dit import (
    FluxDiTConfig,
    flux_dit_forward,
    init_flux_dit_params,
)

D_DOUBLE, D_SINGLE = 4, 4  # measured depths
FULL_DOUBLE, FULL_SINGLE = 19, 38


def zeros_params(cfg, dtype):
    shapes = jax.eval_shape(
        lambda: init_flux_dit_params(jax.random.key(0), cfg, dtype=dtype))
    return jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()


def time_step(cfg, n_iter=8):
    dtype = jnp.bfloat16
    params = zeros_params(cfg, dtype)
    lat = jnp.zeros((1, 16, 128, 128), dtype)  # 1024px -> 4096 tokens
    ts = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.zeros((1, 512, cfg.context_dim), dtype)
    pooled = jnp.zeros((1, cfg.pooled_dim), dtype)
    guid = jnp.asarray([3.5], jnp.float32)

    @jax.jit
    def step(p, x):
        return flux_dit_forward(p, cfg, x, ts, ctx, pooled, guid)

    o = step(params, lat)
    float(o.astype(jnp.float32).sum())  # force sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = step(params, lat)
    float(o.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / n_iter


def main():
    base = dict(num_double_blocks=D_DOUBLE, num_single_blocks=D_SINGLE)
    cfg = FluxDiTConfig(**base)
    t_red = time_step(cfg)
    # isolate per-family block cost with a second depth point
    cfg2 = FluxDiTConfig(num_double_blocks=2 * D_DOUBLE,
                         num_single_blocks=D_SINGLE)
    t_red2 = time_step(cfg2)
    per_double = (t_red2 - t_red) / D_DOUBLE
    cfg3 = FluxDiTConfig(num_double_blocks=D_DOUBLE,
                         num_single_blocks=2 * D_SINGLE)
    t_red3 = time_step(cfg3)
    per_single = (t_red3 - t_red) / D_SINGLE
    overhead = t_red - D_DOUBLE * per_double - D_SINGLE * per_single
    t_full = overhead + FULL_DOUBLE * per_double + FULL_SINGLE * per_single

    # FLOPs per block at (4096+512) tokens, dim 3072: qkv 6sd^2 + out 2sd^2
    # + ffn 16sd^2 + attn 4s^2d (double); 14+10 sd^2 + 4s^2d (single) —
    # both reduce to 24sd^2 + 4s^2d
    s, d = 4096 + 512, 3072
    fl_double = 24 * s * d * d + 4 * s * s * d
    fl_single = 24 * s * d * d + 4 * s * s * d
    tf = (FULL_DOUBLE * fl_double + FULL_SINGLE * fl_single) / 1e12

    print(f"reduced ({D_DOUBLE}+{D_SINGLE} blocks) step: {t_red*1e3:.1f} ms")
    print(f"per double block: {per_double*1e3:.2f} ms, "
          f"per single block: {per_single*1e3:.2f} ms, "
          f"embed/head overhead: {overhead*1e3:.2f} ms")
    print(f"EXTRAPOLATED full FLUX.1 (19+38 blocks) 1024px step: "
          f"{t_full*1e3:.0f} ms  (~{tf/t_full:.0f} TF/s effective; "
          f"30-step image ~{t_full*30:.1f} s single-chip IF it fit — "
          f"12B bf16 needs >=2 chips via FSDP/TP)")


if __name__ == "__main__":
    main()
