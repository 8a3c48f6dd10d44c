"""Qwen-Image single-chip benchmark on the attached TPU.

Qwen-Image is 20B params (60 blocks at dim 3072) — beyond one v5e's
16 GB in bf16 — so full-size blocks are measured at reduced depth and
the 60-block step time is extrapolated (compute per block is exact:
4096 image + 512 text tokens at 1328px-equivalent).  The full model fits
with FSDP/TP on >= 4 chips.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_qwen.py
"""
import time

import jax
import jax.numpy as jnp

from fairygen_tpu.models.qwen.dit import (
    QwenImageDiTConfig,
    init_qwen_image_dit_params,
    qwen_image_dit_forward,
)

DEPTHS = (4, 8)
FULL = 60


def time_step(num_layers, n_iter=8):
    dtype = jnp.bfloat16
    cfg = QwenImageDiTConfig(num_layers=num_layers)
    shapes = jax.eval_shape(
        lambda: init_qwen_image_dit_params(jax.random.key(0), cfg,
                                           dtype=dtype))
    params = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
    lat = jnp.zeros((1, 16, 128, 128), dtype)  # 4096 tokens
    ts = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.zeros((1, 512, cfg.txt_dim), dtype)

    @jax.jit
    def step(p, x):
        return qwen_image_dit_forward(p, cfg, x, ts, ctx)

    o = step(params, lat)
    float(o.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = step(params, lat)
    float(o.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / n_iter


def time_step_int8_full(n_iter=8):
    """FULL 60-block Qwen-Image in int8 W8A8 — ~19 GiB: does NOT fit a
    16 GB v5e (corrected 2026-08-18; an earlier ~10.4 GB estimate here
    was wrong — the DiT has ~19.2B quantizable params).  Kept as a probe
    for >=24 GB chips (v6e/v5p) or TP halves; on a v5e this OOMs at
    tree creation.

    Builds the quantized zero-param tree directly on device (shape-driven
    mirror of ops.quant.quantize_image_dit_params with the _FIT_SKIP list:
    every block dense incl. the modulation linears -> w_int8 + w_scale;
    embedders/norms/head stay bf16).  Zero weights time identically to
    real ones; the real loading path is from_pretrained(quantize=...)."""
    from fairygen_tpu.ops.quant import _FIT_SKIP

    dtype = jnp.bfloat16
    cfg = QwenImageDiTConfig(num_layers=FULL)
    shapes = jax.eval_shape(
        lambda: init_qwen_image_dit_params(jax.random.key(0), cfg,
                                           dtype=dtype))

    def build(node, inside_blocks):
        if isinstance(node, dict):
            if inside_blocks and "w" in node and node["w"].ndim in (2, 3) \
                    and min(node["w"].shape[-2:]) >= 512:
                out = {"w_int8": jnp.zeros(node["w"].shape, jnp.int8),
                       "w_scale": jnp.full(node["w"].shape[:-2]
                                           + node["w"].shape[-1:], 1e-6,
                                           jnp.float32)}
                if "b" in node:
                    out["b"] = jnp.zeros(node["b"].shape, node["b"].dtype)
                return out
            return {k: (jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v)
                        if any(sub in k for sub in _FIT_SKIP)
                        else build(v, inside_blocks or k == "blocks"))
                    for k, v in node.items()}
        return jnp.zeros(node.shape, node.dtype)

    params = jax.jit(lambda: build(shapes, False))()
    nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    print(f"int8 tree: {nbytes/2**30:.1f} GiB on one chip")

    lat = jnp.zeros((1, 16, 128, 128), dtype)
    ts = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.zeros((1, 512, cfg.txt_dim), dtype)

    @jax.jit
    def step(p, x):
        return qwen_image_dit_forward(p, cfg, x, ts, ctx)

    o = step(params, lat)
    float(o.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = step(params, lat)
    float(o.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / n_iter


def main():
    t1 = time_step(DEPTHS[0])
    t2 = time_step(DEPTHS[1])
    per_block = (t2 - t1) / (DEPTHS[1] - DEPTHS[0])
    overhead = t1 - DEPTHS[0] * per_block
    t_full = overhead + FULL * per_block

    # FLOPs/block at s = 4608, d = 3072: separate q/k/v + out per stream
    # (8sd^2) + two 4x FFNs (16sd^2) + attn 4s^2d
    s, d = 4096 + 512, 3072
    fl_block = 24 * s * d * d + 4 * s * s * d
    tf = FULL * fl_block / 1e12

    print(f"per block: {per_block*1e3:.2f} ms, overhead {overhead*1e3:.1f} ms")
    print(f"EXTRAPOLATED full Qwen-Image (60 blocks) 1024px-class step: "
          f"{t_full*1e3:.0f} ms (~{tf/t_full:.0f} TF/s effective; 30-step "
          f"image ~{t_full*30:.1f} s single-chip IF it fit — 20B bf16 "
          f"needs >=4 chips via FSDP/TP)")

    import os

    if os.environ.get("FAIRYGEN_BENCH_INT8"):
        ti = time_step_int8_full()
        print(f"int8 W8A8 FULL 60-block step: {ti*1e3:.0f} ms "
              f"(~{tf/ti:.0f} TF/s eff.; 30-step image {ti*30:.1f} s — "
              f"needs a >=24 GB chip or TP; ~19 GiB int8 tree)")


if __name__ == "__main__":
    main()
