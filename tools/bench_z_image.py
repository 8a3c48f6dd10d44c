"""Z-Image full-model single-chip benchmark — the ~6B Turbo DiT FITS in
one v5e's 16 GB at bf16, so this is a REAL measurement (not a reduced-
depth extrapolation): full 30-block + refiners step at 1024px
(4096 image tokens + padded caption), few-step Turbo image time.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_z_image.py
"""
import time

import jax
import jax.numpy as jnp

from fairygen_tpu.models.z_image.dit import (
    ZImageDiTConfig,
    init_z_image_dit_params,
    z_image_dit_forward,
)


def main():
    dtype = jnp.bfloat16
    cfg = ZImageDiTConfig()  # full: dim 3840, 30 layers + 2+2 refiners
    shapes = jax.eval_shape(
        lambda: init_z_image_dit_params(jax.random.key(0), cfg, dtype=dtype))
    params = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e9:.2f}B ({n_params*2/2**30:.1f} GiB bf16)")

    lat = jnp.zeros((1, 16, 128, 128), dtype)  # 1024px -> 4096 tokens
    cap = jnp.zeros((1, 250, cfg.cap_feat_dim), dtype)  # ~512-token prompt
    ts = jnp.asarray([0.6], jnp.float32)

    @jax.jit
    def step(p, x):
        return z_image_dit_forward(p, cfg, x, ts, cap)

    o = step(params, lat)
    float(o.astype(jnp.float32).sum())
    n_iter = 6
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = step(params, lat)
    float(o.astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / n_iter

    # FLOPs: 34 blocks-equivalent; per block qkv/out 8sd^2 + ffn
    # 3*s*d*ffn_dim*2 + attn 4s^2d on the unified seq (refiners on subsets)
    s_img, s_cap, d = 4096, 256, 3840
    ffn = int(d / 3 * 8)
    s = s_img + s_cap

    def block_fl(seq):
        return 8 * seq * d * d + 6 * seq * d * ffn + 4 * seq * seq * d

    fl = (30 * block_fl(s) + 2 * block_fl(s_img) + 2 * block_fl(s_cap))
    print(f"full Z-Image step (REAL, 4096+{s_cap} tokens): {dt*1e3:.0f} ms "
          f"(~{fl/1e12/dt:.0f} TF/s effective)")
    for steps in (8, 4):
        print(f"Z-Image-Turbo {steps}-step 1024px image: {dt*steps:.2f} s "
              f"denoise single-chip (+ VAE decode)")

    import os

    if os.environ.get("FAIRYGEN_BENCH_INT8"):
        from fairygen_tpu.ops.quant import quantize_image_dit_params

        # consume=True: bf16 (12.2 GiB) + int8 copies don't fit 16 GiB
        # together — donate each weight so the original frees as we go
        qparams = quantize_image_dit_params(params, consume=True)
        del params
        o = step(qparams, lat)
        float(o.astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(n_iter):
            o = step(qparams, lat)
        float(o.astype(jnp.float32).sum())
        dq = (time.perf_counter() - t0) / n_iter
        print(f"int8 W8A8 step (pipe.quantize()): {dq*1e3:.0f} ms "
              f"({dt/dq:.2f}x; ~{fl/1e12/dq:.0f} TF/s effective); "
              f"Turbo 4-step {dq*4:.2f} s")


if __name__ == "__main__":
    main()
