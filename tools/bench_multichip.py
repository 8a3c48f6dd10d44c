"""Multi-chip (Ulysses) Wan2.2-5B benchmark — run on a real TPU slice.

Shards the DiT token axis over all available devices and measures the
720p 81-frame denoise sweep. On a single-chip/CPU sandbox this still
compiles and runs at a reduced shape (validating the collective program);
timing is only meaningful on real multi-chip hardware.

  python tools/bench_multichip.py [--height 704 --width 1280 --frames 81]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=704)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--frames", type=int, default=81)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seq", type=int, default=-1,
                   help="Ulysses axis size (-1 = all devices)")
    args = p.parse_args()

    from fairygen_tpu.core.meshes import make_mesh
    from fairygen_tpu.models.wan.dit import (
        WanDiTConfig, init_dit_params, wan_dit_forward,
    )

    n_dev = jax.device_count()
    seq = n_dev if args.seq == -1 else args.seq
    mesh = make_mesh(data=1, seq=seq, devices=jax.devices()[: seq])
    print(f"devices={n_dev} mesh seq={seq}", file=sys.stderr)

    cfg = WanDiTConfig.ti2v_5b()
    if jax.devices()[0].platform == "cpu":
        cfg = WanDiTConfig.tiny(num_heads=8, dim=96, in_dim=48, out_dim=48)
        args.height, args.width, args.frames, args.steps = 64, 128, 9, 4

    dtype = jnp.bfloat16
    shapes = jax.eval_shape(lambda: init_dit_params(jax.random.key(0), cfg, dtype=dtype))
    params = jax.jit(lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    lat = jnp.zeros(
        (1, cfg.in_dim, (args.frames - 1) // 4 + 1, args.height // 16, args.width // 16),
        dtype,
    )
    ctx = jnp.zeros((1, 512, cfg.text_dim), dtype)
    nctx = jnp.zeros_like(ctx)

    def cfg_step(params, lat, t):
        posi = wan_dit_forward(params, cfg, lat, t, ctx,
                               fuse_vae_embedding_in_latents=True, mesh=mesh)
        nega = wan_dit_forward(params, cfg, lat, t, nctx,
                               fuse_vae_embedding_in_latents=True, mesh=mesh)
        v = nega + 5.0 * (posi - nega)
        return lat + 0.02 * v.astype(lat.dtype)

    with mesh:
        f = jax.jit(cfg_step)
        t = jnp.asarray([500.0], jnp.float32)
        o = f(params, lat, t)
        float(o.astype(jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(3):
            o = f(params, o, t)
        float(o.astype(jnp.float32).sum())
        dt = (time.perf_counter() - t0) / 3

    total = dt * args.steps
    print(json.dumps({
        "metric": f"wan22_5b_{args.height}x{args.width}_{args.frames}f_denoise_seconds",
        "value": round(total, 2),
        "unit": "s",
        "devices": n_dev,
        "seq_parallel": seq,
        "per_step_s": round(dt, 3),
    }))


if __name__ == "__main__":
    main()
