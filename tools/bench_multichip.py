"""Multi-chip (Ulysses) Wan2.2-5B benchmark — drives the PIPELINE.

Shards the DiT token axis over the mesh's seq axis and measures the full
denoise through ``WanVideoPipeline.__call__`` (not a raw forward), so the
number includes the production dispatch path: chunked jitted fori_loop,
CFG, scheduler, first-frame re-pinning.  On a single-chip/CPU sandbox this
still compiles and runs at a reduced shape (validating the collective
program); timing is only meaningful on real multi-chip hardware.

  python tools/bench_multichip.py [--height 704 --width 1280 --frames 81]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the sandbox's sitecustomize pins the TPU backend at interpreter start;
# honor an explicit JAX_PLATFORMS=cpu (virtual multi-device validation)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

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
    p.add_argument("--cfg-merge", action="store_true",
                   help="batched CFG (enables data-axis sharding of posi/nega)")
    p.add_argument("--sp-strategy", type=str, default="ulysses",
                   choices=["ulysses", "ring"],
                   help="sequence-parallel schedule (ring = nearest-neighbor "
                        "ppermute rotation, parallel/ring.py)")
    args = p.parse_args()

    from fairygen_tpu.core.meshes import make_mesh
    from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline

    n_dev = jax.device_count()
    seq = n_dev if args.seq == -1 else args.seq
    mesh = make_mesh(data=1, seq=seq, devices=jax.devices()[:seq])
    print(f"devices={n_dev} mesh seq={seq} sp={args.sp_strategy}",
          file=sys.stderr)

    cfg = WanDiTConfig.ti2v_5b()
    if jax.devices()[0].platform == "cpu":
        cfg = WanDiTConfig.tiny(num_heads=8, dim=96, in_dim=48, out_dim=48)
        args.height, args.width, args.frames, args.steps = 64, 128, 9, 4

    dtype = jnp.bfloat16
    shapes = jax.eval_shape(lambda: init_dit_params(jax.random.key(0), cfg, dtype=dtype))
    params = jax.jit(lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    pipe = WanVideoPipeline(dit_params=params, dit_cfg=cfg, dtype=dtype)
    pipe.use_mesh(mesh, sp_strategy=args.sp_strategy)

    ctx = jnp.zeros((1, 512, cfg.text_dim), dtype)
    nctx = jnp.zeros_like(ctx)
    call = dict(
        context=ctx, negative_context=nctx, seed=0,
        height=args.height, width=args.width, num_frames=args.frames,
        cfg_scale=5.0, cfg_merge=args.cfg_merge,
        num_inference_steps=args.steps,
    )

    # warm (compile) with a 2-step run, then measure the full sweep
    out = pipe(**{**call, "num_inference_steps": 2})
    float(out.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    out = pipe(**call)
    float(out.astype(jnp.float32).sum())
    total = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"wan22_5b_{args.height}x{args.width}_{args.frames}f_pipeline_denoise_seconds",
        "value": round(total, 2),
        "unit": "s",
        "devices": n_dev,
        "seq_parallel": seq,
        "cfg_merge": args.cfg_merge,
        "per_step_s": round(total / args.steps, 3),
    }))


if __name__ == "__main__":
    main()
