"""On-chip A/B: plain W8A8 vs the outlier-robust path (VERDICT r4 #1).

The robust path adds, per quantized dense: one fused elementwise
multiply (SmoothQuant migration), one (N, k) gather + row-mask multiply,
and one thin (k x out) bf16 matmul (outlier fallback).  The quality case
is gated in tests/test_quant_outlier.py at tiny scale; THIS measures the
speed cost at flagship scale (Wan TI2V-5B, 480p token grid) — the
VERDICT bar is <=5% over plain W8A8.

Weight/calibration values don't affect timing, so params are zero-init
and act_amax random (top-k indices land arbitrarily, same gather cost).

  python tools/bench_int8_robust.py [--steps 10] [--outlier_k 8]
"""
import argparse
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/fairygen_jax"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--outlier_k", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=5)
    args = ap.parse_args()

    from fairygen_tpu.models.wan.dit import (
        WanDiTConfig, init_dit_params, precompute_cross_kv, wan_dit_forward,
    )
    from fairygen_tpu.ops.quant import quantize_wan_dit_linears

    dtype = jnp.bfloat16
    cfg = WanDiTConfig.ti2v_5b()
    lat_shape = (1, 48, 21, 30, 52)
    ctx = jnp.zeros((1, 512, 4096), dtype)

    shapes = jax.eval_shape(
        lambda: init_dit_params(jax.random.key(0), cfg, dtype=dtype))
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    groups = ("ffn", "self_attn", "cross_attn")
    rng = np.random.default_rng(0)

    def synth_amax(g, name, w):
        K = w.shape[-2]
        return jnp.asarray(
            rng.uniform(0.5, 2.0, size=(cfg.num_layers, K)).astype(
                np.float32))

    amax = {}
    for g in groups:
        amax[g] = {}
        for name, layer in params["blocks"][g].items():
            if isinstance(layer, dict) and "w" in layer:
                amax[g][name] = synth_amax(g, name, layer["w"])

    import functools

    kv_fn = jax.jit(lambda p, c: precompute_cross_kv(p, cfg, c))

    def bench(qparams, label):
        kv = kv_fn(qparams, ctx)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def chunk(p, lat, start):
            def step(i, x):
                t = jnp.full((1,), 500.0, jnp.float32)
                v = wan_dit_forward(p, cfg, x, t, ctx,
                                    fuse_vae_embedding_in_latents=True,
                                    cross_kv=kv)
                return x + 0.01 * v.astype(x.dtype)

            return jax.lax.fori_loop(start, start + args.chunk, step, lat)

        lat = jnp.zeros(lat_shape, dtype)
        float(chunk(qparams, lat, jnp.int32(0)).sum())  # compile
        t0 = time.perf_counter()
        lat = jnp.zeros(lat_shape, dtype)
        for s in range(0, args.steps, args.chunk):
            lat = chunk(qparams, lat, jnp.int32(s))
        float(lat.sum())
        dt = time.perf_counter() - t0
        per = dt / args.steps
        print(f"{label}: {dt:.3f}s total, {per * 1e3:.1f} ms/sweep")
        return per

    plain = quantize_wan_dit_linears(params, groups)
    t_plain = bench(plain, "plain int8")
    del plain
    smooth = quantize_wan_dit_linears(params, groups, act_amax=amax,
                                      outlier_k=0)
    t_smooth = bench(smooth, "smooth-only (alpha=0.5, k=0)")
    del smooth
    fc2_only = quantize_wan_dit_linears(
        params, groups, act_amax=amax,
        outlier_k={"ffn": {"fc2": args.outlier_k}})
    t_fc2 = bench(fc2_only, f"smooth + fc2-only fallback (k="
                            f"{args.outlier_k})")
    del fc2_only
    # deployment recommendation: smooth WHERE outliers live (the ffn —
    # attention dense inputs are post-LN, measured crest ~6 on trained
    # weights) + fallback at the measured worst site (fc2 input)
    selective = quantize_wan_dit_linears(
        params, groups, act_amax={"ffn": amax["ffn"]},
        outlier_k={"ffn": {"fc2": args.outlier_k}})
    t_sel = bench(selective, f"ffn-smooth + fc2 fallback (k="
                             f"{args.outlier_k})")
    del selective
    ffn_only = quantize_wan_dit_linears(
        params, groups, act_amax=amax,
        outlier_k={"ffn": args.outlier_k})
    t_ffn = bench(ffn_only, f"smooth + ffn-only fallback (k="
                            f"{args.outlier_k})")
    del ffn_only
    robust = quantize_wan_dit_linears(params, groups, act_amax=amax,
                                      outlier_k=args.outlier_k)
    t_robust = bench(robust, f"smooth + fallback everywhere "
                             f"(k={args.outlier_k})")
    for label, t in (("smooth-only", t_smooth),
                     ("fc2-only fallback", t_fc2),
                     ("ffn-smooth + fc2 fallback (DEPLOY)", t_sel),
                     ("ffn-only fallback", t_ffn),
                     ("fallback everywhere", t_robust)):
        print(f"overhead {label}: {(t / t_plain - 1) * 100:+.2f}% "
              f"(deployment bar: <=5%)")


if __name__ == "__main__":
    main()
