"""ControlNet timing benchmark (reference analogue:
``stylization/BrushNet/benchmarks/benchmark_controlnet.py``).

Times the framework's ControlNet stack on FLUX.1: the ControlNet branch
(5 joint + 10 single blocks) feeding per-block residual taps into the
DiT sweep, x steps, plus the VAE decode.  Full preset quantizes both
towers to int8 W8A8 (12B bf16 + ControlNet does not fit one v5e's
16 GB; the int8 deployment path does).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from utils import add_common_args, benchmark_fn, flush, generate_csv_dict, report


def bench_flux_controlnet(args):
    from fairygen_tpu.models.flux.controlnet import (
        FluxControlNetConfig, align_controlnet_res, flux_controlnet_forward,
        init_flux_controlnet_params)
    from fairygen_tpu.models.flux.dit import (
        FluxDiTConfig, flux_dit_forward, init_flux_dit_params)
    from fairygen_tpu.models.sdxl.vae import (
        AutoencoderKLConfig, init_autoencoder_kl_params, vae_decode)

    dtype = jnp.bfloat16
    quantize = "none"
    if args.preset == "tiny":
        dcfg = FluxDiTConfig.tiny()
        ccfg = FluxControlNetConfig.tiny()
        vcfg = AutoencoderKLConfig.tiny(block_out_channels=(16, 32))
        hw, lt = 8, 16
    else:
        dcfg = FluxDiTConfig.flux1_dev()
        ccfg = FluxControlNetConfig()
        vcfg = AutoencoderKLConfig.flux()
        hw, lt = 128, 512
        quantize = "int8"

    def zeros(init):
        shapes = jax.eval_shape(init)
        return jax.jit(lambda: jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    B = args.batch_size
    dparams = zeros(lambda: init_flux_dit_params(
        jax.random.key(0), dcfg, dtype=dtype))
    cparams = zeros(lambda: init_flux_controlnet_params(
        jax.random.key(1), ccfg, dtype=dtype))
    if quantize == "int8":
        from fairygen_tpu.ops.quant import quantize_image_dit_params

        dparams = quantize_image_dit_params(dparams, consume=True)
        cparams = quantize_image_dit_params(cparams, consume=True)

    ch = dcfg.in_dim // 4  # pre-2x2-pack latent channels
    lat = jnp.zeros((B, ch, hw, hw), dtype)
    cond = jnp.zeros((B, ch, hw, hw), dtype)
    ts = jnp.full((B,), 500.0, jnp.float32)
    ctx = jnp.zeros((B, lt, dcfg.context_dim), dtype)
    pooled = jnp.zeros((B, dcfg.pooled_dim), dtype)
    guid = jnp.full((B,), 3.5, jnp.float32)

    @jax.jit
    def step(dp, cp, x):
        dres, sres = flux_controlnet_forward(cp, ccfg, x, cond, ts, ctx,
                                             pooled, guid)
        dres = align_controlnet_res(dres, dcfg.num_double_blocks)
        sres = align_controlnet_res(sres, dcfg.num_single_blocks)
        return flux_dit_forward(dp, dcfg, x, ts, ctx, pooled, guid,
                                controlnet_res=dres,
                                controlnet_single_res=sres)

    dt = benchmark_fn(step, dparams, cparams, lat, n_iter=args.n_iter)
    del dparams, cparams

    vp = init_autoencoder_kl_params(vcfg, dtype, include_encoder=False)
    z = jnp.zeros((B, vcfg.latent_channels, hw, hw), dtype)
    dt_vae = benchmark_fn(
        jax.jit(lambda p, z: vae_decode(p, vcfg, z)), vp, z,
        n_iter=args.n_iter)
    del vp
    flush()

    total = dt * args.num_inference_steps + dt_vae
    return generate_csv_dict(
        "FLUX1-ControlNet", "1024px" if args.preset == "full" else "tiny",
        B, args.num_inference_steps, total, quantize=quantize)


def run(args):
    rows = [bench_flux_controlnet(args)]
    report(rows, args.csv)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_common_args(p)
    run(p.parse_args())
