"""Text-to-image timing benchmark (reference analogue:
``stylization/BrushNet/benchmarks/benchmark_text_to_image.py``).

Times the full-scale denoise program (CFG where the family uses it) plus
the VAE decode with structure-true zero weights (wall-clock is
weight-independent), and appends one CSV row per model to
``collated_results.csv``.

Models:
  sdxl     SDXL base UNet, 1024px, batch-2 CFG step x steps + fp32 VAE
  z_image  Z-Image ~6B DiT (fits one v5e at bf16), 1024px, no-CFG Turbo
           style steps + bf16 16ch VAE
  flux     FLUX.1-dev 12B — int8 W8A8 (24 GB bf16 does not fit one v5e;
           the ~12 GB int8-from-birth form does), guidance-embedded
           (no CFG)

``--preset tiny`` shrinks every config to CPU-smoke shapes (used by
``tests/test_benchmarks_suite.py``).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from utils import (add_common_args, benchmark_fn, device_memory_gbs, flush,
                   generate_csv_dict, report, zeros_params)


def bench_sdxl(args):
    from fairygen_tpu.models.sdxl.unet2d import (
        UNet2DConfig, init_unet2d_params, unet2d_forward)
    from fairygen_tpu.models.sdxl.vae import (
        AutoencoderKLConfig, init_autoencoder_kl_params, vae_decode)

    dtype = jnp.bfloat16
    if args.preset == "tiny":
        cfg = UNet2DConfig(
            block_out_channels=(32, 64),
            down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
            up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
            transformer_layers_per_block=(1, 1), num_attention_heads=(2, 4),
            cross_attention_dim=32, norm_num_groups=16,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=80)
        vcfg = AutoencoderKLConfig.tiny()
        hw, pooled = 16, 32
    else:
        cfg = UNet2DConfig.sdxl_base()
        vcfg = AutoencoderKLConfig.sdxl()
        hw, pooled = 128, 1280

    B = args.batch_size
    up = init_unet2d_params(cfg, dtype)
    x = jnp.zeros((2 * B, cfg.in_channels, hw, hw), dtype)
    t = jnp.asarray(500.0)
    ehs = jnp.zeros((2 * B, 77, cfg.cross_attention_dim), dtype)
    te = jnp.zeros((2 * B, pooled), dtype)
    ti = jnp.zeros((2 * B, 6), jnp.float32)

    @jax.jit
    def step(p, x):
        return unet2d_forward(p, cfg, x, t, ehs, text_embeds=te, time_ids=ti)

    dt = benchmark_fn(step, up, x, n_iter=args.n_iter)
    mem = device_memory_gbs()
    del up

    vp = init_autoencoder_kl_params(vcfg, jnp.float32, include_encoder=False)
    z = jnp.zeros((B, vcfg.latent_channels, hw, hw), jnp.float32)
    dt_vae = benchmark_fn(
        jax.jit(lambda p, z: vae_decode(p, vcfg, z)), vp, z,
        n_iter=args.n_iter)
    del vp
    flush()

    total = dt * args.num_inference_steps + dt_vae
    return generate_csv_dict(
        "SDXL-t2i", "1024px-cfg" if args.preset == "full" else "tiny",
        B, args.num_inference_steps, total, memory_gbs=mem)


def bench_z_image(args, quantize="none"):
    from fairygen_tpu.models.sdxl.vae import (
        AutoencoderKLConfig, init_autoencoder_kl_params, vae_decode)
    from fairygen_tpu.models.z_image.dit import (
        ZImageDiTConfig, init_z_image_dit_params, z_image_dit_forward)

    dtype = jnp.bfloat16
    if args.preset == "tiny":
        cfg = ZImageDiTConfig(dim=256, num_heads=2, num_layers=1,
                              num_refiner_layers=1, cap_feat_dim=32)
        vcfg = AutoencoderKLConfig.tiny(block_out_channels=(16, 32))
        hw, cap = 8, 16
    else:
        cfg = ZImageDiTConfig()  # full ~6B
        vcfg = AutoencoderKLConfig.flux()
        hw, cap = 128, 250

    B = args.batch_size
    # the Z-Image DiT runs per sample (reference packs sequences per
    # sample; z_image_dit_forward asserts b == 1), so a batch of B costs
    # B sequential denoise sweeps — measure one and scale, like the
    # pipeline's per-prompt loop
    per_sample = B > 1

    def make():
        p = init_z_image_dit_params(jax.random.key(0), cfg, dtype=dtype)
        if quantize == "int8":
            from fairygen_tpu.ops.quant import quantize_image_dit_params

            p = quantize_image_dit_params(p)
        return p

    params = zeros_params(make)
    lat = jnp.zeros((1 if per_sample else B, cfg.in_channels, hw, hw), dtype)
    capf = jnp.zeros((lat.shape[0], cap, cfg.cap_feat_dim), dtype)
    ts = jnp.full((lat.shape[0],), 0.6, jnp.float32)

    @jax.jit
    def step(p, x):
        return z_image_dit_forward(p, cfg, x, ts, capf)

    dt = benchmark_fn(step, params, lat, n_iter=args.n_iter)
    mem = device_memory_gbs()
    del params

    vp = init_autoencoder_kl_params(vcfg, dtype, include_encoder=False)
    z = jnp.zeros((B, vcfg.latent_channels, hw, hw), dtype)
    dt_vae = benchmark_fn(
        jax.jit(lambda p, z: vae_decode(p, vcfg, z)), vp, z,
        n_iter=args.n_iter)
    del vp
    flush()

    total = dt * args.num_inference_steps * (B if per_sample else 1) + dt_vae
    config = "1024px-turbo" if args.preset == "full" else "tiny"
    if per_sample:
        config += f"-persample-x{B}"
    return generate_csv_dict(
        "ZImage-t2i", config,
        B, args.num_inference_steps, total, quantize=quantize,
        memory_gbs=mem)


def bench_flux(args, quantize="int8"):
    from fairygen_tpu.models.flux.dit import (
        FluxDiTConfig, flux_dit_forward, init_flux_dit_params)
    from fairygen_tpu.models.sdxl.vae import (
        AutoencoderKLConfig, init_autoencoder_kl_params, vae_decode)

    dtype = jnp.bfloat16
    if args.preset == "tiny":
        cfg = FluxDiTConfig.tiny()
        vcfg = AutoencoderKLConfig.tiny(block_out_channels=(16, 32))
        hw, lt = 8, 16
        quantize = "none"
    else:
        cfg = FluxDiTConfig.flux1_dev()
        vcfg = AutoencoderKLConfig.flux()
        hw, lt = 128, 512

    B = args.batch_size

    def make():
        p = init_flux_dit_params(jax.random.key(0), cfg, dtype=dtype)
        if quantize == "int8":
            # skip only the embedders: FLUX names its modulation linears
            # norm1_a/norm1_b/norm, so "norm"-skipping lists would leave
            # 3.3B params (6.6 GB) in bf16 — see ops/quant.py docstring
            from fairygen_tpu.ops.quant import quantize_image_dit_params

            p = quantize_image_dit_params(p, skip_substrings=("emb",))
        return p

    params = zeros_params(make)
    lat = jnp.zeros((B, cfg.in_dim // 4, hw, hw), dtype)  # pre-2x2-pack chans
    ts = jnp.full((B,), 500.0, jnp.float32)
    ctx = jnp.zeros((B, lt, cfg.context_dim), dtype)
    pooled = jnp.zeros((B, cfg.pooled_dim), dtype)
    guid = jnp.full((B,), 3.5, jnp.float32)

    @jax.jit
    def step(p, x):
        return flux_dit_forward(p, cfg, x, ts, ctx, pooled, guid)

    dt = benchmark_fn(step, params, lat, n_iter=args.n_iter)
    mem = device_memory_gbs()
    del params

    vp = init_autoencoder_kl_params(vcfg, dtype, include_encoder=False)
    z = jnp.zeros((B, vcfg.latent_channels, hw, hw), dtype)
    dt_vae = benchmark_fn(
        jax.jit(lambda p, z: vae_decode(p, vcfg, z)), vp, z,
        n_iter=args.n_iter)
    del vp
    flush()

    total = dt * args.num_inference_steps + dt_vae
    return generate_csv_dict(
        "FLUX1-t2i", "1024px-dev" if args.preset == "full" else "tiny",
        B, args.num_inference_steps, total, quantize=quantize,
        memory_gbs=mem)


ALL_T2I_MODELS = {
    "sdxl": bench_sdxl,
    "z_image": bench_z_image,
    "flux": bench_flux,
}


def run(args):
    # report per model: an OOM in a later (bigger) model must not discard
    # the rows already measured in this process
    rows = []
    for name in args.models:
        row = ALL_T2I_MODELS[name](args)
        report([row], args.csv)
        rows.append(row)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--models", nargs="+", choices=sorted(ALL_T2I_MODELS),
                   default=["sdxl", "z_image", "flux"])
    run(p.parse_args())
