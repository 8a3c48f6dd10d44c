"""Image-to-image timing benchmark (reference analogue:
``stylization/BrushNet/benchmarks/benchmark_sd_img.py``).

img2img = VAE **encode** of the init image (the one stage no other
workload in the suite times) + ``strength x steps`` denoise sweeps +
VAE decode.  SDXL at 1024px, diffusers semantics (strength 0.75 of the
50-step schedule -> 37 denoise steps, reference
``benchmark_sd_img.py``/``base_classes.py``).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from utils import (add_common_args, benchmark_fn, device_memory_gbs, flush,
                   generate_csv_dict, report)


def bench_sdxl_img2img(args):
    from fairygen_tpu.models.sdxl.unet2d import (
        UNet2DConfig, init_unet2d_params, unet2d_forward)
    from fairygen_tpu.models.sdxl.vae import (
        AutoencoderKLConfig, init_autoencoder_kl_params, vae_decode,
        vae_encode)

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
        hw, px, pooled = 16, 128, 32
    else:
        cfg = UNet2DConfig.sdxl_base()
        vcfg = AutoencoderKLConfig.sdxl()
        hw, px, pooled = 128, 1024, 1280

    B = args.batch_size
    denoise_steps = max(1, int(args.num_inference_steps * args.strength))

    # VAE encode of the init image (fp32, matching the decode-side policy)
    vp = init_autoencoder_kl_params(vcfg, jnp.float32)
    img = jnp.zeros((B, 3, px, px), jnp.float32)
    dt_enc = benchmark_fn(
        jax.jit(lambda p, x: vae_encode(p, vcfg, x)), vp, img,
        n_iter=args.n_iter)

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

    z = jnp.zeros((B, vcfg.latent_channels, hw, hw), jnp.float32)
    dt_dec = benchmark_fn(
        jax.jit(lambda p, z: vae_decode(p, vcfg, z)), vp, z,
        n_iter=args.n_iter)
    del vp
    flush()

    total = dt_enc + dt * denoise_steps + dt_dec
    return generate_csv_dict(
        "SDXL-img2img",
        (f"1024px-cfg-strength{args.strength}" if args.preset == "full"
         else "tiny"),
        B, denoise_steps, total, memory_gbs=mem)


def run(args):
    rows = [bench_sdxl_img2img(args)]
    report(rows, args.csv)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--strength", type=float, default=0.75,
                   help="fraction of the schedule actually denoised")
    run(p.parse_args())
