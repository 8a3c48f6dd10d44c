"""LCM few-step timing benchmark (reference analogue:
``stylization/BrushNet/benchmarks/benchmark_t2i_lcm_lora.py``).

The framework's few-step path: LCM/distilled-student rollout
(``diffusion/lcm.py`` + ``training/distill.py``) with guidance embedded
in the student — a single no-CFG UNet sweep per step — plus the fp32 VAE
decode.  LoRA weights are fused at load time (``models/adapters.py``),
so unlike the reference's LCM-LoRA benchmark there is no runtime adapter
overhead to measure; the fused path IS the deployment path.

This is the ">1 img/s/chip" SDXL target configuration (BASELINE.md) —
the distillation recipe that produces a real student at this step count
is demonstrated in ``tests/test_distillation.py``.
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


def bench_lcm(args):
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
    x = jnp.zeros((B, cfg.in_channels, hw, hw), dtype)  # no CFG: batch = B
    t = jnp.asarray(500.0)
    ehs = jnp.zeros((B, 77, cfg.cross_attention_dim), dtype)
    te = jnp.zeros((B, pooled), dtype)
    ti = jnp.zeros((B, 6), jnp.float32)

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
        "SDXL-LCM", "1024px-nocfg" if args.preset == "full" else "tiny",
        B, args.num_inference_steps, total, quantize="fused-lora",
        memory_gbs=mem)


def run(args):
    rows = [bench_lcm(args)]
    report(rows, args.csv)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.set_defaults(num_inference_steps=4)
    run(p.parse_args())
