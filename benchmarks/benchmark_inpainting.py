"""Inpainting timing benchmark (reference analogue:
``stylization/BrushNet/benchmarks/benchmark_sd_inpainting.py`` — here on
the framework's actual inpainting stack, SDXL/SD1.5 + BrushNet).

Per model: VAE-encode the masked image, run the dual-branch CFG step
(BrushNet conditioning branch + UNet) x steps, VAE-decode.  Zero weights
(structure-true; wall-clock is weight-independent).

``--few_step`` measures the BASELINE.md target workload ("SDXL + BrushNet
1024px > 1 img/s/chip"): the LCM few-step no-CFG rollout (a single
guidance-embedded sweep per step, ``examples/brushnet_stylize.py
--scheduler lcm``), 4 steps.  The recipe that produces a real few-step
BrushNet student is demonstrated in ``tests/test_distillation.py``
(BrushNet-conditioned distillation).
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

TINY_KW = dict(
    block_out_channels=(32, 64), norm_num_groups=16,
    addition_time_embed_dim=8, projection_class_embeddings_input_dim=80,
    num_attention_heads=(2, 4), cross_attention_dim=32)


def _cfgs(family, preset):
    from fairygen_tpu.models.sdxl.unet2d import UNet2DConfig
    from fairygen_tpu.models.sdxl.vae import AutoencoderKLConfig

    if family == "sdxl":
        if preset == "tiny":
            ucfg = UNet2DConfig(
                down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
                up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
                transformer_layers_per_block=(1, 1), **TINY_KW)
            bcfg = UNet2DConfig(
                down_block_types=("DownBlock2D", "DownBlock2D"),
                up_block_types=("UpBlock2D", "UpBlock2D"),
                mid_block_type="UNetMidBlock2D",
                transformer_layers_per_block=(0, 0), attention_head_dim=8,
                conditioning_channels=5, **TINY_KW)
            vcfg, hw, pooled = AutoencoderKLConfig.tiny(), 16, 32
        else:
            ucfg = UNet2DConfig.sdxl_base()
            bcfg = UNet2DConfig.brushnet_sdxl()
            vcfg, hw, pooled = AutoencoderKLConfig.sdxl(), 128, 1280
    else:  # sd15
        if preset == "tiny":
            ucfg = UNet2DConfig(
                down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                transformer_layers_per_block=(1, 1), addition_embed_type=None,
                **TINY_KW)
            bcfg = UNet2DConfig(
                down_block_types=("DownBlock2D", "DownBlock2D"),
                up_block_types=("UpBlock2D", "UpBlock2D"),
                mid_block_type="UNetMidBlock2D",
                transformer_layers_per_block=(0, 0), attention_head_dim=8,
                conditioning_channels=5, addition_embed_type=None, **TINY_KW)
            vcfg, hw, pooled = AutoencoderKLConfig.tiny(), 16, None
        else:
            ucfg = UNet2DConfig.sd15_base()
            bcfg = UNet2DConfig.brushnet_sd15()
            vcfg, hw, pooled = AutoencoderKLConfig.sdxl(), 64, None  # 512px
    return ucfg, bcfg, vcfg, hw, pooled


def bench_family(family, args):
    from fairygen_tpu.models.sdxl.unet2d import (
        brushnet_forward, init_unet2d_params, unet2d_forward)
    from fairygen_tpu.models.sdxl.vae import (
        init_autoencoder_kl_params, vae_decode, vae_encode)

    dtype = jnp.bfloat16
    ucfg, bcfg, vcfg, hw, pooled = _cfgs(family, args.preset)
    B = args.batch_size
    # LCM few-step: guidance embedded in the student, single no-CFG sweep
    nb = B if getattr(args, "few_step", False) else 2 * B
    up = init_unet2d_params(ucfg, dtype)
    bp = init_unet2d_params(bcfg, dtype, brushnet=True)

    x = jnp.zeros((nb, ucfg.in_channels, hw, hw), dtype)
    t = jnp.asarray(500.0)
    ehs = jnp.zeros((nb, 77, ucfg.cross_attention_dim), dtype)
    cond = jnp.zeros((nb, 5, hw, hw), dtype)
    kw = {}
    if pooled is not None:
        kw = dict(text_embeds=jnp.zeros((nb, pooled), dtype),
                  time_ids=jnp.zeros((nb, 6), jnp.float32))

    @jax.jit
    def step(up_p, bp_p, x):
        d, m, u = brushnet_forward(bp_p, bcfg, x, t, ehs, cond,
                                   conditioning_scale=0.7, **kw)
        return unet2d_forward(up_p, ucfg, x, t, ehs,
                              down_block_add_samples=list(d),
                              mid_block_add_sample=m,
                              up_block_add_samples=list(u), **kw)

    dt = benchmark_fn(step, up, bp, x, n_iter=args.n_iter)
    mem = device_memory_gbs()
    del up, bp

    vp = init_autoencoder_kl_params(vcfg, jnp.float32)
    img = jnp.zeros((B, 3, hw * vcfg.downscale_factor,
                     hw * vcfg.downscale_factor), jnp.float32)
    dt_enc = benchmark_fn(
        jax.jit(lambda p, im: vae_encode(p, vcfg, im)), vp, img,
        n_iter=args.n_iter)
    z = jnp.zeros((B, vcfg.latent_channels, hw, hw), jnp.float32)
    dt_dec = benchmark_fn(
        jax.jit(lambda p, z: vae_decode(p, vcfg, z)), vp, z,
        n_iter=args.n_iter)
    del vp
    flush()

    total = dt * args.num_inference_steps + dt_enc + dt_dec
    label = {"sdxl": "1024px", "sd15": "512px"}[family] \
        if args.preset == "full" else "tiny"
    name = f"{family.upper()}-BrushNet-inpaint"
    if getattr(args, "few_step", False):
        name = f"{family.upper()}-BrushNet-LCM"
        label += "-nocfg"
    return generate_csv_dict(name, label,
                             B, args.num_inference_steps, total,
                             memory_gbs=mem)


ALL_INPAINT_MODELS = ("sdxl", "sd15")


def run(args):
    # report per family (see benchmark_text_to_image.run)
    rows = []
    for f in args.models:
        row = bench_family(f, args)
        report([row], args.csv)
        rows.append(row)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--models", nargs="+", choices=ALL_INPAINT_MODELS,
                   default=list(ALL_INPAINT_MODELS))
    p.add_argument("--few_step", action="store_true",
                   help="LCM few-step no-CFG mode (the >1 img/s target "
                        "workload); pair with --num_inference_steps 4")
    p.add_argument("--quality", action="store_true",
                   help="ALSO measure the few-step row's quality cost at "
                        "executable scale: the BrushNet-conditioned "
                        "distillation A/B on real converted tiny golden "
                        "weights (training/distill_experiment."
                        "run_brushnet_golden_experiment) — 4-step student "
                        "vs 50-step dual-branch teacher PSNR — appended "
                        "to benchmarks/quality_results.csv.  Full-scale "
                        "CLIPScore/PSNR vs real checkpoints is the "
                        "environment-blocked tier "
                        "(tests/test_real_weights_parity.py).")
    a = p.parse_args()
    if a.few_step and a.num_inference_steps == 50:
        a.num_inference_steps = 4
    run(a)
    if getattr(a, "quality", False):
        import csv
        import subprocess

        from fairygen_tpu.training.distill_experiment import (
            run_brushnet_golden_experiment,
        )

        r = run_brushnet_golden_experiment(
            num_train_steps=300, num_student_steps=a.num_inference_steps,
            num_teacher_steps=50, lr=3e-4)
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__)))
                             ).stdout.strip() or "unknown"
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "quality_results.csv")
        new = not os.path.exists(path)
        with open(path, "a", newline="") as f:
            w = csv.writer(f)
            if new:
                w.writerow(["workload", "metric", "value", "scale",
                            "note", "git_sha"])
            w.writerow([
                "SDXL-BrushNet-LCM",
                f"psnr_student{a.num_inference_steps}_vs_teacher50_db",
                f"{r['psnr_after']:.2f}", "tiny-golden-weights",
                f"before-distill {r['psnr_before']:.2f} dB; "
                f"cond_sensitivity {r['cond_sensitivity']:.4f}; "
                "full-scale gate env-blocked "
                "(tests/test_real_weights_parity.py)", sha])
        print(f"quality: student {a.num_inference_steps}-step vs teacher "
              f"50-step PSNR {r['psnr_after']:.2f} dB "
              f"(pre-distill {r['psnr_before']:.2f}), "
              f"cond_sensitivity {r['cond_sensitivity']:.4f} "
              f"-> {path}")
