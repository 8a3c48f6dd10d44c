"""Plain SDXL text-to-image with an optional style DoRA/LoRA.

Mirror of ``stylization/dora_training/inference.py``: load SDXL, fuse a
style adapter, generate from a prompt (no BrushNet/inpainting).

Usage:
  python examples/sdxl_t2i.py --unet ... --vae ... --te1 ... --te2 ... \
      --tokenizer1 ... --tokenizer2 ... [--dora lora_dir_or_file] \
      --prompt "A bustling city street..." --output city_street.png
"""
import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--unet", type=str, required=True)
    p.add_argument("--vae", type=str, required=True)
    p.add_argument("--te1", type=str, required=True)
    p.add_argument("--te2", type=str, required=True)
    p.add_argument("--tokenizer1", type=str, required=True)
    p.add_argument("--tokenizer2", type=str, required=True)
    p.add_argument("--dora", type=str, default=None,
                   help="style adapter safetensors (fused at load)")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=720)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--scheduler", type=str, default="dpm", choices=["dpm", "lcm"],
                   help="lcm = few-step sampling for LCM-LoRA/distilled UNets")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", type=str, default="output.png")
    args = p.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from fairygen_tpu.core.io import load_state_dict
    from fairygen_tpu.models.sdxl.clip import (
        CLIPTextConfig, convert_clip_text_state_dict,
    )
    from fairygen_tpu.models.sdxl.unet2d import (
        UNet2DConfig, convert_unet2d_state_dict,
    )
    from fairygen_tpu.models.sdxl.vae import (
        AutoencoderKLConfig, convert_autoencoder_kl_state_dict,
    )
    from fairygen_tpu.pipelines.sdxl_brushnet import SDXLBrushNetPipeline
    from fairygen_tpu.utils.tokenizer import CLIPTokenizerWrapper

    dtype = jnp.bfloat16
    unet_cfg = UNet2DConfig.sdxl_base()
    unet_params = convert_unet2d_state_dict(
        load_state_dict(args.unet), unet_cfg, dtype)
    if args.dora:
        from fairygen_tpu.training.dora_trainer import load_sdxl_dora_state_dict

        unet_params, n = load_sdxl_dora_state_dict(
            unet_params, load_state_dict(args.dora), scale=args.lora_scale)
        print(f"{n} style-adapter modules loaded (scale {args.lora_scale})")

    pipe = SDXLBrushNetPipeline(
        unet_params=unet_params, unet_cfg=unet_cfg,
        vae_params=convert_autoencoder_kl_state_dict(
            load_state_dict(args.vae), AutoencoderKLConfig.sdxl(),
            jnp.float32),
        vae_cfg=AutoencoderKLConfig.sdxl(),
        te1_params=convert_clip_text_state_dict(
            load_state_dict(args.te1), CLIPTextConfig.sdxl_te1(), dtype),
        te1_cfg=CLIPTextConfig.sdxl_te1(),
        te2_params=convert_clip_text_state_dict(
            load_state_dict(args.te2), CLIPTextConfig.sdxl_te2(), dtype),
        te2_cfg=CLIPTextConfig.sdxl_te2(),
        tokenizer1=CLIPTokenizerWrapper(args.tokenizer1),
        tokenizer2=CLIPTokenizerWrapper(args.tokenizer2),
        dtype=dtype,
    )
    frames = pipe(
        prompt=args.prompt, negative_prompt=args.negative_prompt,
        height=args.height, width=args.width,
        num_inference_steps=args.steps, guidance_scale=args.guidance_scale,
        scheduler=args.scheduler,
        seed=args.seed,
    )
    Image.fromarray(frames[0]).save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
