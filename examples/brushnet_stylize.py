"""Stylized background generation — mirror of
``stylization/BrushNet/examples/brushnet/test_brushnet_sdxl.py``:
SDXL UNet + Style-DoRA adapter + BrushNet masked inpainting, iterating a
directory of prompt ``.txt`` files.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--unet", type=str, required=True, help="SDXL UNet safetensors")
    p.add_argument("--brushnet", type=str, required=True)
    p.add_argument("--vae", type=str, required=True, help="sdxl-vae-fp16-fix")
    p.add_argument("--te1", type=str, required=True)
    p.add_argument("--te2", type=str, required=True)
    p.add_argument("--tokenizer1", type=str, required=True)
    p.add_argument("--tokenizer2", type=str, required=True)
    p.add_argument("--dora", type=str, default=None, help="style adapter safetensors")
    p.add_argument("--lora_scale", type=float, default=0.66)
    p.add_argument("--image", type=str, required=True, help="character image")
    p.add_argument("--mask", type=str, required=True, help="character mask (white=char)")
    p.add_argument("--prompt_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--brushnet_conditioning_scale", type=float, default=0.7)
    p.add_argument("--scheduler", type=str, default="dpm", choices=["dpm", "lcm"],
                   help="lcm = few-step sampling for LCM-LoRA/distilled UNets")
    p.add_argument("--seed", type=int, default=333)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=1,
                   help="prompts per pipeline call; combine with "
                        "--mesh_data for data-parallel multi-chip throughput")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-parallel mesh size (0 = no mesh)")
    args = p.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from fairygen_tpu.core.io import load_state_dict
    from fairygen_tpu.models.sdxl.clip import CLIPTextConfig, convert_clip_text_state_dict
    from fairygen_tpu.models.sdxl.unet2d import UNet2DConfig, convert_unet2d_state_dict
    from fairygen_tpu.models.sdxl.vae import (
        AutoencoderKLConfig, convert_autoencoder_kl_state_dict,
    )
    from fairygen_tpu.pipelines.sdxl_brushnet import SDXLBrushNetPipeline, scale_adapters
    from fairygen_tpu.utils.tokenizer import CLIPTokenizerWrapper

    from fairygen_tpu.core.model_config import override_config

    dtype = jnp.bfloat16
    unet_cfg = override_config("sdxl_unet", UNet2DConfig.sdxl_base())
    vae_cfg = override_config("sdxl_vae", AutoencoderKLConfig.sdxl())
    bn_cfg = override_config("brushnet", UNet2DConfig.brushnet_sdxl())
    te1_cfg = override_config("sdxl_te1", CLIPTextConfig.sdxl_te1())
    te2_cfg = override_config("sdxl_te2", CLIPTextConfig.sdxl_te2())
    unet_params = convert_unet2d_state_dict(load_state_dict(args.unet), unet_cfg, dtype)
    if args.dora:
        # runtime DoRA adapters (reference passes the scale via
        # cross_attention_kwargs, test_brushnet_sdxl.py:158)
        from fairygen_tpu.training.dora_trainer import load_sdxl_dora_state_dict

        unet_params, n = load_sdxl_dora_state_dict(
            unet_params, load_state_dict(args.dora), scale=args.lora_scale)
        print(f"{n} style-adapter modules loaded (scale {args.lora_scale})")

    pipe = SDXLBrushNetPipeline(
        unet_params=unet_params,
        unet_cfg=unet_cfg,
        vae_params=convert_autoencoder_kl_state_dict(
            load_state_dict(args.vae), vae_cfg, jnp.float32
        ),
        vae_cfg=vae_cfg,
        brushnet_params=convert_unet2d_state_dict(
            load_state_dict(args.brushnet), bn_cfg, dtype
        ),
        brushnet_cfg=bn_cfg,
        te1_params=convert_clip_text_state_dict(
            load_state_dict(args.te1), te1_cfg, dtype
        ),
        te1_cfg=te1_cfg,
        te2_params=convert_clip_text_state_dict(
            load_state_dict(args.te2), te2_cfg, dtype
        ),
        te2_cfg=te2_cfg,
        tokenizer1=CLIPTokenizerWrapper(args.tokenizer1),
        tokenizer2=CLIPTokenizerWrapper(args.tokenizer2),
        dtype=dtype,
    )

    size = (args.size, args.size)
    init = np.asarray(Image.open(args.image).convert("RGB").resize(size), np.float32) / 255.0
    mask = (np.asarray(Image.open(args.mask).convert("L").resize(size), np.float32) > 250 / 255.0 * 255)[..., None].astype(np.float32)
    masked = init * (1.0 - mask)  # character blanked; background to paint

    if args.mesh_data > 0:
        import jax

        from fairygen_tpu.core.meshes import make_mesh

        pipe.mesh = make_mesh(data=args.mesh_data, seq=1,
                              devices=jax.devices()[:args.mesh_data])

    os.makedirs(args.output_dir, exist_ok=True)
    names, prompts = [], []
    for fname in sorted(os.listdir(args.prompt_dir)):
        if fname.endswith(".txt"):
            with open(os.path.join(args.prompt_dir, fname)) as f:
                prompts.append(f.read().strip())
            names.append(os.path.splitext(fname)[0])

    bs = max(args.batch_size, 1)
    for i in range(0, len(prompts), bs):
        chunk = prompts[i:i + bs]
        frames = pipe(
            prompt=chunk if len(chunk) > 1 else chunk[0],
            image=masked, mask=mask,
            height=args.size, width=args.size,
            num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale,
            scheduler=args.scheduler,
            brushnet_conditioning_scale=args.brushnet_conditioning_scale,
            seed=args.seed + i,
        )
        for j, frame in enumerate(frames):
            out_path = os.path.join(args.output_dir, names[i + j] + ".png")
            Image.fromarray(frame).save(out_path)
            print(f"{names[i + j]} -> {out_path}")


if __name__ == "__main__":
    main()
