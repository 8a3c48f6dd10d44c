"""SD1.5 + BrushNet inpainting entry point.

Mirror of the reference ``examples/brushnet/test_brushnet.py``: mask a region
of the source image, inpaint it with BrushNet guidance under the UniPC
sampler, optionally paste the original pixels back outside a blurred mask
(``--blended``).

Usage:
  python examples/brushnet_inpaint_sd15.py \
      --unet ckpts/sd15_unet.safetensors --brushnet ckpts/brushnet.safetensors \
      --vae ckpts/sd15_vae.safetensors --te ckpts/clip_l.safetensors \
      --tokenizer ckpts/tokenizer \
      --image src/test_image.jpg --mask src/test_mask.jpg \
      --prompt "A cake on the table." --output output.png
"""
import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def load_pipeline(args):
    """Build the SD1.5+BrushNet pipeline from --unet/--brushnet/--vae/--te/
    --tokenizer checkpoint paths (shared by this CLI and app_brushnet.py)."""
    import jax.numpy as jnp

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
    from fairygen_tpu.pipelines.sd15_brushnet import SD15BrushNetPipeline
    from fairygen_tpu.utils.tokenizer import CLIPTokenizerWrapper

    dtype = jnp.bfloat16
    vae_cfg = AutoencoderKLConfig(scaling_factor=0.18215)  # SD1.5 VAE
    return SD15BrushNetPipeline(
        unet_params=convert_unet2d_state_dict(
            load_state_dict(args.unet), UNet2DConfig.sd15_base(), dtype
        ),
        unet_cfg=UNet2DConfig.sd15_base(),
        vae_params=convert_autoencoder_kl_state_dict(
            load_state_dict(args.vae), vae_cfg, jnp.float32
        ),
        vae_cfg=vae_cfg,
        brushnet_params=convert_unet2d_state_dict(
            load_state_dict(args.brushnet), UNet2DConfig.brushnet_sd15(), dtype
        ),
        brushnet_cfg=UNet2DConfig.brushnet_sd15(),
        te_params=convert_clip_text_state_dict(
            load_state_dict(args.te), CLIPTextConfig(), dtype
        ),
        te_cfg=CLIPTextConfig(),
        tokenizer=CLIPTokenizerWrapper(args.tokenizer),
        dtype=dtype,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--unet", type=str, required=True, help="SD1.5 UNet safetensors")
    p.add_argument("--brushnet", type=str, required=True)
    p.add_argument("--vae", type=str, required=True)
    p.add_argument("--te", type=str, required=True, help="CLIP ViT-L text encoder")
    p.add_argument("--tokenizer", type=str, required=True)
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--mask", type=str, required=True,
                   help="white = region to inpaint (reference test_brushnet.py:38)")
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--brushnet_conditioning_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--blended", action="store_true",
                   help="Gaussian-blurred paste of the original pixels "
                        "outside the mask (test_brushnet.py:55-67)")
    p.add_argument("--output", type=str, default="output.png")
    args = p.parse_args()

    from PIL import Image

    pipe = load_pipeline(args)

    size = (args.size, args.size)
    init = np.asarray(Image.open(args.image).convert("RGB").resize(size),
                      np.float32) / 255.0
    mask = (np.asarray(Image.open(args.mask).convert("RGB").resize(size),
                       np.float32).sum(-1) > 255)[..., None].astype(np.float32)
    masked = init * (1.0 - mask)  # reference test_brushnet.py:39

    frames = pipe(
        prompt=args.prompt, negative_prompt=args.negative_prompt,
        image=masked, mask=mask,
        height=args.size, width=args.size,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance_scale,
        brushnet_conditioning_scale=args.brushnet_conditioning_scale,
        seed=args.seed, blended=args.blended, original_image=init,
    )
    Image.fromarray(frames[0]).save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
