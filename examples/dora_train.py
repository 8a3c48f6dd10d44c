"""Single-image Style-DoRA training — mirror of
``stylization/dora_training/train.sh`` (+ train.py): learn the drawing's
art style from ONE image+mask pair via masked DoRA on SDXL attention.

Data layout (reference data/train/<name>/): texture.png + mask.png +
metadata with a caption, or pass --image/--mask/--caption directly.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--unet", type=str, required=True)
    p.add_argument("--vae", type=str, required=True)
    p.add_argument("--te1", type=str, required=True)
    p.add_argument("--te2", type=str, required=True)
    p.add_argument("--tokenizer1", type=str, required=True)
    p.add_argument("--tokenizer2", type=str, required=True)
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--mask", type=str, required=True)
    p.add_argument("--caption", type=str, required=True)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--rank", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--max_train_steps", type=int, default=400)
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--optimizer", type=str, default="adamw",
                   choices=["adamw", "adafactor", "sgd"],
                   help="adafactor = the TPU-native stand-in for the "
                        "reference's --use_8bit_adam memory budget")
    p.add_argument("--output_path", type=str, default="./dora_out")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fairygen_tpu.core.io import load_state_dict, save_safetensors
    from fairygen_tpu.models.sdxl.clip import (
        CLIPTextConfig, convert_clip_text_state_dict, sdxl_encode_prompt,
    )
    from fairygen_tpu.models.sdxl.unet2d import UNet2DConfig, convert_unet2d_state_dict
    from fairygen_tpu.models.sdxl.vae import (
        AutoencoderKLConfig, convert_autoencoder_kl_state_dict, vae_encode,
    )
    from fairygen_tpu.training.optimizers import make_optimizer
    from fairygen_tpu.training.dora_trainer import (
        add_dora_to_sdxl_unet, make_sdxl_dora_train_step, sdxl_dora_state_dict,
    )
    from fairygen_tpu.utils.tokenizer import CLIPTokenizerWrapper

    from fairygen_tpu.core.model_config import override_config

    unet_cfg = override_config("sdxl_unet", UNet2DConfig.sdxl_base())
    params = convert_unet2d_state_dict(load_state_dict(args.unet), unet_cfg, jnp.float32)
    params = add_dora_to_sdxl_unet(params, jax.random.key(args.seed), rank=args.rank)

    vae_cfg = override_config("sdxl_vae", AutoencoderKLConfig.sdxl())
    vae_params = convert_autoencoder_kl_state_dict(
        load_state_dict(args.vae), vae_cfg, jnp.float32
    )
    te1_cfg = override_config("sdxl_te1", CLIPTextConfig.sdxl_te1())
    te2_cfg = override_config("sdxl_te2", CLIPTextConfig.sdxl_te2())
    te1 = convert_clip_text_state_dict(load_state_dict(args.te1), te1_cfg, jnp.float32)
    te2 = convert_clip_text_state_dict(load_state_dict(args.te2), te2_cfg, jnp.float32)
    tok1 = CLIPTokenizerWrapper(args.tokenizer1)
    tok2 = CLIPTokenizerWrapper(args.tokenizer2)

    size = (args.resolution, args.resolution)
    img = np.asarray(Image.open(args.image).convert("RGB").resize(size), np.float32)
    mask = np.asarray(Image.open(args.mask).convert("L").resize(size), np.float32)
    pixel = jnp.asarray(img / 127.5 - 1.0).transpose(2, 0, 1)[None]
    latents = vae_encode(vae_params, vae_cfg, pixel) * vae_cfg.scaling_factor
    h, w = latents.shape[-2:]
    # nearest-resize mask to the latent grid (train.py:1215-1217)
    ih = (np.arange(h) * mask.shape[0] // h)
    iw = (np.arange(w) * mask.shape[1] // w)
    mask_latents = jnp.asarray((mask[ih][:, iw] > 127).astype(np.float32))[None, None]

    pe, pooled = sdxl_encode_prompt(te1, te1_cfg, te2, te2_cfg,
                                    jnp.asarray(tok1(args.caption)),
                                    jnp.asarray(tok2(args.caption)))
    batch = {
        "latents": latents, "mask_latents": mask_latents,
        "prompt_embeds": pe, "pooled": pooled,
        "original_size": jnp.asarray([[args.resolution, args.resolution]]),
        "crop_top_left": jnp.asarray([[0, 0]]),
    }

    init_state, train_step = make_sdxl_dora_train_step(
        unet_cfg,
        make_optimizer(args.optimizer, args.learning_rate,
                       weight_decay=1e-2),
        snr_gamma=args.snr_gamma, resolution=args.resolution,
    )
    state = init_state(params)
    rng = jax.random.key(args.seed)
    for step in range(1, args.max_train_steps + 1):
        rng, sub = jax.random.split(rng)
        state, loss = train_step(state, batch, sub)
        if step % 20 == 0:
            print(f"step {step} loss {float(loss):.5f}", flush=True)

    os.makedirs(args.output_path, exist_ok=True)
    out = os.path.join(args.output_path, "pytorch_lora_weights.safetensors")
    save_safetensors(out, sdxl_dora_state_dict(state.params))
    print(f"saved {out}")


if __name__ == "__main__":
    main()
