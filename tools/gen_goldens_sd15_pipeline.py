"""E2E golden: reference StableDiffusionBrushNetPipeline (SD1.5) with tiny
models and the UniPC sampler (the test_brushnet.py configuration).

VAE sampling patched to mode() for determinism; the safety checker and
feature extractor are disabled (requires_safety_checker=False).
"""
import sys, os

sys.path.insert(0, os.path.dirname(__file__))
import _ref_import

_ref_import.install_stubs()
sys.path.insert(0, "/root/reference/stylization/BrushNet/src")

import numpy as np
import torch

from diffusers import AutoencoderKL, UNet2DConditionModel, UniPCMultistepScheduler
from diffusers.models.brushnet import BrushNetModel
from diffusers.models.autoencoders.vae import DiagonalGaussianDistribution
from diffusers.pipelines.brushnet.pipeline_brushnet import (
    StableDiffusionBrushNetPipeline,
)

DiagonalGaussianDistribution.sample = lambda self, generator=None: self.mode()

torch.manual_seed(43)
out = {}

unet = UNet2DConditionModel(
    sample_size=16, in_channels=4, out_channels=4,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64), layers_per_block=2,
    transformer_layers_per_block=1, attention_head_dim=8,
    cross_attention_dim=32, use_linear_projection=False,
    norm_num_groups=16,
).eval()
bn = BrushNetModel(
    in_channels=4, conditioning_channels=5,
    down_block_types=("DownBlock2D", "DownBlock2D"),
    mid_block_type="UNetMidBlock2D",
    up_block_types=("UpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64), layers_per_block=2, attention_head_dim=8,
    cross_attention_dim=32, norm_num_groups=16,
).eval()
with torch.no_grad():
    for name, p in bn.named_parameters():
        if "brushnet_" in name:
            p.copy_(torch.randn_like(p) * 0.02)
vae = AutoencoderKL(
    in_channels=3, out_channels=3, latent_channels=4,
    down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
    up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
    block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=8,
    scaling_factor=0.18215,
).eval()
sched = UniPCMultistepScheduler(
    num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
    beta_schedule="scaled_linear", solver_order=2, steps_offset=1,
)

pipe = StableDiffusionBrushNetPipeline(
    vae=vae, text_encoder=None, tokenizer=None, unet=unet, brushnet=bn,
    scheduler=sched, safety_checker=None, feature_extractor=None,
    requires_safety_checker=False,
)

for k, v in unet.state_dict().items():
    out[f"unet::{k}"] = v.float().numpy()
for k, v in bn.state_dict().items():
    out[f"bn::{k}"] = v.float().numpy()
for k, v in vae.state_dict().items():
    out[f"vae::{k}"] = v.float().numpy()

H = W = 64
rs = np.random.RandomState(11)
from PIL import Image

init_u8 = rs.randint(0, 256, (H, W, 3), dtype=np.uint8)
mask_u8 = ((rs.rand(H, W, 1) > 0.6) * 255).astype(np.uint8)
masked_u8 = (init_u8 * (1.0 - mask_u8 / 255.0)).astype(np.uint8)
init_image = Image.fromarray(masked_u8).convert("RGB")
mask_img = Image.fromarray(np.repeat(mask_u8, 3, axis=2)).convert("RGB")

pe = torch.randn(1, 7, 32)
npe = torch.randn(1, 7, 32)

g = torch.Generator("cpu").manual_seed(88)
with torch.no_grad():
    img_out = pipe(
        prompt_embeds=pe, negative_prompt_embeds=npe,
        image=init_image, mask=mask_img,
        height=H, width=W, num_inference_steps=6, guidance_scale=7.5,
        brushnet_conditioning_scale=1.0, generator=g, output_type="np",
    ).images[0]

out.update(
    init_u8=init_u8, mask_u8=mask_u8, masked_u8=masked_u8,
    pe=pe.numpy(), npe=npe.numpy(), img_out=np.asarray(img_out),
)
np.savez_compressed("tests/goldens/sd15_pipeline.npz", **out)
print("wrote", len(out), "arrays; img", np.asarray(img_out).shape)
