"""E2E golden: reference StableDiffusionXLBrushNetPipeline with tiny models.

VAE sampling patched to mode() for determinism (our pipeline uses the
distribution mode for conditioning latents).
"""
import sys, os

sys.path.insert(0, os.path.dirname(__file__))
import _ref_import

_ref_import.install_stubs()
sys.path.insert(0, "/root/reference/stylization/BrushNet/src")

import numpy as np
import torch

from diffusers import AutoencoderKL, UNet2DConditionModel, DPMSolverMultistepScheduler
from diffusers.models.brushnet import BrushNetModel
from diffusers.models.autoencoders.vae import DiagonalGaussianDistribution
from diffusers.pipelines.brushnet.pipeline_brushnet_sd_xl import (
    StableDiffusionXLBrushNetPipeline,
)

DiagonalGaussianDistribution.sample = lambda self, generator=None: self.mode()

torch.manual_seed(41)
out = {}

unet = UNet2DConditionModel(
    sample_size=16, in_channels=4, out_channels=4,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64), layers_per_block=2,
    transformer_layers_per_block=(1, 2), attention_head_dim=(2, 4),
    cross_attention_dim=32, use_linear_projection=True,
    addition_embed_type="text_time", addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=80, norm_num_groups=16,
).eval()
bn = BrushNetModel(
    in_channels=4, conditioning_channels=5,
    down_block_types=("DownBlock2D", "DownBlock2D"),
    mid_block_type="UNetMidBlock2D",
    up_block_types=("UpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64), layers_per_block=2, attention_head_dim=8,
    cross_attention_dim=32, addition_embed_type="text_time",
    addition_time_embed_dim=8, projection_class_embeddings_input_dim=80,
    norm_num_groups=16,
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
    scaling_factor=0.13025,
).eval()
sched = DPMSolverMultistepScheduler(
    num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
    beta_schedule="scaled_linear", algorithm_type="dpmsolver++", solver_order=2,
    timestep_spacing="leading", steps_offset=1,
)

pipe = StableDiffusionXLBrushNetPipeline(
    vae=vae, text_encoder=None, text_encoder_2=None, tokenizer=None,
    tokenizer_2=None, unet=unet, brushnet=bn, scheduler=sched,
)

for k, v in unet.state_dict().items():
    out[f"unet::{k}"] = v.float().numpy()
for k, v in bn.state_dict().items():
    out[f"bn::{k}"] = v.float().numpy()
for k, v in vae.state_dict().items():
    out[f"vae::{k}"] = v.float().numpy()

H = W = 64
rs = np.random.RandomState(9)
from PIL import Image
init_u8 = rs.randint(0, 256, (H, W, 3), dtype=np.uint8)
mask_u8 = ((rs.rand(H, W, 1) > 0.6) * 255).astype(np.uint8)
masked_u8 = (init_u8 * (1.0 - mask_u8 / 255.0)).astype(np.uint8)
init_image = Image.fromarray(masked_u8).convert("RGB")
mask_img = Image.fromarray(np.repeat(mask_u8, 3, axis=2)).convert("RGB")

pe = torch.randn(1, 7, 32)
npe = torch.randn(1, 7, 32)
ppe = torch.randn(1, 48)  # pooled dim: proj_class_dim 80 - 6*8 = 32?? -> 32
# projection_class_embeddings_input_dim=80 = pooled + 6*addition_time_embed_dim(8)=48 -> pooled=32
ppe = torch.randn(1, 32)
nppe = torch.randn(1, 32)

g = torch.Generator("cpu").manual_seed(77)
with torch.no_grad():
    img_out = pipe(
        prompt_embeds=pe, negative_prompt_embeds=npe,
        pooled_prompt_embeds=ppe, negative_pooled_prompt_embeds=nppe,
        image=init_image, mask=mask_img,
        height=H, width=W, num_inference_steps=6, guidance_scale=7.5,
        brushnet_conditioning_scale=0.7, generator=g, output_type="np",
    ).images[0]

out.update(
    init_u8=init_u8, mask_u8=mask_u8, masked_u8=masked_u8,
    pe=pe.numpy(), npe=npe.numpy(), ppe=ppe.numpy(), nppe=nppe.numpy(),
    img_out=np.asarray(img_out),
)
np.savez_compressed("tests/goldens/brushnet_pipeline.npz", **out)
print("wrote", len(out), "arrays; img", np.asarray(img_out).shape)
