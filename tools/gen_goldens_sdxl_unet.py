"""Goldens for the SDXL-style UNet + BrushNet from the vendored diffusers
fork (the reference itself): tiny random-init models, forward outputs, and
the dual-branch brushnet→unet injection path.
"""
import sys, os

sys.path.insert(0, os.path.dirname(__file__))
import _ref_import

_ref_import.install_stubs()
sys.path.insert(0, "/root/reference/stylization/BrushNet/src")

import numpy as np
import torch

from diffusers import UNet2DConditionModel
from diffusers.models.brushnet import BrushNetModel

torch.manual_seed(21)
out = {}

unet = UNet2DConditionModel(
    sample_size=16, in_channels=4, out_channels=4,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64), layers_per_block=2,
    transformer_layers_per_block=(1, 2),
    attention_head_dim=(2, 4),  # acts as num heads (SDXL quirk)
    cross_attention_dim=32,
    use_linear_projection=True,
    addition_embed_type="text_time", addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=80,  # 32 pooled + 6*8 time ids
    norm_num_groups=16,
).eval()
for k, v in unet.state_dict().items():
    out[f"unet::{k}"] = v.float().numpy()

B = 2
sample = torch.randn(B, 4, 16, 16)
t = torch.tensor([321.0, 10.0])
ehs = torch.randn(B, 7, 32)
text_embeds = torch.randn(B, 32)
time_ids = torch.randn(B, 6)
with torch.no_grad():
    o = unet(sample, t, ehs,
             added_cond_kwargs={"text_embeds": text_embeds, "time_ids": time_ids}).sample
out.update(
    sample=sample.numpy(), t=t.numpy(), ehs=ehs.numpy(),
    text_embeds=text_embeds.numpy(), time_ids=time_ids.numpy(), unet_out=o.numpy(),
)

# ---- BrushNet branch + injection
bn = BrushNetModel(
    in_channels=4, conditioning_channels=5,
    down_block_types=("DownBlock2D", "DownBlock2D"),
    mid_block_type="UNetMidBlock2D",
    up_block_types=("UpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64), layers_per_block=2,
    attention_head_dim=8,
    cross_attention_dim=32,
    addition_embed_type="text_time", addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=80,
    norm_num_groups=16,
).eval()
for k, v in bn.state_dict().items():
    out[f"bn::{k}"] = v.float().numpy()
# randomize zero convs so injection is non-trivial
with torch.no_grad():
    for name, p in bn.named_parameters():
        if "brushnet_" in name:
            p.copy_(torch.randn_like(p) * 0.02)
for k, v in bn.state_dict().items():
    out[f"bn::{k}"] = v.float().numpy()

cond = torch.randn(B, 5, 16, 16)
with torch.no_grad():
    down, mid, up = bn(sample, t, ehs, brushnet_cond=cond,
                       added_cond_kwargs={"text_embeds": text_embeds, "time_ids": time_ids},
                       conditioning_scale=0.7, guess_mode=False, return_dict=False)
    o_inj = unet(
        sample, t, ehs,
        added_cond_kwargs={"text_embeds": text_embeds, "time_ids": time_ids},
        down_block_add_samples=[d.clone() for d in down],
        mid_block_add_sample=mid.clone(),
        up_block_add_samples=[u.clone() for u in up],
    ).sample

out["cond"] = cond.numpy()
for i, d in enumerate(down):
    out[f"bn_down_{i}"] = d.numpy()
out["bn_mid"] = mid.numpy()
for i, u in enumerate(up):
    out[f"bn_up_{i}"] = u.numpy()
out["unet_injected_out"] = o_inj.numpy()

np.savez_compressed("tests/goldens/sdxl_unet.npz", **out)
print("wrote", len(out), "arrays; unet_out", o.shape, "n_down", len(down), "n_up", len(up))
