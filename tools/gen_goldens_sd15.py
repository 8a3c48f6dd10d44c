"""Golden: tiny SD1.5-style UNet (no text_time embed, conv transformer
projections) + plain-block BrushNet injection."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import _ref_import
_ref_import.install_stubs()
sys.path.insert(0, "/root/reference/stylization/BrushNet/src")
import numpy as np, torch
from diffusers import UNet2DConditionModel
from diffusers.models.brushnet import BrushNetModel

torch.manual_seed(131)
out = {}
unet = UNet2DConditionModel(
    sample_size=16, in_channels=4, out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(32, 64), layers_per_block=2,
    attention_head_dim=8, cross_attention_dim=24,
    use_linear_projection=False,  # SD1.5 conv projections
    norm_num_groups=16,
).eval()
for k, v in unet.state_dict().items():
    out[f"unet::{k}"] = v.float().numpy()
bn = BrushNetModel(
    in_channels=4, conditioning_channels=5,
    down_block_types=("DownBlock2D", "DownBlock2D"),
    mid_block_type="UNetMidBlock2D",
    up_block_types=("UpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64), layers_per_block=2, attention_head_dim=8,
    cross_attention_dim=24, norm_num_groups=16,
).eval()
with torch.no_grad():
    for n, p in bn.named_parameters():
        if "brushnet_" in n:
            p.copy_(torch.randn_like(p) * 0.02)
for k, v in bn.state_dict().items():
    out[f"bn::{k}"] = v.float().numpy()

B = 2
sample = torch.randn(B, 4, 16, 16)
t = torch.tensor([101.0, 707.0])
ehs = torch.randn(B, 7, 24)
cond = torch.randn(B, 5, 16, 16)
with torch.no_grad():
    down, mid, up = bn(sample, t, ehs, brushnet_cond=cond,
                       conditioning_scale=1.0, return_dict=False)
    o = unet(sample, t, ehs,
             down_block_add_samples=[d.clone() for d in down],
             mid_block_add_sample=mid.clone(),
             up_block_add_samples=[u.clone() for u in up]).sample
out.update(sample=sample.numpy(), t=t.numpy(), ehs=ehs.numpy(), cond=cond.numpy(),
           o=o.numpy())
np.savez_compressed("tests/goldens/sd15_unet.npz", **out)
print("wrote", len(out), "o", o.shape)
