"""Golden data for the Wan DiT: tiny random-init reference model, full
model_fn_wan_video forward (the live code path), state dict + inputs + outputs.
"""
import sys, os

sys.path.insert(0, os.path.dirname(__file__))
import _ref_import

_ref_import.install_stubs()

import numpy as np
import torch

from diffsynth.models.wan_video_dit import WanModel
from diffsynth.pipelines.wan_video import model_fn_wan_video

torch.manual_seed(0)

out = {}

def dump_sd(model, prefix):
    for k, v in model.state_dict().items():
        out[f"{prefix}::{k}"] = v.float().numpy()

# ---------------- standard path (Wan2.1-like tiny, with CLIP image branch)
cfg_std = dict(
    dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
    eps=1e-6, patch_size=(1, 2, 2), num_heads=4, num_layers=2,
    has_image_input=True,
)
m = WanModel(**cfg_std).eval()
dump_sd(m, "std")
B, C, F, H, W = 1, 8, 5, 8, 12
lat = torch.randn(B, C, F, H, W)
ts = torch.tensor([512.0])
ctx = torch.randn(B, 20, 32)
clip_feat = torch.randn(B, 257, 1280)
y = torch.randn(B, C, F, H, W)  # concat along channel: in_dim must be 2C=16
# has_image_input concat makes in channels 16 — rebuild with in_dim=16
cfg_std["in_dim"] = 16
m = WanModel(**cfg_std).eval()
dump_sd(m, "std")
with torch.no_grad():
    o = model_fn_wan_video(dit=m, latents=lat, timestep=ts, context=ctx,
                           clip_feature=clip_feat, y=y)
out["std_latents"] = lat.numpy()
out["std_timestep"] = ts.numpy()
out["std_context"] = ctx.numpy()
out["std_clip"] = clip_feat.numpy()
out["std_y"] = y.numpy()
out["std_out"] = o.numpy()

# ---------------- TI2V path (seperated timestep + fused first-frame latents)
cfg_ti = dict(
    dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
    eps=1e-6, patch_size=(1, 2, 2), num_heads=4, num_layers=2,
    has_image_input=False, seperated_timestep=True,
    require_clip_embedding=False, require_vae_embedding=False,
    fuse_vae_embedding_in_latents=True,
)
m2 = WanModel(**cfg_ti).eval()
dump_sd(m2, "ti")
lat2 = torch.randn(B, 8, 5, 8, 12)
ts2 = torch.tensor([733.0])
ctx2 = torch.randn(B, 17, 32)
with torch.no_grad():
    o2 = model_fn_wan_video(dit=m2, latents=lat2, timestep=ts2, context=ctx2,
                            fuse_vae_embedding_in_latents=True)
out["ti_latents"] = lat2.numpy()
out["ti_timestep"] = ts2.numpy()
out["ti_context"] = ctx2.numpy()
out["ti_out"] = o2.numpy()

np.savez_compressed("tests/goldens/wan_dit.npz", **out)
print("wrote", len(out), "arrays;", "std_out", o.shape, "ti_out", o2.shape)
