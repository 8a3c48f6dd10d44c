"""Goldens for motion controller + VACE (tiny reference models) + a
VACE-conditioned full forward through model_fn_wan_video."""
import sys, os

sys.path.insert(0, os.path.dirname(__file__))
import _ref_import

_ref_import.install_stubs()

import numpy as np
import torch

from diffsynth.models.wan_video_motion_controller import WanMotionControllerModel
from diffsynth.models.wan_video_vace import VaceWanModel
from diffsynth.models.wan_video_dit import WanModel
from diffsynth.pipelines.wan_video import model_fn_wan_video

torch.manual_seed(51)
out = {}

mc = WanMotionControllerModel(freq_dim=32, dim=96).eval()
for k, v in mc.state_dict().items():
    out[f"mc::{k}"] = v.float().numpy()
mb = torch.tensor([5.0, 20.0])
with torch.no_grad():
    o = mc(mb)
out["mc_in"] = mb.numpy()
out["mc_out"] = o.reshape(2, 6, 96).numpy()

# VACE + main DiT
dit = WanModel(
    dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
    eps=1e-6, patch_size=(1, 2, 2), num_heads=4, num_layers=4,
    has_image_input=False,
).eval()
vace = VaceWanModel(
    vace_layers=(0, 2), vace_in_dim=16, patch_size=(1, 2, 2),
    has_image_input=False, dim=96, num_heads=4, ffn_dim=128,
).eval()
for k, v in dit.state_dict().items():
    out[f"dit::{k}"] = v.float().numpy()
for k, v in vace.state_dict().items():
    out[f"vace::{k}"] = v.float().numpy()

B, C, F, H, W = 1, 8, 3, 8, 12
lat = torch.randn(B, C, F, H, W)
ts = torch.tensor([440.0])
ctx = torch.randn(B, 9, 32)
vctx = torch.randn(B, 16, F, H, W)
with torch.no_grad():
    o2 = model_fn_wan_video(dit=dit, vace=vace, latents=lat, timestep=ts,
                            context=ctx, vace_context=vctx, vace_scale=0.8)
out["lat"] = lat.numpy()
out["ts"] = ts.numpy()
out["ctx"] = ctx.numpy()
out["vctx"] = vctx.numpy()
out["vace_out"] = o2.numpy()

np.savez_compressed("tests/goldens/wan_aux.npz", **out)
print("wrote", len(out), "arrays")
