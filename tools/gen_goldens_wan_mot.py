"""Golden: tiny MoT (VAP) joint forward through model_fn_wan_video."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import _ref_import
_ref_import.install_stubs()
import numpy as np, torch
from diffsynth.models.wan_video_dit import WanModel
from diffsynth.models.wan_video_mot import MotWanModel
from diffsynth.pipelines.wan_video import model_fn_wan_video

torch.manual_seed(81)
out = {}
dit = WanModel(
    dim=96, in_dim=16, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
    eps=1e-6, patch_size=(1, 2, 2), num_heads=4, num_layers=4,
    has_image_input=True,
).eval()
mot = MotWanModel(
    mot_layers=(0, 2), patch_size=(1, 2, 2), has_image_input=True,
    dim=96, num_heads=4, ffn_dim=128, freq_dim=32, text_dim=32, in_dim=8,
).eval()
for k, v in dit.state_dict().items():
    out[f"dit::{k}"] = v.float().numpy()
for k, v in mot.state_dict().items():
    out[f"mot::{k}"] = v.float().numpy()

B = 1
lat = torch.randn(B, 8, 3, 8, 12)
y = torch.randn(B, 8, 3, 8, 12)
ts = torch.tensor([615.0])
ctx = torch.randn(B, 9, 32)
clip_feat = torch.randn(B, 257, 1280)
vap_hidden = torch.randn(B, 8, 3, 8, 12)
ctx_vap = torch.randn(B, 7, 32)
vap_clip = torch.randn(B, 257, 1280)
with torch.no_grad():
    o = model_fn_wan_video(
        dit=dit, vap=mot, latents=lat, timestep=ts, context=ctx,
        clip_feature=clip_feat, y=y,
        vap_hidden_state=vap_hidden, context_vap=ctx_vap, vap_clip_feature=vap_clip,
    )
out.update(lat=lat.numpy(), y=y.numpy(), ts=ts.numpy(), ctx=ctx.numpy(),
           clip=clip_feat.numpy(), vap_hidden=vap_hidden.numpy(),
           ctx_vap=ctx_vap.numpy(), vap_clip=vap_clip.numpy(), o=o.numpy())
np.savez_compressed("tests/goldens/wan_mot.npz", **out)
print("wrote", len(out), "o", o.shape)
