"""Golden: tiny WanS2VModel full forward (audio + motion + pose)."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import _ref_import
_ref_import.install_stubs()
import numpy as np, torch
from diffsynth.models.wan_video_dit_s2v import WanS2VModel

torch.manual_seed(101)
m = WanS2VModel(
    dim=96, in_dim=16, ffn_dim=128, out_dim=16, text_dim=32, freq_dim=32,
    eps=1e-6, patch_size=(1, 2, 2), num_heads=4, num_layers=2,
    cond_dim=16, audio_dim=8, num_audio_token=2, enable_adain=True,
    audio_inject_layers=[0, 1],
).eval()
out = {}
for k, v in m.state_dict().items():
    out[f"sd::{k}"] = v.float().numpy()

B = 1
latents = torch.randn(B, 16, 4, 8, 8)  # ref frame + 3
ts = torch.tensor([512.0])
ctx = torch.randn(B, 7, 32)
audio = torch.randn(B, 25, 8, 14)
motion = [torch.randn(16, 5, 16, 16)]
pose = torch.randn(B, 16, 3, 8, 8)
with torch.no_grad():
    o = m(latents, ts, ctx, audio, motion, pose)
out.update(latents=latents.numpy(), ts=ts.numpy(), ctx=ctx.numpy(),
           audio=audio.numpy(), motion=motion[0].numpy(), pose=pose.numpy(),
           o=o.numpy())
np.savez_compressed("tests/goldens/wan_s2v.npz", **out)
print("wrote", len(out), "o", o.shape)
