"""Goldens for the Wan2.1 16-ch causal VAE (tiny VideoVAE_)."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import _ref_import
_ref_import.install_stubs()
import numpy as np, torch
from diffsynth.models.wan_video_vae import VideoVAE_, WanVideoVAE

torch.manual_seed(71)
m = VideoVAE_(dim=8, z_dim=4, num_res_blocks=1).eval()
out = {}
for k, v in m.state_dict().items():
    out[f"sd::{k}"] = v.float().numpy()
mean = WanVideoVAE().mean[:4]
std = WanVideoVAE().std[:4]
scale = [mean, 1.0 / std]
x = torch.randn(1, 3, 9, 32, 32).clamp(-1, 1)
with torch.no_grad():
    z = m.encode(x, scale)
    dec = m.decode(z, scale)
out["x"] = x.numpy(); out["z"] = z.numpy(); out["dec"] = dec.numpy()
np.savez_compressed("tests/goldens/wan_vae_v1.npz", **out)
print("wrote", len(out), "z", z.shape, "dec", dec.shape)
