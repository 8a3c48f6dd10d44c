"""Golden data for the Wan2.2 VAE38: tiny random-init reference model,
streamed encode/decode (the reference's only execution mode), state dict +
inputs + outputs.
"""
import sys, os

sys.path.insert(0, os.path.dirname(__file__))
import _ref_import

_ref_import.install_stubs()

import numpy as np
import torch

from diffsynth.models.wan_video_vae import VideoVAE38_, WanVideoVAE38

torch.manual_seed(7)

m = VideoVAE38_(dim=8, z_dim=4, dec_dim=8, num_res_blocks=1).eval()
out = {}
for k, v in m.state_dict().items():
    out[f"sd::{k}"] = v.float().numpy()

mean = WanVideoVAE38().mean[:4]
std = WanVideoVAE38().std[:4]
scale = [mean, 1.0 / std]

x = torch.randn(1, 3, 9, 32, 32).clamp(-1, 1)
with torch.no_grad():
    z = m.encode(x, scale)
    dec = m.decode(z, scale)

out["x"] = x.numpy()
out["z"] = z.numpy()
out["dec"] = dec.numpy()

# A second decode from pure-noise latents (checks decode independently)
torch.manual_seed(8)
z2 = torch.randn(1, 4, 3, 2, 2)
with torch.no_grad():
    dec2 = m.decode(z2, scale)
out["z2"] = z2.numpy()
out["dec2"] = dec2.numpy()

np.savez_compressed("tests/goldens/wan_vae.npz", **out)
print("wrote", len(out), "arrays; z", z.shape, "dec", dec.shape)
