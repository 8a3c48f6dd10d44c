"""End-to-end golden for the TI2V pipeline denoise loop: tiny reference
DiT + VAE38, manual loop replicating WanVideoPipeline.__call__ denoise
(reference wan_video.py:282-329) with fused first-frame conditioning.
"""
import sys, os

sys.path.insert(0, os.path.dirname(__file__))
import _ref_import

_ref_import.install_stubs()

import numpy as np
import torch

from diffsynth.models.wan_video_dit import WanModel
from diffsynth.models.wan_video_vae import VideoVAE38_, WanVideoVAE38
from diffsynth.pipelines.wan_video import model_fn_wan_video
from diffsynth.diffusion.flow_match import FlowMatchScheduler

torch.manual_seed(11)
out = {}

dit = WanModel(
    dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
    eps=1e-6, patch_size=(1, 2, 2), num_heads=4, num_layers=2,
    has_image_input=False, seperated_timestep=True,
    require_clip_embedding=False, require_vae_embedding=False,
    fuse_vae_embedding_in_latents=True,
).eval()
vae = VideoVAE38_(dim=8, z_dim=4, dec_dim=8, num_res_blocks=1).eval()
for k, v in dit.state_dict().items():
    out[f"dit::{k}"] = v.float().numpy()
for k, v in vae.state_dict().items():
    out[f"vae::{k}"] = v.float().numpy()

mean = WanVideoVAE38().mean[:4]
std = WanVideoVAE38().std[:4]
scale = [mean, 1.0 / std]

H = W = 32
F = 9
ctx_p = torch.randn(1, 12, 32)
ctx_n = torch.randn(1, 12, 32)
img_uint8 = np.random.RandomState(5).randint(0, 256, (H, W, 3), dtype=np.uint8)
img = torch.tensor(img_uint8.astype(np.float32)) * (2.0 / 255.0) - 1.0
img = img.permute(2, 0, 1)[None, :, None]  # 1 C 1 H W

sched = FlowMatchScheduler("Wan")
sched.set_timesteps(4, shift=5.0)

g = torch.Generator("cpu").manual_seed(42)
noise = torch.randn(1, 4, 3, 2, 2, generator=g, dtype=torch.float32)

with torch.no_grad():
    z = vae.encode(img, scale)
    latents = noise.clone()
    latents[:, :, 0:1] = z
    cfg_scale = 5.0
    for i, t in enumerate(sched.timesteps):
        ts = t.unsqueeze(0)
        posi = model_fn_wan_video(dit=dit, latents=latents, timestep=ts,
                                  context=ctx_p, fuse_vae_embedding_in_latents=True)
        nega = model_fn_wan_video(dit=dit, latents=latents, timestep=ts,
                                  context=ctx_n, fuse_vae_embedding_in_latents=True)
        pred = nega + cfg_scale * (posi - nega)
        latents = sched.step(pred, sched.timesteps[i], latents)
        latents[:, :, 0:1] = z
    video = vae.decode(latents, scale).clamp_(-1, 1)

out["ctx_p"] = ctx_p.numpy()
out["ctx_n"] = ctx_n.numpy()
out["img_uint8"] = img_uint8
out["noise"] = noise.numpy()
out["z_first"] = z.numpy()
out["latents_final"] = latents.numpy()
out["video"] = video.numpy()

np.savez_compressed("tests/goldens/wan_pipeline.npz", **out)
print("wrote", len(out), "arrays; video", video.shape)
