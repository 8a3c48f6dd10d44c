"""Goldens for the animate adapter components (tiny dims where the classes
allow; weights rounded to fp16 to keep the archive small)."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import _ref_import
_ref_import.install_stubs()
import numpy as np, torch
from einops import rearrange
from diffsynth.models.wan_video_animate_adapter import (
    FaceBlock, FaceEncoder, Generator,
)

torch.manual_seed(121)
out = {}


def round_fp16(model):
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(p.half().float())


# --- Generator.get_motion (StyleGAN-ish motion encoder), size 8
gen = Generator(size=8, style_dim=64, motion_dim=8).eval()
round_fp16(gen)
for k, v in gen.state_dict().items():
    out[f"gen::{k}"] = v.float().half().numpy()
img = torch.randn(3, 3, 8, 8)
with torch.no_grad():
    motion = gen.get_motion(img)
out["gen_img"] = img.numpy()
out["gen_motion"] = motion.numpy()

# --- FaceEncoder (512 -> hidden 96, heads 2)
fe = FaceEncoder(in_dim=512, hidden_dim=96, num_heads=2).eval()
round_fp16(fe)
for k, v in fe.state_dict().items():
    out[f"fe::{k}"] = v.float().half().numpy()
mv = torch.randn(1, 14, 512)
with torch.no_grad():
    enc = fe(mv)
out["fe_in"] = mv.numpy()
out["fe_out"] = enc.numpy()

# --- FaceBlock (hidden 96, heads 4)
fb = FaceBlock(96, 4).eval()
round_fp16(fb)
for k, v in fb.state_dict().items():
    out[f"fb::{k}"] = v.float().half().numpy()
x = torch.randn(1, 3 * 16, 96)  # 3 frames x 16 tokens
mvec = torch.randn(1, 3, 5, 96)
with torch.no_grad():
    res = fb(x, mvec)
out["fb_x"] = x.numpy()
out["fb_mvec"] = mvec.numpy()
out["fb_out"] = res.numpy()

np.savez_compressed("tests/goldens/wan_animate.npz", **out)
print("wrote", len(out), "motion", motion.shape, "enc", enc.shape, "res", res.shape)
