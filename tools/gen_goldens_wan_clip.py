"""Golden for the ViT image encoder (tiny VisionTransformer, use_31_block)."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import _ref_import
_ref_import.install_stubs()
import numpy as np, torch
from diffsynth.models.wan_video_image_encoder import VisionTransformer

torch.manual_seed(61)
m = VisionTransformer(image_size=28, patch_size=14, dim=32, mlp_ratio=4,
                      out_dim=16, num_heads=4, num_layers=3, pool_type="token",
                      pre_norm=True, activation="gelu").eval()
out = {}
for k, v in m.state_dict().items():
    out[f"sd::{k}"] = v.float().numpy()
x = torch.randn(2, 3, 28, 28)
with torch.no_grad():
    o = m(x, use_31_block=True)
out["x"] = x.numpy()
out["o"] = o.numpy()
np.savez_compressed("tests/goldens/wan_clip.npz", **out)
print("wrote", len(out), "o", o.shape)
