"""Goldens: camera plücker geometry + SimpleAdapter forward."""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import _ref_import
_ref_import.install_stubs()
import numpy as np, torch
from diffsynth.models.wan_video_camera_controller import (
    SimpleAdapter, generate_camera_coordinates, process_pose_file)

torch.manual_seed(91)
out = {}
coords = generate_camera_coordinates("LeftUp", 5, 1/54)
out["coords"] = np.array(coords, np.float64)
pl = process_pose_file(coords, width=32, height=16)
out["plucker"] = pl.numpy() if hasattr(pl, "numpy") else np.asarray(pl)

ad = SimpleAdapter(6, 32, kernel_size=(2, 2), stride=(2, 2), num_residual_blocks=1).eval()
for k, v in ad.state_dict().items():
    out[f"sd::{k}"] = v.float().numpy()
x = torch.randn(1, 6, 3, 32, 32)
with torch.no_grad():
    o = ad(x)
out["x"] = x.numpy()
out["o"] = o.numpy()
np.savez_compressed("tests/goldens/wan_camera.npz", **out)
print("wrote", len(out), "plucker", out["plucker"].shape, "o", o.shape)
