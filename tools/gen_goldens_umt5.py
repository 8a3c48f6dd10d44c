"""Golden data for the UMT5 text encoder (tiny random-init reference)."""
import sys, os

sys.path.insert(0, os.path.dirname(__file__))
import _ref_import

_ref_import.install_stubs()

import numpy as np
import torch

from diffsynth.models.wan_video_text_encoder import WanTextEncoder

torch.manual_seed(3)
m = WanTextEncoder(
    vocab=128, dim=32, dim_attn=32, dim_ffn=48, num_heads=4, num_layers=2,
    num_buckets=32, shared_pos=False, dropout=0.0,
).eval()

out = {}
for k, v in m.state_dict().items():
    out[f"sd::{k}"] = v.float().numpy()

ids = torch.randint(0, 128, (2, 24))
mask = torch.ones(2, 24, dtype=torch.long)
mask[0, 17:] = 0
mask[1, 9:] = 0
with torch.no_grad():
    emb = m(ids, mask)
out["ids"] = ids.numpy()
out["mask"] = mask.numpy()
out["emb"] = emb.numpy()

np.savez_compressed("tests/goldens/umt5.npz", **out)
print("wrote", len(out), "arrays; emb", emb.shape)
