"""Goldens for the metric battery: CLIP vision tower (vs transformers
CLIPVisionModelWithProjection), CLIPScore composition, and LPIPS-squeeze
(vs an independent torch implementation of the published architecture,
since the lpips/torchvision packages are not installed here)."""
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

out = {}
torch.manual_seed(7)

# ---------------------------------------------------------------- CLIP vision
from transformers import CLIPVisionModelWithProjection, CLIPVisionConfig

vcfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        image_size=32, patch_size=8, projection_dim=16)
vm = CLIPVisionModelWithProjection(vcfg).eval()
for k, v in vm.state_dict().items():
    out[f"cv::{k}"] = v.float().numpy()
rs = np.random.RandomState(0)
pix = rs.randn(2, 3, 32, 32).astype(np.float32)
with torch.no_grad():
    emb = vm(pixel_values=torch.tensor(pix)).image_embeds
out["cv_pix"] = pix
out["cv_emb"] = emb.numpy()

# CLIPScore composition golden: cos similarity * 100, clamped at 0
txt = rs.randn(2, 16).astype(np.float32)
a = emb.numpy() / np.linalg.norm(emb.numpy(), axis=-1, keepdims=True)
b = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
out["cs_txt"] = txt
out["cs_score"] = np.maximum(100.0 * (a * b).sum(-1), 0.0)


# ---------------------------------------------------------------- LPIPS squeeze
class Fire(nn.Module):
    def __init__(self, cin, squeeze, expand):
        super().__init__()
        self.squeeze = nn.Conv2d(cin, squeeze, 1)
        self.expand1x1 = nn.Conv2d(squeeze, expand, 1)
        self.expand3x3 = nn.Conv2d(squeeze, expand, 3, padding=1)

    def forward(self, x):
        s = F.relu(self.squeeze(x))
        return torch.cat([F.relu(self.expand1x1(s)),
                          F.relu(self.expand3x3(s))], 1)


class SqueezeSlices(nn.Module):
    """torchvision squeezenet1_1 features grouped per the lpips slices,
    keeping the ORIGINAL feature indices as child names so the state dict
    matches lpips.LPIPS(net='squeeze')."""

    def __init__(self):
        super().__init__()
        def seq(mods):  # dict with original indices as names
            s = nn.Sequential()
            for idx, m in mods:
                s.add_module(str(idx), m)
            return s

        self.slice1 = seq([(0, nn.Conv2d(3, 64, 3, stride=2)), (1, nn.ReLU())])
        self.slice2 = seq([(2, nn.MaxPool2d(3, 2, ceil_mode=True)),
                           (3, Fire(64, 16, 64)), (4, Fire(128, 16, 64))])
        self.slice3 = seq([(5, nn.MaxPool2d(3, 2, ceil_mode=True)),
                           (6, Fire(128, 32, 128)), (7, Fire(256, 32, 128))])
        self.slice4 = seq([(8, nn.MaxPool2d(3, 2, ceil_mode=True)),
                           (9, Fire(256, 48, 192))])
        self.slice5 = seq([(10, Fire(384, 48, 192))])
        self.slice6 = seq([(11, Fire(384, 64, 256))])
        self.slice7 = seq([(12, Fire(512, 64, 256))])

    def forward(self, x):
        feats = []
        for k in range(1, 8):
            x = getattr(self, f"slice{k}")(x)
            feats.append(x)
        return feats


class LPIPSTorch(nn.Module):
    SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    CH = [64, 128, 256, 384, 384, 512, 512]

    def __init__(self):
        super().__init__()
        self.net = SqueezeSlices()
        for k, c in enumerate(self.CH):
            lin = nn.Sequential(nn.Dropout(), nn.Conv2d(c, 1, 1, bias=False))
            with torch.no_grad():
                lin[1].weight.abs_()
            setattr(self, f"lin{k}", lin)
        self.eval()

    def forward(self, a, b):
        a = (a - self.SHIFT) / self.SCALE
        b = (b - self.SHIFT) / self.SCALE
        fa, fb = self.net(a), self.net(b)
        total = 0
        for k, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (xa.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            nb = xb / (xb.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            d = (na - nb) ** 2
            w = getattr(self, f"lin{k}")[1]
            total = total + w(d).mean(dim=(2, 3))
        return total.squeeze(1)


lp = LPIPSTorch()
# include the lpips-package extra keys so the converter sees the real layout
sd = {f"{k}": v for k, v in lp.state_dict().items()}
sd["scaling_layer.shift"] = lp.SHIFT.reshape(1, 3, 1, 1)
sd["scaling_layer.scale"] = lp.SCALE.reshape(1, 3, 1, 1)
for k, v in sd.items():
    out[f"lp::{k}"] = v.float().numpy()
img_a = (rs.rand(2, 3, 64, 64) * 2 - 1).astype(np.float32)
img_b = np.clip(img_a + rs.randn(2, 3, 64, 64).astype(np.float32) * 0.2, -1, 1)
with torch.no_grad():
    dist = lp(torch.tensor(img_a), torch.tensor(img_b))
out["lp_a"] = img_a
out["lp_b"] = img_b
out["lp_dist"] = dist.numpy()

np.savez_compressed("tests/goldens/metrics.npz", **out)
print("wrote", len(out), "arrays; lpips dist", dist.numpy())
