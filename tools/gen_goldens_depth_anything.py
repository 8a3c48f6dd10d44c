"""Golden fixtures for the Depth-Anything port: drives transformers' torch
DepthAnythingForDepthEstimation on a tiny random-init config and records
state dict + inputs + outputs (native grid AND an interpolated-pos-emb
rectangular size).

PYTHONPATH=/root/repo python tools/gen_goldens_depth_anything.py
"""
import numpy as np
import torch
from transformers import (DepthAnythingConfig, DepthAnythingForDepthEstimation,
                          Dinov2Config)

OUT = "tests/goldens/depth_anything.npz"


def main():
    torch.manual_seed(7)
    bc = Dinov2Config(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=64, patch_size=14, image_size=56,
        out_indices=[1, 2, 3, 4], apply_layernorm=True,
        reshape_hidden_states=False)
    cfg = DepthAnythingConfig(
        backbone_config=bc, reassemble_hidden_size=32, fusion_hidden_size=16,
        neck_hidden_sizes=[8, 8, 16, 16], head_hidden_size=8, patch_size=14,
        reassemble_factors=[4, 2, 1, 0.5])
    m = DepthAnythingForDepthEstimation(cfg).eval()

    x_native = torch.randn(2, 3, 56, 56)
    x_rect = torch.randn(1, 3, 70, 84)  # pos-emb bicubic interpolation path
    with torch.no_grad():
        d_native = m(x_native).predicted_depth
        d_rect = m(x_rect).predicted_depth

    payload = {
        "x_native": x_native.numpy(), "d_native": d_native.numpy(),
        "x_rect": x_rect.numpy(), "d_rect": d_rect.numpy(),
    }
    for k, v in m.state_dict().items():
        payload["sd::" + k] = v.numpy()
    np.savez_compressed(OUT, **payload)
    print(f"wrote {OUT}: native {tuple(d_native.shape)}, "
          f"rect {tuple(d_rect.shape)}")


if __name__ == "__main__":
    main()
