"""Qwen2.5-VL vision tower goldens vs transformers (tiny config with a
non-trivial window partition incl. a padded-window case).
python tools/gen_goldens_qwen_vision.py"""
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import torch  # noqa: E402
from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (  # noqa: E402
    Qwen2_5_VisionTransformerPretrainedModel,
)
from transformers.models.qwen2_5_vl import (  # noqa: E402
    Qwen2_5_VLConfig,
)


def main():
    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=3, hidden_size=32, num_heads=4, intermediate_size=40,
            out_hidden_size=48, patch_size=2, temporal_patch_size=2,
            spatial_merge_size=2, window_size=8, fullatt_block_indexes=[1],
            in_channels=3,
        )
    ).vision_config
    m = Qwen2_5_VisionTransformerPretrainedModel._from_config(cfg).eval()
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    g = torch.Generator().manual_seed(1)
    # image A: 8x8 patch grid (exact windows); image B: 6x8 (padded window)
    grid = torch.tensor([[1, 8, 8], [1, 6, 8]])
    L = int((grid[:, 0] * grid[:, 1] * grid[:, 2]).sum())
    patches = torch.randn(L, 3 * 2 * 2 * 2, generator=g)
    with torch.no_grad():
        out = m(patches, grid_thw=grid)

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    np.savez("../tests/goldens/qwen_vision.npz",
             patches=patches.numpy(), grid=grid.numpy(), out=out.numpy(),
             **{f"sd.{k}": v for k, v in sd.items()})
    print("wrote tests/goldens/qwen_vision.npz", out.shape)


if __name__ == "__main__":
    main()
