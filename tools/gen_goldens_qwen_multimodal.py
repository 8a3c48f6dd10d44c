"""Qwen2.5-VL multimodal goldens vs transformers: an image in the prompt
through the vision tower + mRoPE positions + embedding splice — the
Qwen-Image-Edit conditioning path.  python tools/gen_goldens_qwen_multimodal.py"""
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import torch  # noqa: E402
from transformers import Qwen2_5_VLConfig, Qwen2_5_VLModel  # noqa: E402

IMG, VSTART, VEND = 151655, 151652, 151653


def main():
    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        vocab_size=151700, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, rope_theta=1000000.0,
        rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        vision_config=dict(
            depth=2, hidden_size=16, num_heads=2, intermediate_size=24,
            out_hidden_size=32, patch_size=2, temporal_patch_size=2,
            spatial_merge_size=2, window_size=8, fullatt_block_indexes=[1],
            in_channels=3,
        ),
    )
    m = Qwen2_5_VLModel(cfg).eval()
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    g = torch.Generator().manual_seed(1)
    # image: 1x8x8 patch grid -> 16 merged tokens in the LLM sequence
    grid = torch.tensor([[1, 8, 8]])
    patches = torch.randn(64, 3 * 2 * 2 * 2, generator=g)
    prefix = torch.randint(0, 1000, (4,), generator=g)
    suffix = torch.randint(0, 1000, (5,), generator=g)
    ids = torch.cat([prefix, torch.tensor([VSTART]),
                     torch.full((16,), IMG), torch.tensor([VEND]), suffix])
    ids = ids[None]

    # TWO images in one prompt ("Picture i:" multi-edit layout):
    # an 8x8 grid (16 merged tokens) and a 4x4 grid (4 merged tokens)
    grid2 = torch.tensor([[1, 8, 8], [1, 4, 4]])
    patches2 = torch.cat([patches,
                          torch.randn(16, 3 * 2 * 2 * 2, generator=g)])
    mid = torch.randint(0, 1000, (3,), generator=g)
    ids2 = torch.cat([prefix, torch.tensor([VSTART]),
                      torch.full((16,), IMG), torch.tensor([VEND]), mid,
                      torch.tensor([VSTART]), torch.full((4,), IMG),
                      torch.tensor([VEND]), suffix])[None]

    with torch.no_grad():
        out = m(input_ids=ids, pixel_values=patches, image_grid_thw=grid,
                output_hidden_states=True).hidden_states[-1]
        vis = m.visual(patches, grid_thw=grid)
        out2 = m(input_ids=ids2, pixel_values=patches2,
                 image_grid_thw=grid2,
                 output_hidden_states=True).hidden_states[-1]
        vis2 = m.visual(patches2, grid_thw=grid2)

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    np.savez("../tests/goldens/qwen_multimodal.npz",
             ids=ids.numpy(), patches=patches.numpy(), grid=grid.numpy(),
             out=out.numpy(), vis=vis.numpy(),
             ids2=ids2.numpy(), patches2=patches2.numpy(),
             grid2=grid2.numpy(), out2=out2.numpy(), vis2=vis2.numpy(),
             **{f"sd.{k}": v for k, v in sd.items()})
    print("wrote tests/goldens/qwen_multimodal.npz", out.shape, vis.shape)


if __name__ == "__main__":
    main()
