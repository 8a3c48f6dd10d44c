"""SigLIP vision-tower goldens vs transformers SiglipVisionModel (the
reference's SiglipVisionModelSO400M / Siglip2ImageEncoder are thin
wrappers over it — flux_ipadapter.py:6-21, siglip2_image_encoder.py).
python tools/gen_goldens_siglip.py
"""
import numpy as np
import torch
from transformers import SiglipVisionConfig, SiglipVisionModel


def main():
    torch.manual_seed(0)
    cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="gelu_pytorch_tanh")
    model = SiglipVisionModel(cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    g = torch.Generator().manual_seed(3)
    pixels = torch.randn(2, 3, 28, 28, generator=g)
    # non-multiple-of-patch size: the valid-stride conv drops the last
    # 2 rows/cols (the so400m 384/14 case that the pipeline feeds)
    pixels_odd = torch.randn(1, 3, 30, 30, generator=g)
    with torch.no_grad():
        out = model(pixel_values=pixels)
        out_odd = model(pixel_values=pixels_odd, interpolate_pos_encoding=False)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez("../tests/goldens/siglip.npz",
             pixels=pixels.numpy(),
             pooler=out.pooler_output.numpy(),
             tokens=out.last_hidden_state.numpy(),
             pixels_odd=pixels_odd.numpy(),
             pooler_odd=out_odd.pooler_output.numpy(),
             tokens_odd=out_odd.last_hidden_state.numpy(),
             **{f"sd.{k}": v for k, v in sd.items()})
    print("wrote tests/goldens/siglip.npz", out.pooler_output.shape)


if __name__ == "__main__":
    main()
