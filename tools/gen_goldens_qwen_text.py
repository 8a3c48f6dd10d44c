"""Qwen2.5-VL text-encoder goldens vs transformers (the reference
QwenImageTextEncoder subclasses Qwen2_5_VLModel directly).
python tools/gen_goldens_qwen_text.py"""
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import torch  # noqa: E402
from transformers import Qwen2_5_VLConfig, Qwen2_5_VLModel  # noqa: E402


def main():
    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=1000000.0, rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 1, 1]},
        vision_config={"depth": 2, "hidden_size": 16, "intermediate_size": 16,
                       "num_heads": 2, "out_hidden_size": 32, "patch_size": 14,
                       "temporal_patch_size": 2, "spatial_merge_size": 2},
    )
    m = Qwen2_5_VLModel(cfg).eval()
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    g = torch.Generator().manual_seed(1)
    ids = torch.randint(0, 128, (2, 9), generator=g)
    mask = torch.ones(2, 9, dtype=torch.long)
    mask[1, 6:] = 0
    with torch.no_grad():
        hs = m(input_ids=ids, attention_mask=mask,
               output_hidden_states=True).hidden_states
    out = hs[-1]
    h1 = hs[1]

    sd = {k: v.numpy() for k, v in m.state_dict().items()
          if "visual" not in k}
    np.savez("../tests/goldens/qwen_text.npz",
             ids=ids.numpy(), mask=mask.numpy(), out=out.numpy(),
             h1=h1.numpy(),
             **{f"sd.{k}": v for k, v in sd.items()})
    print("wrote tests/goldens/qwen_text.npz", out.shape)


if __name__ == "__main__":
    main()
