"""Z-Image text-encoder goldens vs transformers Qwen3Model (the reference
ZImageTextEncoder wraps it directly); the conditioning tensor is
hidden_states[-2] (z_image.py:189).  python tools/gen_goldens_z_image_text.py"""
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import torch  # noqa: E402
from transformers import Qwen3Config, Qwen3Model  # noqa: E402


def main():
    torch.manual_seed(0)
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, rope_theta=1000000.0,
        rms_norm_eps=1e-6, attention_bias=False, tie_word_embeddings=False,
    )
    m = Qwen3Model(cfg).eval()
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
    out = hs[-2]  # penultimate (input of the last decoder layer)

    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    np.savez("../tests/goldens/z_image_text.npz",
             ids=ids.numpy(), mask=mask.numpy(), out=out.numpy(),
             **{f"sd.{k}": v for k, v in sd.items()})
    print("wrote tests/goldens/z_image_text.npz", out.shape)


if __name__ == "__main__":
    main()
