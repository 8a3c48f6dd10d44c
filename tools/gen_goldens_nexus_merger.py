"""NexusGen editing-merger goldens: tiny hand-assembled reference
NexusGenImageEmbeddingMerger (its ctor hard-codes the 3584-wide Qwen2.5-VL
config) driven with target + reference embeddings.
python tools/gen_goldens_nexus_merger.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.nexus_gen_projector import (  # noqa: E402
    NexusGenImageEmbeddingMerger,
    Qwen2RMSNorm,
    Qwen2_5_VLDecoderLayer,
    Qwen2_5_VLRotaryEmbedding,
)

HIDDEN, OUT, EXPAND = 32, 48, 2


def main():
    from transformers import Qwen2_5_VLConfig

    torch.manual_seed(97)
    cfg = Qwen2_5_VLConfig(
        hidden_size=HIDDEN, num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, rms_norm_eps=1e-6, rope_theta=1e6,
        rope_scaling={"mrope_section": [2, 1, 1], "rope_type": "default",
                      "type": "default"},
        vision_config={"hidden_size": 16, "spatial_patch_size": 14,
                       "tokens_per_second": 2})
    m = NexusGenImageEmbeddingMerger.__new__(NexusGenImageEmbeddingMerger)
    torch.nn.Module.__init__(m)
    m.config = cfg
    m.num_layers = 1
    m.layers = torch.nn.ModuleList([Qwen2_5_VLDecoderLayer(cfg, 0)])
    m.projector = torch.nn.Sequential(
        Qwen2RMSNorm(HIDDEN, eps=cfg.rms_norm_eps),
        torch.nn.Linear(HIDDEN, OUT * EXPAND),
        Qwen2RMSNorm(OUT * EXPAND, eps=cfg.rms_norm_eps),
        torch.nn.SiLU(),
        torch.nn.Linear(OUT * EXPAND, OUT),
        Qwen2RMSNorm(OUT, eps=cfg.rms_norm_eps),
    )
    m.base_grid = torch.tensor([[1, 72, 72]])
    m.rotary_emb = Qwen2_5_VLRotaryEmbedding(config=cfg)
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    m.eval()

    g = torch.Generator().manual_seed(101)
    embeds = torch.randn(1, 9, HIDDEN, generator=g)  # 6x6 grid merged 2x2
    ref = torch.randn(1, 16, HIDDEN, generator=g)  # 8x8 grid merged 2x2
    grid = torch.tensor([[1, 6, 6]])
    ref_grid = torch.tensor([[1, 8, 8]])
    with torch.no_grad():
        out = m(embeds, grid, ref, ref_grid)
        out_t2i = m(embeds, grid)

    sd = {f"mg.{k}": v.numpy() for k, v in m.state_dict().items()}
    np.savez("../tests/goldens/nexus_merger.npz",
             embeds=embeds.numpy(), ref=ref.numpy(), out=out.numpy(),
             out_t2i=out_t2i.numpy(), **sd)
    print("wrote tests/goldens/nexus_merger.npz", out.shape)


if __name__ == "__main__":
    main()
