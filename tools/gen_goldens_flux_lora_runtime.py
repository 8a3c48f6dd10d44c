"""FluxLoRAEncoder + LoraMerger goldens: tiny hand-assembled encoder
(default patterns hard-code 3072/19/38 — rebuilt at 96/2/2 matching
FluxDiTConfig.tiny) and a direct LoraMerger instance.
python tools/gen_goldens_flux_lora_runtime.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.flux_lora_encoder import (  # noqa: E402
    CLIPEncoderLayer,
    FluxLoRAEncoder,
    LoRAEmbedder,
)
from diffsynth.models.flux_lora_patcher import LoraMerger  # noqa: E402

DIM, EMBED, RANK, L = 96, 64, 2, 4

DOUBLE = {"attn.a_to_qkv": (96, 288), "attn.a_to_out": (96, 96),
          "ff_a.0": (96, 384), "ff_a.2": (384, 96),
          "norm1_a.linear": (96, 576),
          "attn.b_to_qkv": (96, 288), "attn.b_to_out": (96, 96),
          "ff_b.0": (96, 384), "ff_b.2": (384, 96),
          "norm1_b.linear": (96, 576)}
SINGLE = {"to_qkv_mlp": (96, 672), "proj_out": (480, 96),
          "norm.linear": (96, 288)}


def tiny_patterns():
    pats = []
    for i in range(2):
        for s, d in DOUBLE.items():
            pats.append({"name": f"blocks.{i}.{s}", "dim": d, "type": s})
    for i in range(2):
        for s, d in SINGLE.items():
            pats.append({"name": f"single_blocks.{i}.{s}", "dim": d,
                         "type": s})
    return pats


def main():
    torch.manual_seed(59)
    enc = FluxLoRAEncoder.__new__(FluxLoRAEncoder)
    torch.nn.Module.__init__(enc)
    enc.num_embeds_per_lora = L
    enc.embedder = LoRAEmbedder(lora_patterns=tiny_patterns(), L=L,
                                out_dim=EMBED)
    enc.encoders = torch.nn.ModuleList(
        [CLIPEncoderLayer(EMBED, 2 * EMBED, num_heads=4, head_dim=16)])
    enc.special_embeds = torch.nn.Parameter(torch.randn(1, 1, EMBED))
    enc.num_special_embeds = 1
    enc.final_layer_norm = torch.nn.LayerNorm(EMBED)
    enc.final_linear = torch.nn.Linear(EMBED, EMBED)
    with torch.no_grad():
        for p in enc.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    enc.eval()

    g = torch.Generator().manual_seed(61)
    lora = {}
    for pat in tiny_patterns():
        din, dout = pat["dim"]
        lora[pat["name"] + ".lora_A.weight"] = torch.randn(
            RANK, din, generator=g) * 0.1
        lora[pat["name"] + ".lora_B.weight"] = torch.randn(
            dout, RANK, generator=g) * 0.1
    with torch.no_grad():
        emb = enc(lora)

    merger = LoraMerger(16).eval()
    with torch.no_grad():
        for p in merger.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    base = torch.randn(1, 5, 16, generator=g)
    loras = torch.randn(3, 1, 5, 16, generator=g)
    with torch.no_grad():
        merged = merger(base, loras)

    out = {"emb": emb.numpy(), "base": base.numpy(), "loras": loras.numpy(),
           "merged": merged.numpy()}
    out.update({f"enc.{k}": v.numpy() for k, v in enc.state_dict().items()})
    out.update({f"mg.{k}": v.numpy()
                for k, v in merger.state_dict().items()})
    out.update({f"lora.{k}": v.numpy() for k, v in lora.items()})
    np.savez("../tests/goldens/flux_lora_runtime.npz", **out)
    print("wrote tests/goldens/flux_lora_runtime.npz", emb.shape,
          merged.shape)


if __name__ == "__main__":
    main()
