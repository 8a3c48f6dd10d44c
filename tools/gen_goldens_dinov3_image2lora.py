"""DINOv3 + Qwen Image2LoRA goldens.

DINOv3: tiny transformers DINOv3ViTModel (the reference wrapper's base
class).  Image2LoRA: tiny hand-assembled QwenImageImage2LoRAModel (its
ctor hard-codes in_dim/3072 dims) driven directly + merge_lora.
python tools/gen_goldens_dinov3_image2lora.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402


def gen_dinov3():
    from transformers import DINOv3ViTModel
    from transformers.models.dinov3_vit.modeling_dinov3_vit import (
        DINOv3ViTConfig,
    )

    torch.manual_seed(71)
    cfg = DINOv3ViTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        num_register_tokens=4, hidden_act="silu", use_gated_mlp=True,
        rope_theta=100.0, query_bias=False, key_bias=False,
        value_bias=False, proj_bias=True, mlp_bias=True,
        layerscale_value=1.0, pos_embed_rescale=2.0)
    model = DINOv3ViTModel(cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    g = torch.Generator().manual_seed(73)
    pixels = torch.randn(2, 3, 32, 32, generator=g)
    with torch.no_grad():
        out = model(pixel_values=pixels)
    sd = {f"dv.{k}": v.numpy() for k, v in model.state_dict().items()}
    return dict(pixels=pixels.numpy(),
                tokens=out.last_hidden_state.numpy(),
                pooled=out.pooler_output.numpy(), **sd)


def gen_image2lora():
    from diffsynth.models.qwen_image_image2lora import (
        LoRATrainerBlock,
        QwenImageImage2LoRAModel,
    )
    from diffsynth.utils.lora.merge import merge_lora

    DIM, IN, COMP, RANK = 96, 24, 8, 2
    RES_L, RES_D, RES_M = 3, 16, 4
    patterns = [
        [("attn.to_q", DIM, DIM), ("attn.to_k", DIM, DIM),
         ("attn.to_v", DIM, DIM), ("attn.to_out.0", DIM, DIM)],
        [("img_mlp.net.2", DIM * 4, DIM), ("img_mod.1", DIM, DIM * 6)],
        [("attn.add_q_proj", DIM, DIM), ("attn.add_k_proj", DIM, DIM),
         ("attn.add_v_proj", DIM, DIM), ("attn.to_add_out", DIM, DIM)],
        [("txt_mlp.net.2", DIM * 4, DIM), ("txt_mod.1", DIM, DIM * 6)],
    ]
    torch.manual_seed(79)
    m = QwenImageImage2LoRAModel.__new__(QwenImageImage2LoRAModel)
    torch.nn.Module.__init__(m)
    m.lora_patterns = patterns
    m.num_blocks = 2
    blocks = []
    for pats in patterns:
        for b in range(2):
            blocks.append(LoRATrainerBlock(
                pats, in_dim=IN, compress_dim=COMP, rank=RANK, block_id=b,
                use_residual=True, residual_length=RES_L, residual_dim=RES_D,
                residual_mid_dim=RES_M))
    m.blocks = torch.nn.ModuleList(blocks)
    m.residual_scale = 0.05
    m.use_residual = True
    with torch.no_grad():
        for p in m.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    m.eval()

    g = torch.Generator().manual_seed(83)
    x = torch.randn(1, IN, generator=g)
    residual = torch.randn(1, RES_L * RES_D, generator=g)
    with torch.no_grad():
        lora1 = m(x, residual)
        lora2 = m(x * 0.5, residual)
        merged = merge_lora([lora1, lora2], alpha=0.5)
    out = {"x": x.numpy(), "residual": residual.numpy()}
    out.update({f"l1.{k}": v.numpy() for k, v in lora1.items()})
    out.update({f"mg.{k}": v.numpy() for k, v in merged.items()})
    out.update({f"i2l.{k}": v.numpy() for k, v in m.state_dict().items()})
    return out


def main():
    out = gen_dinov3()
    out.update(gen_image2lora())
    np.savez("../tests/goldens/dinov3_image2lora.npz", **out)
    print("wrote tests/goldens/dinov3_image2lora.npz")


if __name__ == "__main__":
    main()
