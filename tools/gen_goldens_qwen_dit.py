"""Qwen-Image DiT goldens: tiny hand-assembled QwenImageDiT (the class
hard-codes dim 3072, qwen_image_dit.py:551-582) driven through the REAL
forward, model_fn_qwen_image.  python tools/gen_goldens_qwen_dit.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.general_modules import (  # noqa: E402
    AdaLayerNorm,
    RMSNorm,
    TimestepEmbeddings,
)
from diffsynth.models.qwen_image_dit import (  # noqa: E402
    QwenEmbedRope,
    QwenImageDiT,
    QwenImageTransformerBlock,
)
from diffsynth.pipelines.qwen_image import model_fn_qwen_image  # noqa: E402

DIM, HEADS, HEAD_DIM = 96, 4, 24
IN_DIM, TXT_DIM, FREQ = 16, 48, 32


def build_tiny(seed=0):
    torch.manual_seed(seed)
    dit = QwenImageDiT.__new__(QwenImageDiT)
    torch.nn.Module.__init__(dit)
    dit.pos_embed = QwenEmbedRope(theta=10000, axes_dim=[4, 10, 10],
                                  scale_rope=True)
    dit.time_text_embed = TimestepEmbeddings(
        FREQ, DIM, diffusers_compatible_format=True, scale=1000)
    dit.txt_norm = RMSNorm(TXT_DIM, eps=1e-6)
    dit.img_in = torch.nn.Linear(IN_DIM, DIM)
    dit.txt_in = torch.nn.Linear(TXT_DIM, DIM)
    dit.transformer_blocks = torch.nn.ModuleList(
        [QwenImageTransformerBlock(DIM, HEADS, HEAD_DIM) for _ in range(2)])
    dit.norm_out = AdaLayerNorm(DIM, single=True)
    dit.proj_out = torch.nn.Linear(DIM, IN_DIM)
    with torch.no_grad():
        for p in dit.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    return dit.eval()


def main():
    dit = build_tiny()
    g = torch.Generator().manual_seed(5)
    lat = torch.randn(1, 4, 8, 12, generator=g)
    prompt_emb = torch.randn(1, 6, TXT_DIM, generator=g)
    mask = torch.ones(1, 6, dtype=torch.long)
    ts = torch.tensor([614.0])

    with torch.no_grad():
        out = model_fn_qwen_image(
            dit=dit, latents=lat, timestep=ts, prompt_emb=prompt_emb,
            prompt_emb_mask=mask, height=64, width=96,
        )
        edit = torch.randn(1, 4, 4, 6, generator=g)
        out_edit = model_fn_qwen_image(
            dit=dit, latents=lat, timestep=ts, prompt_emb=prompt_emb,
            prompt_emb_mask=mask, height=64, width=96,
            edit_latents=[edit],
        )

    sd = {k: v.numpy() for k, v in dit.state_dict().items()
          if "pos_embed" not in k}
    np.savez(
        "../tests/goldens/qwen_dit.npz",
        latents=lat.numpy(), timestep=ts.numpy(),
        prompt_emb=prompt_emb.numpy(), out=out.numpy(),
        edit=edit.numpy(), out_edit=out_edit.numpy(),
        **{f"sd.{k}": v for k, v in sd.items()},
    )
    print("wrote tests/goldens/qwen_dit.npz", out.shape, out_edit.shape)


if __name__ == "__main__":
    main()
