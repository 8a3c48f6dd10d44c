"""Generate FLUX DiT goldens from the reference torch implementation.

The reference FluxDiT hard-codes dim=3072 (flux_dit.py:280-291), so a tiny
model is hand-assembled from its parameterizable sub-modules
(FluxJointTransformerBlock / FluxSingleTransformerBlock / RoPEEmbedding /
TimestepEmbeddings) and driven through the REAL forward,
``model_fn_flux_image`` (pipelines/flux_image.py:1003-1209).

Run at development time only:  python tools/gen_goldens_flux.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402  (tools/_ref_import.py)

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.flux_dit import (  # noqa: E402
    AdaLayerNormContinuous,
    FluxDiT,
    FluxJointTransformerBlock,
    FluxSingleTransformerBlock,
    RoPEEmbedding,
)
from diffsynth.models.general_modules import TimestepEmbeddings  # noqa: E402
from diffsynth.pipelines.flux_image import model_fn_flux_image  # noqa: E402

DIM, HEADS, HEAD_DIM = 96, 4, 24
IN_DIM, CTX_DIM, POOLED_DIM, FREQ_DIM = 16, 48, 32, 32
N_DOUBLE, N_SINGLE = 2, 2


def build_tiny_flux(seed=0):
    torch.manual_seed(seed)
    dit = FluxDiT.__new__(FluxDiT)
    torch.nn.Module.__init__(dit)
    dit.pos_embedder = RoPEEmbedding(HEAD_DIM, 10000, [4, 10, 10])
    dit.time_embedder = TimestepEmbeddings(FREQ_DIM, DIM)
    dit.guidance_embedder = TimestepEmbeddings(FREQ_DIM, DIM)
    dit.pooled_text_embedder = torch.nn.Sequential(
        torch.nn.Linear(POOLED_DIM, DIM), torch.nn.SiLU(),
        torch.nn.Linear(DIM, DIM))
    dit.context_embedder = torch.nn.Linear(CTX_DIM, DIM)
    dit.x_embedder = torch.nn.Linear(IN_DIM, DIM)
    dit.blocks = torch.nn.ModuleList(
        [FluxJointTransformerBlock(DIM, HEADS) for _ in range(N_DOUBLE)])
    dit.single_blocks = torch.nn.ModuleList(
        [FluxSingleTransformerBlock(DIM, HEADS) for _ in range(N_SINGLE)])
    dit.final_norm_out = AdaLayerNormContinuous(DIM)
    dit.final_proj_out = torch.nn.Linear(DIM, IN_DIM)
    dit.input_dim = IN_DIM
    # randomize (default inits leave norms at identity; perturb everything)
    with torch.no_grad():
        for p in dit.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    return dit.eval()


def main():
    dit = build_tiny_flux()
    g = torch.Generator().manual_seed(7)
    B, C, H, W = 1, 4, 8, 12  # C*4 = IN_DIM, tokens = 4*6 = 24
    latents = torch.randn(B, C, H, W, generator=g)
    timestep = torch.tensor([614.0])
    prompt_emb = torch.randn(B, 6, CTX_DIM, generator=g)
    pooled = torch.randn(B, POOLED_DIM, generator=g)
    guidance = torch.tensor([3.5])
    text_ids = torch.zeros(B, 6, 3)

    with torch.no_grad():
        out = model_fn_flux_image(
            dit=dit, latents=latents, timestep=timestep,
            prompt_emb=prompt_emb, pooled_prompt_emb=pooled,
            guidance=guidance, text_ids=text_ids,
        )

    # kontext variant: reference packs kontext latents and offsets ids[...,0]
    kontext = torch.randn(B, C, 4, 4, generator=g)
    from einops import rearrange
    kontext_packed = rearrange(kontext, "B C (H P) (W Q) -> B (H W) (C P Q)",
                               P=2, Q=2)
    kid = dit.prepare_image_ids(kontext)
    kid[..., 0] += 1
    with torch.no_grad():
        out_k = model_fn_flux_image(
            dit=dit, latents=latents, timestep=timestep,
            prompt_emb=prompt_emb, pooled_prompt_emb=pooled,
            guidance=guidance, text_ids=text_ids,
            kontext_latents=kontext_packed, kontext_image_ids=kid,
        )

    sd = {k: v.numpy() for k, v in dit.state_dict().items()}
    np.savez(
        "../tests/goldens/flux_dit.npz",
        latents=latents.numpy(), timestep=timestep.numpy(),
        prompt_emb=prompt_emb.numpy(), pooled=pooled.numpy(),
        guidance=guidance.numpy(), out=out.numpy(),
        kontext=kontext.numpy(), out_kontext=out_k.numpy(),
        **{f"sd.{k}": v for k, v in sd.items()},
    )
    print("wrote tests/goldens/flux_dit.npz", out.shape, out_k.shape)


if __name__ == "__main__":
    main()
