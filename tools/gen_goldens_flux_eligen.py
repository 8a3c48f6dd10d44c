"""EliGen (entity control) goldens: tiny FluxDiT driven through the REAL
model_fn_flux_image with entity_prompt_emb/entity_masks — exercising
process_entity_masks + construct_mask (flux_dit.py:325-384) and the masked
attention in both block families.  python tools/gen_goldens_flux_eligen.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.pipelines.flux_image import model_fn_flux_image  # noqa: E402

from gen_goldens_flux import CTX_DIM, POOLED_DIM, build_tiny_flux  # noqa: E402


def main():
    dit = build_tiny_flux()
    g = torch.Generator().manual_seed(31)
    B, C, H, W = 1, 4, 8, 12
    latents = torch.randn(B, C, H, W, generator=g)
    timestep = torch.tensor([614.0])
    prompt_emb = torch.randn(B, 6, CTX_DIM, generator=g)
    pooled = torch.randn(B, POOLED_DIM, generator=g)
    guidance = torch.tensor([3.5])
    text_ids = torch.zeros(B, 6, 3)

    # two entities with half-plane masks (binary, latent resolution)
    entity_prompt_emb = torch.randn(B, 2, 6, CTX_DIM, generator=g)
    masks = torch.zeros(B, 2, 1, H, W)
    masks[:, 0, :, :, : W // 2] = 1.0
    masks[:, 1, :, :, W // 2:] = 1.0

    with torch.no_grad():
        out = model_fn_flux_image(
            dit=dit, latents=latents, timestep=timestep,
            prompt_emb=prompt_emb, pooled_prompt_emb=pooled,
            guidance=guidance, text_ids=text_ids,
            entity_prompt_emb=entity_prompt_emb, entity_masks=masks)

    sd = {f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()}
    np.savez("../tests/goldens/flux_eligen.npz",
             latents=latents.numpy(), timestep=timestep.numpy(),
             prompt_emb=prompt_emb.numpy(), pooled=pooled.numpy(),
             guidance=guidance.numpy(),
             entity_prompt_emb=entity_prompt_emb.numpy(),
             entity_masks=masks.numpy(), out=out.numpy(), **sd)
    print("wrote tests/goldens/flux_eligen.npz", out.shape)


if __name__ == "__main__":
    main()
