"""FLUX IP-Adapter goldens: tiny parameterized reference FluxIpAdapter
(+ re-sized MLPProjModel) driven through the REAL driver —
``pipe.ipadapter(image_encoding, scale)`` -> ``ipadapter_kwargs_list`` ->
``model_fn_flux_image``'s per-block ``interact_with_ipadapter`` calls.
python tools/gen_goldens_flux_ipadapter.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.flux_ipadapter import (  # noqa: E402
    FluxIpAdapter,
    MLPProjModel,
)
from diffsynth.pipelines.flux_image import model_fn_flux_image  # noqa: E402

from gen_goldens_flux import (  # noqa: E402
    CTX_DIM, POOLED_DIM, build_tiny_flux,
)

CROSS_DIM, ID_DIM, N_TOKENS = 64, 16, 8


def main():
    dit = build_tiny_flux()
    torch.manual_seed(19)
    ada = FluxIpAdapter(num_attention_heads=4, attention_head_dim=24,
                        cross_attention_dim=CROSS_DIM, num_tokens=N_TOKENS,
                        num_blocks=4)
    ada.image_proj = MLPProjModel(cross_attention_dim=CROSS_DIM,
                                  id_embeddings_dim=ID_DIM,
                                  num_tokens=N_TOKENS)
    with torch.no_grad():
        for p in ada.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    ada.eval()
    ada.set_adapter()

    g = torch.Generator().manual_seed(29)
    latents = torch.randn(1, 4, 8, 12, generator=g)
    timestep = torch.tensor([614.0])
    prompt_emb = torch.randn(1, 6, CTX_DIM, generator=g)
    pooled = torch.randn(1, POOLED_DIM, generator=g)
    guidance = torch.tensor([3.5])
    text_ids = torch.zeros(1, 6, 3)
    image_embeds = torch.randn(1, ID_DIM, generator=g)

    with torch.no_grad():
        kwargs_list = ada(image_embeds, scale=0.9)
        out = model_fn_flux_image(
            dit=dit, latents=latents, timestep=timestep,
            prompt_emb=prompt_emb, pooled_prompt_emb=pooled,
            guidance=guidance, text_ids=text_ids,
            ipadapter_kwargs_list=kwargs_list)

    sd = {f"ip.{k}": v.numpy() for k, v in ada.state_dict().items()}
    sd.update({f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()})
    np.savez("../tests/goldens/flux_ipadapter.npz",
             latents=latents.numpy(), timestep=timestep.numpy(),
             prompt_emb=prompt_emb.numpy(), pooled=pooled.numpy(),
             guidance=guidance.numpy(), image_embeds=image_embeds.numpy(),
             out=out.numpy(), **sd)
    print("wrote tests/goldens/flux_ipadapter.npz", out.shape)


if __name__ == "__main__":
    main()
