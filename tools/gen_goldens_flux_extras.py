"""Value-control + InfiniteYou goldens.

SingleValueEncoder: tiny parameterized reference instance, plus the unit's
append-to-prompt semantics via model_fn_flux_image with the extended
prompt.  InfiniteYouImageProjector: tiny instance; the id tokens drive the
tiny FluxControlNet through the REAL model_fn_flux_image id_emb override
(flux_image.py:1087-1090).  python tools/gen_goldens_flux_extras.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.flux_value_control import SingleValueEncoder  # noqa: E402
from diffsynth.models.flux_infiniteyou import (  # noqa: E402
    InfiniteYouImageProjector,
)
from diffsynth.diffusion.base_pipeline import ControlNetInput  # noqa: E402
from diffsynth.pipelines.flux_image import (  # noqa: E402
    MultiControlNet,
    model_fn_flux_image,
)

from gen_goldens_flux import CTX_DIM, POOLED_DIM, build_tiny_flux  # noqa: E402
from gen_goldens_flux_controlnet import build_tiny_controlnet  # noqa: E402


def main():
    torch.manual_seed(41)
    value_enc = SingleValueEncoder(dim_in=32, dim_out=CTX_DIM, prefer_len=4,
                                   computation_device="cpu").eval()
    with torch.no_grad():
        for p in value_enc.parameters():
            p.add_(torch.randn_like(p) * 0.05)
        value_emb = value_enc(torch.tensor([0.73]), torch.float32)

    proj = InfiniteYouImageProjector(dim=32, depth=2, dim_head=8, heads=4,
                                     num_queries=2, embedding_dim=16,
                                     output_dim=CTX_DIM).eval()
    with torch.no_grad():
        for p in proj.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    g = torch.Generator().manual_seed(43)
    id_raw = torch.randn(1, 1, 16, generator=g)
    with torch.no_grad():
        id_emb = proj(id_raw)

    # id_emb drives the controlnet in place of its prompt
    dit = build_tiny_flux()
    cn = build_tiny_controlnet(with_mode=False)
    latents = torch.randn(1, 4, 8, 12, generator=g)
    cn_cond = torch.randn(1, 4, 8, 12, generator=g)
    timestep = torch.tensor([614.0])
    prompt_emb = torch.randn(1, 6, CTX_DIM, generator=g)
    pooled = torch.randn(1, POOLED_DIM, generator=g)
    guidance = torch.tensor([3.5])
    with torch.no_grad():
        out = model_fn_flux_image(
            dit=dit, controlnet=MultiControlNet([cn]), latents=latents,
            timestep=timestep, prompt_emb=prompt_emb,
            pooled_prompt_emb=pooled, guidance=guidance,
            text_ids=torch.zeros(1, 6, 3),
            controlnet_conditionings=[cn_cond],
            controlnet_inputs=[ControlNetInput(scale=1.0)],
            id_emb=id_emb, infinityou_guidance=torch.tensor([1.0]),
            num_inference_steps=10, progress_id=5)

    sd = {f"ve.{k}": v.numpy() for k, v in value_enc.state_dict().items()}
    sd.update({f"iy.{k}": v.numpy() for k, v in proj.state_dict().items()})
    sd.update({f"cn.{k}": v.numpy() for k, v in cn.state_dict().items()})
    sd.update({f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()})
    np.savez("../tests/goldens/flux_extras.npz",
             value_emb=value_emb.numpy(), id_raw=id_raw.numpy(),
             id_emb=id_emb.numpy(), latents=latents.numpy(),
             cn_cond=cn_cond.numpy(), timestep=timestep.numpy(),
             prompt_emb=prompt_emb.numpy(), pooled=pooled.numpy(),
             guidance=guidance.numpy(), out=out.numpy(), **sd)
    print("wrote tests/goldens/flux_extras.npz", out.shape)


if __name__ == "__main__":
    main()
