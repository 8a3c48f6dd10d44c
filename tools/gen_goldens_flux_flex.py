"""Flex goldens: tiny FluxDiT with the Flex input layout (noise 4ch +
inpaint 4ch + mask 1ch + control 4ch, packed x4 = 52) driven through the
REAL model_fn_flux_image flex branch both above and below the control-stop
timestep.  python tools/gen_goldens_flux_flex.py
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
    torch.manual_seed(103)
    dit.x_embedder = torch.nn.Linear(52, 96)
    with torch.no_grad():
        dit.x_embedder.weight.add_(torch.randn_like(
            dit.x_embedder.weight) * 0.05)
    dit.input_dim = 52
    dit.eval()

    g = torch.Generator().manual_seed(107)
    latents = torch.randn(1, 4, 8, 12, generator=g)
    flex_condition = torch.randn(1, 9, 8, 12, generator=g)
    flex_uncondition = flex_condition.clone()
    flex_uncondition[:, 5:] = 0.0
    timestep = torch.tensor([614.0])
    prompt_emb = torch.randn(1, 6, CTX_DIM, generator=g)
    pooled = torch.randn(1, POOLED_DIM, generator=g)
    guidance = torch.tensor([3.5])
    text_ids = torch.zeros(1, 6, 3)

    kwargs = dict(dit=dit, latents=latents, timestep=timestep,
                  prompt_emb=prompt_emb, pooled_prompt_emb=pooled,
                  guidance=guidance, text_ids=text_ids,
                  flex_condition=flex_condition,
                  flex_uncondition=flex_uncondition)
    with torch.no_grad():
        out_cond = model_fn_flux_image(flex_control_stop_timestep=500.0,
                                       **kwargs)
        out_uncond = model_fn_flux_image(flex_control_stop_timestep=700.0,
                                         **kwargs)

    sd = {f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()}
    np.savez("../tests/goldens/flux_flex.npz",
             latents=latents.numpy(), flex_condition=flex_condition.numpy(),
             flex_uncondition=flex_uncondition.numpy(),
             timestep=timestep.numpy(), prompt_emb=prompt_emb.numpy(),
             pooled=pooled.numpy(), guidance=guidance.numpy(),
             out_cond=out_cond.numpy(), out_uncond=out_uncond.numpy(), **sd)
    print("wrote tests/goldens/flux_flex.npz", out_cond.shape)


if __name__ == "__main__":
    main()
