"""FLUX.2 pipeline e2e golden: tiny Flux2DiT + tiny Flux2VAE through the
reference loop (FlowMatchScheduler FLUX.2 + model_fn_flux2 + decode).
python tools/gen_goldens_flux2_pipeline.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from gen_goldens_flux2 import Flux2DiT, Flux2VAE  # noqa: E402

from diffsynth.diffusion.flow_match import FlowMatchScheduler  # noqa: E402
from diffsynth.pipelines.flux2_image import (  # noqa: E402
    Flux2Unit_ImageIDs,
    Flux2Unit_PromptEmbedder,
    model_fn_flux2,
)


def main():
    torch.manual_seed(0)
    dit = Flux2DiT(
        patch_size=1, in_channels=16, num_layers=2, num_single_layers=2,
        attention_head_dim=24, num_attention_heads=4,
        joint_attention_dim=48, timestep_guidance_channels=32,
        mlp_ratio=3.0, axes_dims_rope=(6, 6, 6, 6), rope_theta=2000,
    )
    with torch.no_grad():
        for p in dit.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    dit.eval()
    torch.manual_seed(1)
    vae = Flux2VAE(block_out_channels=(8, 16, 32, 32), layers_per_block=1,
                   latent_channels=4, norm_num_groups=4)
    with torch.no_grad():
        for p in vae.parameters():
            p.add_(torch.randn_like(p) * 0.05)
        vae.bn.running_mean.copy_(torch.randn(16) * 0.3)
        vae.bn.running_var.copy_(torch.rand(16) + 0.5)
    vae.eval()

    g = torch.Generator().manual_seed(17)
    h_t, w_t = 4, 6
    lat = torch.randn(1, h_t * w_t, 16, generator=g)
    prompt = torch.randn(1, 5, 48, generator=g)
    image_ids = Flux2Unit_ImageIDs().prepare_latent_ids(h_t, w_t)
    text_ids = Flux2Unit_PromptEmbedder().prepare_text_ids(prompt)

    sched = FlowMatchScheduler("FLUX.2")
    sched.set_timesteps(4, dynamic_shift_len=h_t * w_t)
    x = lat.clone()
    with torch.no_grad():
        for t in sched.timesteps:
            ts = t.unsqueeze(0).to(torch.float32)
            v = model_fn_flux2(dit=dit, latents=x, timestep=ts,
                               embedded_guidance=4.0, prompt_embeds=prompt,
                               text_ids=text_ids, image_ids=image_ids)
            x = sched.step(v, t, x)
        z = x.permute(0, 2, 1).reshape(1, 16, h_t, w_t)
        img = vae.decode(z)

    dit_sd = {f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()}
    vae_sd = {f"vae.{k}": v.numpy() for k, v in vae.state_dict().items()}
    np.savez("../tests/goldens/flux2_pipeline.npz",
             lat0=lat.numpy(), prompt=prompt.numpy(), lat_out=x.numpy(),
             img=img.numpy(), **dit_sd, **vae_sd)
    print("wrote tests/goldens/flux2_pipeline.npz", img.shape)


if __name__ == "__main__":
    main()
