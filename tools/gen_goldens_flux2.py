"""FLUX.2 goldens: tiny reference Flux2DiT (parameterizable constructor)
through the REAL driver model_fn_flux2, and a tiny Flux2VAE
encode/decode.  python tools/gen_goldens_flux2.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.flux2_dit import Flux2DiT  # noqa: E402
from diffsynth.models.flux2_vae import Flux2VAE  # noqa: E402
from diffsynth.pipelines.flux2_image import (  # noqa: E402
    Flux2Unit_ImageIDs,
    Flux2Unit_PromptEmbedder,
    model_fn_flux2,
)


def dit_goldens():
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

    g = torch.Generator().manual_seed(7)
    h_t, w_t = 4, 6
    lat = torch.randn(1, h_t * w_t, 16, generator=g)
    prompt = torch.randn(1, 5, 48, generator=g)
    image_ids = Flux2Unit_ImageIDs().prepare_latent_ids(h_t, w_t)
    text_ids = Flux2Unit_PromptEmbedder().prepare_text_ids(prompt)
    ts = torch.tensor([583.0])

    with torch.no_grad():
        out = model_fn_flux2(
            dit=dit, latents=lat, timestep=ts, embedded_guidance=4.0,
            prompt_embeds=prompt, text_ids=text_ids, image_ids=image_ids,
        )
    sd = {f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()}
    return dict(lat=lat.numpy(), prompt=prompt.numpy(), ts=ts.numpy(),
                out=out.numpy(), **sd)


def vae_goldens():
    torch.manual_seed(1)
    vae = Flux2VAE(block_out_channels=(8, 16, 32, 32), layers_per_block=1,
                   latent_channels=4, norm_num_groups=4)
    with torch.no_grad():
        for p in vae.parameters():
            p.add_(torch.randn_like(p) * 0.05)
        # give the BN running stats non-trivial values
        vae.bn.running_mean.copy_(torch.randn(16) * 0.3)
        vae.bn.running_var.copy_(torch.rand(16) + 0.5)
    vae.eval()

    g = torch.Generator().manual_seed(2)
    img = torch.rand(1, 3, 64, 64, generator=g) * 2 - 1
    from einops import rearrange
    with torch.no_grad():
        # Flux2VAE.encode with the pack-slice at the tiny packed width (the
        # reference hard-codes [:, :128], flux2_vae.py:2081)
        h = vae._encode(img)
        h = rearrange(h, "B C (H P) (W Q) -> B (C P Q) H W", P=2, Q=2)
        h = h[:, :16]
        m = vae.bn.running_mean.view(1, -1, 1, 1)
        s = torch.sqrt(vae.bn.running_var.view(1, -1, 1, 1) + 1e-4)
        tokens = (h - m) / s
        tokens_seq = tokens.reshape(1, 16, -1).permute(0, 2, 1)
        dec = vae.decode(tokens)
    sd = {f"vae.{k}": v.numpy() for k, v in vae.state_dict().items()}
    return dict(img=img.numpy(), tokens=tokens_seq.numpy(),
                dec=dec.numpy(), **sd)


def main():
    d = dit_goldens()
    v = vae_goldens()
    np.savez("../tests/goldens/flux2.npz", **d, **v)
    print("wrote tests/goldens/flux2.npz", d["out"].shape, v["dec"].shape)


if __name__ == "__main__":
    main()
