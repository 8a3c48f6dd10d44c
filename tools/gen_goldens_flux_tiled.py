"""FLUX tiled-denoiser goldens: the REAL model_fn_flux_image tiled branch
(FastTileWorker feather blend) on a latent larger than the tile.
python tools/gen_goldens_flux_tiled.py
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
    g = torch.Generator().manual_seed(113)
    latents = torch.randn(1, 4, 16, 24, generator=g)
    timestep = torch.tensor([614.0])
    prompt_emb = torch.randn(1, 6, CTX_DIM, generator=g)
    pooled = torch.randn(1, POOLED_DIM, generator=g)
    guidance = torch.tensor([3.5])
    text_ids = torch.zeros(1, 6, 3)

    with torch.no_grad():
        out = model_fn_flux_image(
            dit=dit, latents=latents, timestep=timestep,
            prompt_emb=prompt_emb, pooled_prompt_emb=pooled,
            guidance=guidance, text_ids=text_ids,
            tiled=True, tile_size=8, tile_stride=4)

    sd = {f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()}
    np.savez("../tests/goldens/flux_tiled.npz",
             latents=latents.numpy(), timestep=timestep.numpy(),
             prompt_emb=prompt_emb.numpy(), pooled=pooled.numpy(),
             guidance=guidance.numpy(), out=out.numpy(), **sd)
    print("wrote tests/goldens/flux_tiled.npz", out.shape)


if __name__ == "__main__":
    main()
