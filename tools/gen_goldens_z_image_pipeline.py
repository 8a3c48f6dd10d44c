"""Z-Image pipeline e2e golden: tiny ZImageDiT + tiny FLUX VAE decoder
driven through the reference loop (FlowMatchScheduler "Z-Image",
model_fn_z_image, FluxVAEDecoder).  python tools/gen_goldens_z_image_pipeline.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

import gen_goldens_z_image as zg  # noqa: E402  (applies the t-mlp patch)
from gen_goldens_flux_vae import build_decoder  # noqa: E402

from diffsynth.diffusion.flow_match import FlowMatchScheduler  # noqa: E402
from diffsynth.pipelines.z_image import model_fn_z_image  # noqa: E402


def main():
    torch.manual_seed(0)
    dit = zg.ZImageDiT(
        all_patch_size=(2,), all_f_patch_size=(1,), in_channels=4, dim=96,
        n_layers=2, n_refiner_layers=1, n_heads=4, n_kv_heads=4,
        norm_eps=1e-5, qk_norm=True, cap_feat_dim=48, rope_theta=256.0,
        t_scale=1000.0, axes_dims=[8, 8, 8], axes_lens=[256, 64, 64],
    )
    with torch.no_grad():
        for p in dit.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    dit.eval()
    dec = build_decoder()

    g = torch.Generator().manual_seed(13)
    lat0 = torch.randn(1, 4, 16, 24, generator=g)
    cap = torch.randn(1, 7, 48, generator=g)
    neg = torch.randn(1, 4, 48, generator=g)
    cfg_scale = 2.0

    sched = FlowMatchScheduler("Z-Image")
    sched.set_timesteps(4)
    x = lat0.clone()
    with torch.no_grad():
        for t in sched.timesteps:
            ts = t.unsqueeze(0).to(torch.float32)
            v = model_fn_z_image(dit=dit, latents=x, timestep=ts,
                                 prompt_embeds=[cap[0]])
            v_n = model_fn_z_image(dit=dit, latents=x, timestep=ts,
                                   prompt_embeds=[neg[0]])
            v = v_n + cfg_scale * (v - v_n)
            x = sched.step(v, t, x)
        img = dec(x)

    dit_sd = {f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()}
    dec_sd = {f"vae.decoder.{k}": v.numpy()
              for k, v in dec.state_dict().items()}
    np.savez("../tests/goldens/z_image_pipeline.npz",
             lat0=lat0.numpy(), cap=cap.numpy(), neg=neg.numpy(),
             lat_out=x.numpy(), img=img.numpy(), **dit_sd, **dec_sd)
    print("wrote tests/goldens/z_image_pipeline.npz", img.shape)


if __name__ == "__main__":
    main()
