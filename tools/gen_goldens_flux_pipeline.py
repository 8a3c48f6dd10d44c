"""FLUX pipeline e2e golden: tiny DiT + tiny VAE decoder (reusing the
builders from gen_goldens_flux / gen_goldens_flux_vae) driven through the
reference denoise semantics — FlowMatchScheduler("FLUX.1"), model_fn per
step, scheduler.step, FluxVAEDecoder — on precomputed prompt embeddings.
python tools/gen_goldens_flux_pipeline.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from gen_goldens_flux import CTX_DIM, POOLED_DIM, build_tiny_flux  # noqa: E402
from gen_goldens_flux_vae import build_decoder  # noqa: E402

from diffsynth.diffusion.flow_match import FlowMatchScheduler  # noqa: E402
from diffsynth.pipelines.flux_image import model_fn_flux_image  # noqa: E402


def main():
    dit = build_tiny_flux()
    dec = build_decoder()
    g = torch.Generator().manual_seed(11)
    lat = torch.randn(1, 4, 8, 12, generator=g)
    prompt_emb = torch.randn(1, 6, CTX_DIM, generator=g)
    pooled = torch.randn(1, POOLED_DIM, generator=g)
    neg_emb = torch.randn(1, 6, CTX_DIM, generator=g)
    neg_pooled = torch.randn(1, POOLED_DIM, generator=g)
    guidance = torch.tensor([3.5])
    text_ids = torch.zeros(1, 6, 3)

    def rollout(cfg_scale):
        sched = FlowMatchScheduler("FLUX.1")
        sched.set_timesteps(4)
        x = lat.clone()
        with torch.no_grad():
            for t in sched.timesteps:
                ts = t.unsqueeze(0).to(torch.float32)
                v = model_fn_flux_image(
                    dit=dit, latents=x, timestep=ts, prompt_emb=prompt_emb,
                    pooled_prompt_emb=pooled, guidance=guidance,
                    text_ids=text_ids)
                if cfg_scale != 1.0:
                    v_n = model_fn_flux_image(
                        dit=dit, latents=x, timestep=ts, prompt_emb=neg_emb,
                        pooled_prompt_emb=neg_pooled, guidance=guidance,
                        text_ids=text_ids)
                    v = v_n + cfg_scale * (v - v_n)
                x = sched.step(v, t, x)
            img = dec(x)
        return x, img

    lat_nocfg, img_nocfg = rollout(1.0)
    lat_cfg, _ = rollout(2.5)

    dit_sd = {f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()}
    dec_sd = {f"vae.decoder.{k}": v.numpy()
              for k, v in dec.state_dict().items()}
    np.savez(
        "../tests/goldens/flux_pipeline.npz",
        lat0=lat.numpy(), prompt_emb=prompt_emb.numpy(),
        pooled=pooled.numpy(), neg_emb=neg_emb.numpy(),
        neg_pooled=neg_pooled.numpy(),
        lat_nocfg=lat_nocfg.numpy(), img_nocfg=img_nocfg.numpy(),
        lat_cfg=lat_cfg.numpy(),
        **dit_sd, **dec_sd,
    )
    print("wrote tests/goldens/flux_pipeline.npz", img_nocfg.shape)


if __name__ == "__main__":
    main()
