"""Qwen-Image pipeline e2e golden: tiny DiT + tiny VAE driven through the
reference denoise semantics (FlowMatchScheduler "Qwen-Image" with dynamic
shift, model_fn_qwen_image per step, scheduler.step, QwenImageVAE.decode)
on precomputed prompt embeddings.  python tools/gen_goldens_qwen_pipeline.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from gen_goldens_qwen_dit import TXT_DIM, build_tiny  # noqa: E402

from diffsynth.diffusion.flow_match import FlowMatchScheduler  # noqa: E402
from diffsynth.models.qwen_image_vae import QwenImageVAE  # noqa: E402
from diffsynth.pipelines.qwen_image import model_fn_qwen_image  # noqa: E402


def main():
    dit = build_tiny()
    torch.manual_seed(9)
    vae = QwenImageVAE(base_dim=8, z_dim=4, dim_mult=[1, 2, 4, 4],
                       num_res_blocks=1,
                       temperal_downsample=[False, True, True])
    vae.mean, vae.std = vae.mean[:, :4], vae.std[:, :4]
    with torch.no_grad():
        for p in vae.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    vae.eval()

    g = torch.Generator().manual_seed(21)
    lat0 = torch.randn(1, 4, 8, 12, generator=g)
    prompt_emb = torch.randn(1, 6, TXT_DIM, generator=g)
    neg_emb = torch.randn(1, 5, TXT_DIM, generator=g)
    mask = torch.ones(1, 6, dtype=torch.long)
    neg_mask = torch.ones(1, 5, dtype=torch.long)
    H, W = 64, 96
    cfg_scale = 4.0

    sched = FlowMatchScheduler("Qwen-Image")
    sched.set_timesteps(4, dynamic_shift_len=(H // 16) * (W // 16))
    x = lat0.clone()
    with torch.no_grad():
        for t in sched.timesteps:
            ts = t.unsqueeze(0).to(torch.float32)
            v = model_fn_qwen_image(dit=dit, latents=x, timestep=ts,
                                    prompt_emb=prompt_emb,
                                    prompt_emb_mask=mask, height=H, width=W)
            v_n = model_fn_qwen_image(dit=dit, latents=x, timestep=ts,
                                      prompt_emb=neg_emb,
                                      prompt_emb_mask=neg_mask,
                                      height=H, width=W)
            v = v_n + cfg_scale * (v - v_n)
            x = sched.step(v, t, x)
        img = vae.decode(x)

    dit_sd = {f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()
              if "pos_embed" not in k}
    vae_sd = {f"vae.{k}": v.numpy() for k, v in vae.state_dict().items()}
    np.savez("../tests/goldens/qwen_pipeline.npz",
             lat0=lat0.numpy(), prompt_emb=prompt_emb.numpy(),
             neg_emb=neg_emb.numpy(), lat_out=x.numpy(), img=img.numpy(),
             **dit_sd, **vae_sd)
    print("wrote tests/goldens/qwen_pipeline.npz", img.shape)


if __name__ == "__main__":
    main()
