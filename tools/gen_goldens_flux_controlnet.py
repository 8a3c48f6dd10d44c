"""FLUX ControlNet goldens: tiny hand-assembled reference FluxControlNet
(the class hard-codes dim=3072, flux_controlnet.py:62-78) + the tiny FluxDiT
from gen_goldens_flux, driven through the REAL driver path —
MultiControlNet.forward (scale + progress gating + align) feeding
model_fn_flux_image's residual adds.  python tools/gen_goldens_flux_controlnet.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.flux_controlnet import FluxControlNet  # noqa: E402
from diffsynth.models.flux_dit import (  # noqa: E402
    FluxJointTransformerBlock,
    FluxSingleTransformerBlock,
    RoPEEmbedding,
)
from diffsynth.models.general_modules import TimestepEmbeddings  # noqa: E402
from diffsynth.diffusion.base_pipeline import ControlNetInput  # noqa: E402
from diffsynth.pipelines.flux_image import (  # noqa: E402
    MultiControlNet,
    model_fn_flux_image,
)

from gen_goldens_flux import (  # noqa: E402
    CTX_DIM, DIM, FREQ_DIM, HEADS, HEAD_DIM, IN_DIM, POOLED_DIM,
    build_tiny_flux,
)

N_JOINT, N_SINGLE = 2, 2


def build_tiny_controlnet(seed=11, with_mode=True):
    torch.manual_seed(seed)
    cn = FluxControlNet.__new__(FluxControlNet)
    torch.nn.Module.__init__(cn)
    cn.pos_embedder = RoPEEmbedding(HEAD_DIM, 10000, [4, 10, 10])
    cn.time_embedder = TimestepEmbeddings(FREQ_DIM, DIM)
    cn.guidance_embedder = TimestepEmbeddings(FREQ_DIM, DIM)
    cn.pooled_text_embedder = torch.nn.Sequential(
        torch.nn.Linear(POOLED_DIM, DIM), torch.nn.SiLU(),
        torch.nn.Linear(DIM, DIM))
    cn.context_embedder = torch.nn.Linear(CTX_DIM, DIM)
    cn.x_embedder = torch.nn.Linear(IN_DIM, DIM)
    cn.blocks = torch.nn.ModuleList(
        [FluxJointTransformerBlock(DIM, HEADS) for _ in range(N_JOINT)])
    cn.single_blocks = torch.nn.ModuleList(
        [FluxSingleTransformerBlock(DIM, HEADS) for _ in range(N_SINGLE)])
    cn.controlnet_blocks = torch.nn.ModuleList(
        [torch.nn.Linear(DIM, DIM) for _ in range(N_JOINT)])
    cn.controlnet_single_blocks = torch.nn.ModuleList(
        [torch.nn.Linear(DIM, DIM) for _ in range(N_SINGLE)])
    if with_mode:
        cn.mode_dict = {"canny": 0, "tile": 1}
        cn.controlnet_mode_embedder = torch.nn.Embedding(2, DIM)
    else:
        cn.mode_dict = {}
        cn.controlnet_mode_embedder = None
    cn.controlnet_x_embedder = torch.nn.Linear(IN_DIM, DIM)
    with torch.no_grad():
        for p in cn.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    return cn.eval()


def main():
    dit = build_tiny_flux()
    cn = build_tiny_controlnet()
    g = torch.Generator().manual_seed(17)
    B, C, H, W = 1, 4, 8, 12
    latents = torch.randn(B, C, H, W, generator=g)
    cn_cond = torch.randn(B, C, H, W, generator=g)
    timestep = torch.tensor([614.0])
    prompt_emb = torch.randn(B, 6, CTX_DIM, generator=g)
    pooled = torch.randn(B, POOLED_DIM, generator=g)
    guidance = torch.tensor([3.5])
    text_ids = torch.zeros(B, 6, 3)

    multi = MultiControlNet([cn])
    kwargs = dict(
        dit=dit, latents=latents, timestep=timestep, prompt_emb=prompt_emb,
        pooled_prompt_emb=pooled, guidance=guidance, text_ids=text_ids,
        controlnet=multi,
        controlnet_conditionings=[cn_cond],
        num_inference_steps=10,
    )
    with torch.no_grad():
        out = model_fn_flux_image(
            controlnet_inputs=[
                ControlNetInput(scale=0.8, processor_id="canny")],
            progress_id=3, **kwargs)
        # gated off: progress = (10-1-0)/9 = 1.0 > start=0.7 -> no controlnet
        out_gated = model_fn_flux_image(
            controlnet_inputs=[
                ControlNetInput(scale=0.8, start=0.7, processor_id="canny")],
            progress_id=0, **kwargs)

    sd = {f"cn.{k}": v.numpy() for k, v in cn.state_dict().items()}
    sd.update({f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()})
    np.savez(
        "../tests/goldens/flux_controlnet.npz",
        latents=latents.numpy(), cn_cond=cn_cond.numpy(),
        timestep=timestep.numpy(), prompt_emb=prompt_emb.numpy(),
        pooled=pooled.numpy(), guidance=guidance.numpy(),
        out=out.numpy(), out_gated=out_gated.numpy(), **sd)
    print("wrote tests/goldens/flux_controlnet.npz", out.shape)


if __name__ == "__main__":
    main()
