"""Step1x-Edit goldens: tiny parameterized reference Qwen2Connector driven
through the REAL model_fn_flux_image step1x path — per-step connector
prompt/pooled swap, zero text ids, reference latents riding the sequence
with first-half output.  python tools/gen_goldens_flux_step1x.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.step1x_connector import Qwen2Connector  # noqa: E402
from diffsynth.pipelines.flux_image import model_fn_flux_image  # noqa: E402

from gen_goldens_flux import CTX_DIM, POOLED_DIM, build_tiny_flux  # noqa: E402

IN_CH, HIDDEN, HEADS, FREQ, POOL = 24, 32, 4, 16, 12


def main():
    torch.manual_seed(47)
    # tiny connector: dims must match the tiny FluxDiT's context (48) and
    # pooled (32) inputs
    conn = Qwen2Connector(in_channels=IN_CH, hidden_size=CTX_DIM,
                          heads_num=4, depth=2, dtype=torch.float32)
    conn.global_proj_out = torch.nn.Linear(IN_CH, POOLED_DIM)
    with torch.no_grad():
        for p in conn.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    conn.eval()

    dit = build_tiny_flux()
    g = torch.Generator().manual_seed(53)
    latents = torch.randn(1, 4, 8, 12, generator=g)
    ref_latents = torch.randn(1, 4, 8, 12, generator=g)
    timestep = torch.tensor([614.0])
    guidance = torch.tensor([3.5])
    llm_emb = torch.randn(1, 10, IN_CH, generator=g)
    mask = torch.ones(1, 10, dtype=torch.long)
    mask[:, 7:] = 0

    with torch.no_grad():
        out = model_fn_flux_image(
            dit=dit, step1x_connector=conn, latents=latents,
            timestep=timestep, guidance=guidance,
            prompt_emb=None, pooled_prompt_emb=torch.zeros(1, POOLED_DIM),
            text_ids=None,
            step1x_llm_embedding=llm_emb, step1x_mask=mask,
            step1x_reference_latents=ref_latents)

    sd = {f"cx.{k}": v.numpy() for k, v in conn.state_dict().items()}
    sd.update({f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()})
    np.savez("../tests/goldens/flux_step1x.npz",
             latents=latents.numpy(), ref_latents=ref_latents.numpy(),
             timestep=timestep.numpy(), guidance=guidance.numpy(),
             llm_emb=llm_emb.numpy(), mask=mask.numpy(), out=out.numpy(),
             **sd)
    print("wrote tests/goldens/flux_step1x.npz", out.shape)


if __name__ == "__main__":
    main()
