"""Qwen-Image blockwise-ControlNet goldens: tiny parameterized reference
QwenImageBlockWiseControlNet driven through the REAL driver —
QwenImageBlockwiseMultiControlNet (scale + progress gating) inside
model_fn_qwen_image's per-block residual adds.
python tools/gen_goldens_qwen_controlnet.py
"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.qwen_image_controlnet import (  # noqa: E402
    QwenImageBlockWiseControlNet,
)
from diffsynth.diffusion.base_pipeline import ControlNetInput  # noqa: E402
from diffsynth.pipelines.qwen_image import (  # noqa: E402
    QwenImageBlockwiseMultiControlNet,
    model_fn_qwen_image,
)

from gen_goldens_qwen_dit import DIM, IN_DIM, TXT_DIM, build_tiny  # noqa: E402


def main():
    dit = build_tiny()
    torch.manual_seed(13)
    cn = QwenImageBlockWiseControlNet(num_layers=2, in_dim=IN_DIM, dim=DIM)
    with torch.no_grad():
        for p in cn.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    cn.eval()

    g = torch.Generator().manual_seed(23)
    lat = torch.randn(1, 4, 8, 12, generator=g)
    cond = torch.randn(1, 4, 8, 12, generator=g)
    prompt_emb = torch.randn(1, 6, TXT_DIM, generator=g)
    mask = torch.ones(1, 6, dtype=torch.long)
    ts = torch.tensor([614.0])

    multi = QwenImageBlockwiseMultiControlNet([cn])
    with torch.no_grad():
        out = model_fn_qwen_image(
            dit=dit, blockwise_controlnet=multi, latents=lat, timestep=ts,
            prompt_emb=prompt_emb, prompt_emb_mask=mask, height=64, width=96,
            blockwise_controlnet_conditioning=[cond],
            blockwise_controlnet_inputs=[ControlNetInput(scale=0.7)],
            progress_id=2, num_inference_steps=10)

    sd = {f"cn.{k}": v.numpy() for k, v in cn.state_dict().items()}
    sd.update({f"dit.{k}": v.numpy() for k, v in dit.state_dict().items()})
    np.savez("../tests/goldens/qwen_controlnet.npz",
             latents=lat.numpy(), cond=cond.numpy(),
             prompt_emb=prompt_emb.numpy(), timestep=ts.numpy(),
             out=out.numpy(), **sd)
    print("wrote tests/goldens/qwen_controlnet.npz", out.shape)


if __name__ == "__main__":
    main()
