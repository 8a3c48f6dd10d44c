"""LongCat-Video DiT goldens: tiny parameterized reference instance driven
through the REAL driver model_fn_longcat_video (t2v and conditioned).
python tools/gen_goldens_longcat.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.longcat_video_dit import (  # noqa: E402
    LongCatVideoTransformer3DModel,
)
from diffsynth.pipelines.wan_video import model_fn_longcat_video  # noqa: E402


def main():
    torch.manual_seed(0)
    dit = LongCatVideoTransformer3DModel(
        in_channels=4, out_channels=4, hidden_size=96, depth=2, num_heads=4,
        caption_channels=48, mlp_ratio=4, adaln_tembed_dim=64,
        frequency_embedding_size=32, patch_size=(1, 2, 2),
        enable_flashattn2=False,
    ).eval()
    with torch.no_grad():
        for p in dit.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    g = torch.Generator().manual_seed(3)
    lat = torch.randn(1, 4, 4, 8, 8, generator=g)
    ctx = torch.randn(1, 6, 48, generator=g)
    ts = torch.tensor([421.0])

    with torch.no_grad():
        out = model_fn_longcat_video(dit=dit, latents=lat.clone(),
                                     timestep=ts, context=ctx)
        cond = torch.randn(1, 4, 2, 8, 8, generator=g)
        out_cond = model_fn_longcat_video(dit=dit, latents=lat.clone(),
                                          timestep=ts, context=ctx,
                                          longcat_latents=cond)

    sd = {k: v.numpy() for k, v in dit.state_dict().items()}
    np.savez("../tests/goldens/longcat.npz",
             latents=lat.numpy(), ctx=ctx.numpy(), timestep=ts.numpy(),
             cond=cond.numpy(), out=out.numpy(), out_cond=out_cond.numpy(),
             **{f"sd.{k}": v for k, v in sd.items()})
    print("wrote tests/goldens/longcat.npz", out.shape, out_cond.shape)


if __name__ == "__main__":
    main()
