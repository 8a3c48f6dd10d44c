"""Z-Image DiT goldens: tiny reference ZImageDiT (fully parameterizable)
driven through the REAL driver model_fn_z_image.
python tools/gen_goldens_z_image.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.z_image_dit import TimestepEmbedder, ZImageDiT  # noqa: E402
from diffsynth.pipelines.z_image import model_fn_z_image  # noqa: E402

# run the timestep MLP in the weight dtype (fp32 here); the reference
# hard-casts to bf16 (z_image_dit.py:54) because production runs bf16 —
# our port uses the param dtype, identical in production
_orig = TimestepEmbedder.forward


def _patched(self, t):
    t_freq = self.timestep_embedding(t, self.frequency_embedding_size)
    return self.mlp(t_freq.to(self.mlp[0].weight.dtype))


TimestepEmbedder.forward = _patched


def main():
    torch.manual_seed(0)
    dit = ZImageDiT(
        all_patch_size=(2,), all_f_patch_size=(1,), in_channels=4, dim=96,
        n_layers=2, n_refiner_layers=1, n_heads=4, n_kv_heads=4,
        norm_eps=1e-5, qk_norm=True, cap_feat_dim=48, rope_theta=256.0,
        t_scale=1000.0, axes_dims=[8, 8, 8], axes_lens=[256, 64, 64],
    )
    with torch.no_grad():
        for p in dit.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    dit.eval()

    g = torch.Generator().manual_seed(3)
    lat = torch.randn(1, 4, 16, 24, generator=g)  # 8*12=96 tokens -> /32 ok
    cap = torch.randn(1, 7, 48, generator=g)  # pads 7 -> 32
    ts = torch.tensor([421.0])

    with torch.no_grad():
        out = model_fn_z_image(dit=dit, latents=lat, timestep=ts,
                               prompt_embeds=[cap[0]])

    sd = {k: v.numpy() for k, v in dit.state_dict().items()}
    np.savez("../tests/goldens/z_image_dit.npz",
             latents=lat.numpy(), cap=cap.numpy(), timestep=ts.numpy(),
             out=out.numpy(), **{f"sd.{k}": v for k, v in sd.items()})
    print("wrote tests/goldens/z_image_dit.npz", out.shape)


if __name__ == "__main__":
    main()
