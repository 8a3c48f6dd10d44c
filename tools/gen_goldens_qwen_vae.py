"""Qwen-Image VAE goldens: tiny reference QwenImageVAE (fully
parameterizable) encode/decode on a single frame.
python tools/gen_goldens_qwen_vae.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.qwen_image_vae import QwenImageVAE  # noqa: E402


def main():
    torch.manual_seed(0)
    vae = QwenImageVAE(base_dim=8, z_dim=4, dim_mult=[1, 2, 4, 4],
                       num_res_blocks=1,
                       temperal_downsample=[False, True, True])
    # tiny z: the class bakes 16-ch mean/std (qwen_image_vae.py:670-708);
    # truncate to z_dim for the tiny model
    vae.mean = vae.mean[:, :4]
    vae.std = vae.std[:, :4]
    with torch.no_grad():
        for p in vae.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    vae.eval()

    g = torch.Generator().manual_seed(1)
    img = torch.rand(1, 3, 32, 32, generator=g) * 2 - 1
    z = torch.randn(1, 4, 4, 4, generator=g)
    with torch.no_grad():
        # QwenImageVAE.encode but with the z-slice at the tiny z_dim (the
        # reference hard-codes [:, :16], qwen_image_vae.py:716)
        x = vae.quant_conv(vae.encoder(img.unsqueeze(2)))[:, :4]
        lat = ((x - vae.mean) * vae.std).squeeze(2)
        dec = vae.decode(z)

    sd = {k: v.numpy() for k, v in vae.state_dict().items()}
    np.savez("../tests/goldens/qwen_vae.npz",
             img=img.numpy(), lat=lat.numpy(), z=z.numpy(), dec=dec.numpy(),
             **{f"sd.{k}": v for k, v in sd.items()})
    print("wrote tests/goldens/qwen_vae.npz", lat.shape, dec.shape)


if __name__ == "__main__":
    main()
