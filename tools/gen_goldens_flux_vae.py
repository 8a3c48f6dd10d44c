"""FLUX VAE goldens: tiny hand-assembled FluxVAEEncoder/Decoder (the
reference classes hard-code 128..512 channels, flux_vae.py:296-399) run
through the REAL forwards.  python tools/gen_goldens_flux_vae.py"""
import sys

sys.path.insert(0, ".")
import _ref_import  # noqa: E402

_ref_import.install_stubs()

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffsynth.models.flux_vae import (  # noqa: E402
    DownSampler,
    FluxVAEDecoder,
    FluxVAEEncoder,
    ResnetBlock,
    UpSampler,
    VAEAttentionBlock,
)

G = 4  # norm groups
Z = 4  # tiny latent channels
BO = (8, 16, 32, 32)


def _res(cin, cout):
    return ResnetBlock(cin, cout, groups=G, eps=1e-6)


def _attn(c):
    return VAEAttentionBlock(1, c, c, 1, norm_num_groups=G, eps=1e-6,
                             use_conv_attention=True)


def build_encoder(seed=0):
    torch.manual_seed(seed)
    enc = FluxVAEEncoder.__new__(FluxVAEEncoder)
    torch.nn.Module.__init__(enc)
    enc.scaling_factor, enc.shift_factor = 0.3611, 0.1159
    enc.conv_in = torch.nn.Conv2d(3, BO[0], 3, padding=1)
    blocks, cin = [], BO[0]
    for i, c in enumerate(BO):
        blocks += [_res(cin, c), _res(c, c)]
        cin = c
        if i != len(BO) - 1:
            blocks.append(DownSampler(c, padding=0, extra_padding=True))
    blocks += [_res(cin, cin), _attn(cin), _res(cin, cin)]
    enc.blocks = torch.nn.ModuleList(blocks)
    enc.conv_norm_out = torch.nn.GroupNorm(num_channels=cin, num_groups=G,
                                           eps=1e-6)
    enc.conv_act = torch.nn.SiLU()
    enc.conv_out = torch.nn.Conv2d(cin, 2 * Z, 3, padding=1)
    with torch.no_grad():
        for p in enc.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    return enc.eval()


def build_decoder(seed=1):
    torch.manual_seed(seed)
    dec = FluxVAEDecoder.__new__(FluxVAEDecoder)
    torch.nn.Module.__init__(dec)
    dec.scaling_factor, dec.shift_factor = 0.3611, 0.1159
    rev = list(reversed(BO))
    dec.conv_in = torch.nn.Conv2d(Z, rev[0], 3, padding=1)
    blocks, cin = [_res(rev[0], rev[0]), _attn(rev[0]),
                   _res(rev[0], rev[0])], rev[0]
    for i, c in enumerate(rev):
        blocks += [_res(cin, c), _res(c, c), _res(c, c)]
        cin = c
        if i != len(rev) - 1:
            blocks.append(UpSampler(c))
    dec.blocks = torch.nn.ModuleList(blocks)
    dec.conv_norm_out = torch.nn.GroupNorm(num_channels=cin, num_groups=G,
                                           eps=1e-6)
    dec.conv_act = torch.nn.SiLU()
    dec.conv_out = torch.nn.Conv2d(cin, 3, 3, padding=1)
    with torch.no_grad():
        for p in dec.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    return dec.eval()


def _patched_encoder_forward(enc, sample):
    """FluxVAEEncoder.forward but slicing to the tiny Z (the reference
    hard-codes ``[:, :16]``, flux_vae.py:431)."""
    h = enc.conv_in(sample)
    te = xe = rs = None
    for b in enc.blocks:
        h, te, xe, rs = b(h, te, xe, rs)
    h = enc.conv_out(enc.conv_act(enc.conv_norm_out(h)))
    h = h[:, :Z]
    return (h - enc.shift_factor) * enc.scaling_factor


def main():
    g = torch.Generator().manual_seed(3)
    enc, dec = build_encoder(), build_decoder()
    img = torch.rand(1, 3, 32, 32, generator=g) * 2 - 1
    z = torch.randn(1, Z, 4, 4, generator=g)
    with torch.no_grad():
        lat = _patched_encoder_forward(enc, img)
        out = dec(z)

    sd = {f"encoder.{k}": v.numpy() for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v.numpy() for k, v in dec.state_dict().items()})
    np.savez("../tests/goldens/flux_vae.npz",
             img=img.numpy(), lat=lat.numpy(), z=z.numpy(), out=out.numpy(),
             **{f"sd.{k}": v for k, v in sd.items()})
    print("wrote tests/goldens/flux_vae.npz", lat.shape, out.shape)


if __name__ == "__main__":
    main()
