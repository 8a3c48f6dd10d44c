"""ISNet (DIS) parity vs an independent torch implementation.

The torch double below follows the DIS ``models/isnet.py`` architecture and
state-dict naming (REBNCONV conv_s1/bn_s1, stage{N}[d], side{N}) — the same
naming ``convert_isnet_state_dict`` consumes, so real rembg/DIS checkpoints
load identically.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fairygen_tpu.models.isnet import (  # noqa: E402
    ISNetConfig,
    convert_isnet_state_dict,
    extract_mask,
    init_isnet_params,
    isnet_forward,
)


class REBNCONV(nn.Module):
    def __init__(self, in_ch, out_ch, dirate=1, stride=1):
        super().__init__()
        self.conv_s1 = nn.Conv2d(in_ch, out_ch, 3, padding=dirate,
                                 dilation=dirate, stride=stride)
        self.bn_s1 = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn_s1(self.conv_s1(x)))


def _up(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear")


class RSU(nn.Module):
    def __init__(self, height, in_ch, mid_ch, out_ch):
        super().__init__()
        self.height = height
        self.rebnconvin = REBNCONV(in_ch, out_ch)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch)
        for i in range(2, height):
            setattr(self, f"rebnconv{i}", REBNCONV(mid_ch, mid_ch))
        setattr(self, f"rebnconv{height}", REBNCONV(mid_ch, mid_ch, dirate=2))
        for i in range(height - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", REBNCONV(mid_ch * 2, mid_ch))
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        enc = [hxin, self.rebnconv1(hxin)]
        h = enc[1]
        for i in range(2, self.height):
            h = getattr(self, f"rebnconv{i}")(self.pool(h))
            enc.append(h)
        h = getattr(self, f"rebnconv{self.height}")(h)
        for i in range(self.height - 1, 0, -1):
            skip = enc[i]
            if h.shape[2:] != skip.shape[2:]:
                h = _up(h, skip)
            h = getattr(self, f"rebnconv{i}d")(torch.cat([h, skip], 1))
        return h + hxin


class RSU4F(nn.Module):
    def __init__(self, in_ch, mid_ch, out_ch):
        super().__init__()
        self.rebnconvin = REBNCONV(in_ch, out_ch)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch, dirate=1)
        self.rebnconv2 = REBNCONV(mid_ch, mid_ch, dirate=2)
        self.rebnconv3 = REBNCONV(mid_ch, mid_ch, dirate=4)
        self.rebnconv4 = REBNCONV(mid_ch, mid_ch, dirate=8)
        self.rebnconv3d = REBNCONV(mid_ch * 2, mid_ch, dirate=4)
        self.rebnconv2d = REBNCONV(mid_ch * 2, mid_ch, dirate=2)
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch, dirate=1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        h1 = self.rebnconv1(hxin)
        h2 = self.rebnconv2(h1)
        h3 = self.rebnconv3(h2)
        h4 = self.rebnconv4(h3)
        h3d = self.rebnconv3d(torch.cat([h4, h3], 1))
        h2d = self.rebnconv2d(torch.cat([h3d, h2], 1))
        h1d = self.rebnconv1d(torch.cat([h2d, h1], 1))
        return h1d + hxin


class MyREBNCONV(nn.Module):
    def __init__(self, in_ch, out_ch, stride=2):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1)
        self.bn = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class ISNetTorch(nn.Module):
    def __init__(self, cfg: ISNetConfig):
        super().__init__()
        self.cfg = cfg

        def make(spec):
            height, i, m, o = spec
            return RSU4F(i, m, o) if height == 0 else RSU(height, i, m, o)

        self.conv_in = MyREBNCONV(cfg.in_ch, cfg.conv_in_ch)
        for n, spec in enumerate(cfg.stages):
            setattr(self, f"stage{n + 1}", make(spec))
        for j, spec in enumerate(cfg.decoder_stages()):
            setattr(self, f"stage{len(cfg.stages) - 1 - j}d", make(spec))
        side_srcs = ([d[3] for d in cfg.decoder_stages()[::-1]]
                     + [cfg.stages[-1][3]])
        for k, ch in enumerate(side_srcs):
            setattr(self, f"side{k + 1}",
                    nn.Conv2d(ch, cfg.out_ch, 3, padding=1))
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)

    def forward(self, x):
        n = len(self.cfg.stages)
        h = self.conv_in(x)
        feats = []
        for i in range(n):
            h = getattr(self, f"stage{i + 1}")(h)
            feats.append(h)
            if i < n - 1:
                h = self.pool(h)
        dec = [feats[-1]]
        h = feats[-1]
        for i in range(n - 1, 0, -1):
            skip = feats[i - 1]
            h = getattr(self, f"stage{i}d")(
                torch.cat([_up(h, skip), skip], 1))
            dec.insert(0, h)
        sides = []
        for k in range(n):
            d = getattr(self, f"side{k + 1}")(dec[k])
            sides.append(torch.sigmoid(_up(d, x)))
        return sides


def _randomize_bn_stats(model, gen):
    # non-trivial running stats so the BN fold is actually exercised
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=gen) * 0.3)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=gen) + 0.5)
            nn.init.normal_(m.weight, 1.0, 0.2, generator=gen)
            nn.init.normal_(m.bias, 0.0, 0.2, generator=gen)


@pytest.mark.slow
def test_isnet_matches_torch_tiny():
    cfg = ISNetConfig.tiny()
    gen = torch.Generator().manual_seed(0)
    model = ISNetTorch(cfg)
    with torch.no_grad():
        _randomize_bn_stats(model, gen)
    model.eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()
          if "num_batches_tracked" not in k}
    params, _ = convert_isnet_state_dict(sd, cfg)

    x = torch.randn(1, 3, 96, 64, generator=gen)
    with torch.no_grad():
        ref = [s.numpy() for s in model(x)]
    got = isnet_forward(params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert len(got) == len(ref) == 6
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(g)[..., 0], r[:, 0], rtol=2e-4, atol=2e-5)


def test_isnet_full_config_structure():
    """The DIS-size config builds and the torch double's state dict keys
    exactly match what the converter consumes."""
    cfg = ISNetConfig.dis()
    assert cfg.decoder_stages() == [
        (0, 1024, 256, 512),  # stage5d = RSU4F(1024,256,512)
        (4, 1024, 128, 256),  # stage4d = RSU4(1024,128,256)
        (5, 512, 64, 128),    # stage3d = RSU5(512,64,128)
        (6, 256, 32, 64),     # stage2d = RSU6(256,32,64)
        (7, 128, 16, 64),     # stage1d = RSU7(128,16,64)
    ]
    shapes = jax.eval_shape(
        lambda: init_isnet_params(jax.random.key(0), cfg))
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 40e6 < n_params < 50e6  # ISNetDIS is ~44M params


@pytest.mark.slow
def test_extract_mask_binary():
    cfg = ISNetConfig.tiny()
    params = init_isnet_params(jax.random.key(1), cfg)
    img = (np.random.default_rng(0).random((48, 40, 3)) * 255).astype(np.uint8)
    # tiny preset shapes: run at reduced size via the general preset table
    from fairygen_tpu.models import isnet as mod

    mod.PRESETS["_test"] = ((64, 64), (0.5, 0.5, 0.5), (1.0, 1.0, 1.0))
    mask = extract_mask(params, cfg, img, preset="_test")
    assert mask.shape == (48, 40)
    assert set(np.unique(mask)) <= {0, 255}
