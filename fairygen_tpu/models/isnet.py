"""ISNet (DIS) foreground segmentation — functional NHWC JAX port.

The reference's ``create_mask.py`` extracts training masks with rembg's
``isnet-anime`` session (``stylization/dora_training/create_mask.py:8-28``),
an ISNetDIS network from "Highly Accurate Dichotomous Image Segmentation"
(Qin et al., ECCV 2022, github.com/xuebinqin/DIS ``models/isnet.py``).
rembg ships it as ONNX; this module implements the architecture natively
so masks can be produced on-TPU from the original torch/DIS checkpoints
(``convert_isnet_state_dict`` consumes the DIS state-dict naming).

TPU-native notes:
  - NHWC + HWIO convs (MXU-friendly), bf16-safe.
  - Inference-mode BatchNorm is folded into a per-channel scale/bias at
    convert time (one fused multiply-add instead of norm traffic).
  - All six RSU depths share one generic implementation parameterized by
    height; static Python loops → fully unrolled XLA program (the net is
    small: ~44M params, one jit).

Structure (ISNetDIS, isnet.py ``__init__``):
  conv_in (3->64, stride 2) -> encoder RSU7/6/5/4/4F/4F with 2x maxpools
  -> symmetric decoder with skip concats -> six 1-channel side heads,
  each bilinearly upsampled to the input size, sigmoid. The first side
  output d1 is the mask (rembg ``DisSession.predict``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class ISNetConfig:
    in_ch: int = 3
    out_ch: int = 1
    # (rsu_height_or_0_for_F, in, mid, out) per encoder stage; decoder is
    # mirrored. isnet.py ISNetDIS.__init__.
    stages: Tuple[Tuple[int, int, int, int], ...] = (
        (7, 64, 32, 64),
        (6, 64, 32, 128),
        (5, 128, 64, 256),
        (4, 256, 128, 512),
        (0, 512, 256, 512),   # RSU4F
        (0, 512, 256, 512),   # RSU4F
    )
    conv_in_ch: int = 64

    @staticmethod
    def dis() -> "ISNetConfig":
        return ISNetConfig()

    @staticmethod
    def tiny() -> "ISNetConfig":
        """Scaled-down config for tests."""
        return ISNetConfig(
            stages=(
                (7, 8, 4, 8),
                (6, 8, 4, 16),
                (5, 16, 8, 32),
                (4, 32, 16, 64),
                (0, 64, 32, 64),
                (0, 64, 32, 64),
            ),
            conv_in_ch=8,
        )

    def decoder_stages(self) -> List[Tuple[int, int, int, int]]:
        """stage5d..stage1d specs, deepest first.

        Derived from the ISNetDIS table (isnet.py):
          stage{i}d: height = stages[i-1].height,
                     in  = stages[i-1].out + previous decoder/enc6 out,
                     mid = stages[i-1].mid (halved for stage1d: RSU7(128,16,64)),
                     out = stages[i-1].in.
        """
        out: List[Tuple[int, int, int, int]] = []
        prev_out = self.stages[-1][3]  # enc stage6 output
        for i in range(len(self.stages) - 1, 0, -1):  # 5..1 -> stage{i}d
            height, enc_in, enc_mid, enc_out = self.stages[i - 1]
            mid = enc_mid if i > 1 else max(enc_mid // 2, 1)
            out.append((height, enc_out + prev_out, mid, enc_in))
            prev_out = enc_in
        return out


# -- primitives ---------------------------------------------------------------

def _conv(p: Dict[str, Any], x, *, stride: int = 1, dirate: int = 1,
          relu: bool = True):
    """3x3 conv + folded BN affine + ReLU (REBNCONV, isnet.py)."""
    pad = dirate
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), rhs_dilation=(dirate, dirate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * p["scale"] + p["bias"]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _side(p: Dict[str, Any], x):
    """Plain 3x3 conv head (side1..side6)."""
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


def _maxpool2(x):
    """2x2/2 max-pool, ceil_mode=True (isnet.py pools)."""
    h, w = x.shape[1], x.shape[2]
    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)),
                constant_values=-jnp.inf)
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _upsample_like(src, tar_hw):
    """Bilinear resize to target spatial size (_upsample_like, isnet.py;
    torch F.upsample bilinear align_corners=False == jax.image 'linear')."""
    b, _, _, c = src.shape
    return jax.image.resize(src, (b, tar_hw[0], tar_hw[1], c),
                            method="linear")


# -- RSU blocks ----------------------------------------------------------------

def _rsu_forward(p: Dict[str, Any], x, height: int):
    """RSU-L (isnet.py RSU7..RSU4): U-net inside a residual."""
    hxin = _conv(p["rebnconvin"], x)
    enc = [hxin]
    h = _conv(p["rebnconv1"], hxin)
    enc.append(h)
    for i in range(2, height):
        h = _maxpool2(h)
        h = _conv(p[f"rebnconv{i}"], h)
        enc.append(h)
    h = _conv(p[f"rebnconv{height}"], h, dirate=2)
    # decoder: deepest first
    for i in range(height - 1, 0, -1):
        skip = enc[i]
        if h.shape[1:3] != skip.shape[1:3]:
            h = _upsample_like(h, skip.shape[1:3])
        h = _conv(p[f"rebnconv{i}d"], jnp.concatenate([h, skip], axis=-1))
    return h + hxin


def _rsu4f_forward(p: Dict[str, Any], x):
    """RSU4F: all-dilated, no pooling (isnet.py RSU4F)."""
    hxin = _conv(p["rebnconvin"], x)
    h1 = _conv(p["rebnconv1"], hxin, dirate=1)
    h2 = _conv(p["rebnconv2"], h1, dirate=2)
    h3 = _conv(p["rebnconv3"], h2, dirate=4)
    h4 = _conv(p["rebnconv4"], h3, dirate=8)
    h3d = _conv(p["rebnconv3d"], jnp.concatenate([h4, h3], -1), dirate=4)
    h2d = _conv(p["rebnconv2d"], jnp.concatenate([h3d, h2], -1), dirate=2)
    h1d = _conv(p["rebnconv1d"], jnp.concatenate([h2d, h1], -1), dirate=1)
    return h1d + hxin


def _stage(p, x, height):
    return _rsu4f_forward(p, x) if height == 0 else _rsu_forward(p, x, height)


# -- full net -------------------------------------------------------------------

def isnet_forward(params: Dict[str, Any], cfg: ISNetConfig, x):
    """x: (B, H, W, 3) normalized input -> list of 6 sigmoid side maps at
    (B, H, W, 1), d1 first (= the mask; isnet.py ISNetDIS.forward)."""
    in_hw = x.shape[1:3]
    hxin = _conv(params["conv_in"], x, stride=2)
    feats = []
    h = hxin
    n = len(cfg.stages)
    for i, (height, *_rest) in enumerate(cfg.stages):
        h = _stage(params[f"stage{i + 1}"], h, height)
        feats.append(h)
        if i < n - 1:
            h = _maxpool2(h)
    # decoder
    dec_specs = cfg.decoder_stages()
    dec_feats = [feats[-1]]  # hx6
    h = feats[-1]
    for j, (height, *_rest) in enumerate(dec_specs):
        skip = feats[n - 2 - j]
        h = _upsample_like(h, skip.shape[1:3])
        h = _stage(params[f"stage{n - 1 - j}d"],
                   jnp.concatenate([h, skip], axis=-1), height)
        dec_feats.insert(0, h)
    sides = []
    for k in range(n):
        d = _side(params[f"side{k + 1}"], dec_feats[k])
        d = _upsample_like(d, in_hw)
        sides.append(jax.nn.sigmoid(d.astype(jnp.float32)))
    return sides


# -- init & conversion ----------------------------------------------------------

def _init_rebnconv(key, in_ch, out_ch):
    k1, _ = jax.random.split(key)
    return {
        "w": jax.random.normal(k1, (3, 3, in_ch, out_ch), jnp.float32)
        * (1.0 / np.sqrt(9 * in_ch)),
        "scale": jnp.ones((out_ch,), jnp.float32),
        "bias": jnp.zeros((out_ch,), jnp.float32),
    }


def _init_rsu(key, height, in_ch, mid_ch, out_ch):
    keys = jax.random.split(key, 2 * max(height, 4) + 2)
    p = {"rebnconvin": _init_rebnconv(keys[0], in_ch, out_ch)}
    if height == 0:
        p["rebnconv1"] = _init_rebnconv(keys[1], out_ch, mid_ch)
        for i, k in zip((2, 3, 4), keys[2:5]):
            p[f"rebnconv{i}"] = _init_rebnconv(k, mid_ch, mid_ch)
        for i, k in zip((3, 2), keys[5:7]):
            p[f"rebnconv{i}d"] = _init_rebnconv(k, mid_ch * 2, mid_ch)
        p["rebnconv1d"] = _init_rebnconv(keys[7], mid_ch * 2, out_ch)
        return p
    p["rebnconv1"] = _init_rebnconv(keys[1], out_ch, mid_ch)
    for i in range(2, height + 1):
        p[f"rebnconv{i}"] = _init_rebnconv(keys[i], mid_ch, mid_ch)
    for i in range(height - 1, 1, -1):
        p[f"rebnconv{i}d"] = _init_rebnconv(
            keys[height + i], mid_ch * 2, mid_ch)
    p["rebnconv1d"] = _init_rebnconv(keys[height + 1], mid_ch * 2, out_ch)
    return p


def init_isnet_params(key, cfg: ISNetConfig, dtype=jnp.float32):
    keys = jax.random.split(key, 2 * len(cfg.stages) + 2)
    params: Dict[str, Any] = {
        "conv_in": _init_rebnconv(keys[0], cfg.in_ch, cfg.conv_in_ch)
    }
    for i, (height, in_ch, mid, out) in enumerate(cfg.stages):
        params[f"stage{i + 1}"] = _init_rsu(keys[i + 1], height, in_ch,
                                            mid, out)
    for j, (height, in_ch, mid, out) in enumerate(cfg.decoder_stages()):
        idx = len(cfg.stages) - 1 - j
        params[f"stage{idx}d"] = _init_rsu(
            keys[len(cfg.stages) + 1 + j], height, in_ch, mid, out)
    # side1..side6 consume hx1d..hx5d, hx6 (out chans of dec stages + enc6)
    side_srcs = ([d[3] for d in cfg.decoder_stages()[::-1]]
                 + [cfg.stages[-1][3]])
    for k, ch in enumerate(side_srcs):
        key, sub = jax.random.split(key)
        params[f"side{k + 1}"] = {
            "w": jax.random.normal(sub, (3, 3, ch, cfg.out_ch), jnp.float32)
            * (1.0 / np.sqrt(9 * ch)),
            "b": jnp.zeros((cfg.out_ch,), jnp.float32),
        }
    return jax.tree.map(lambda a: a.astype(dtype), params)


def _fold_bn(sd: Dict[str, np.ndarray], conv: str, bn: str, eps=1e-5):
    """torch Conv2d+BatchNorm2d (inference) -> HWIO w + scale/bias."""
    w = np.asarray(sd[f"{conv}.weight"], np.float32)  # (O, I, kh, kw)
    b = np.asarray(sd.get(f"{conv}.bias", np.zeros(w.shape[0])), np.float32)
    gamma = np.asarray(sd[f"{bn}.weight"], np.float32)
    beta = np.asarray(sd[f"{bn}.bias"], np.float32)
    mean = np.asarray(sd[f"{bn}.running_mean"], np.float32)
    var = np.asarray(sd[f"{bn}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "scale": jnp.asarray(scale),
        "bias": jnp.asarray(beta + (b - mean) * scale),
    }


def convert_isnet_state_dict(sd: Dict[str, np.ndarray],
                             cfg: ISNetConfig = None,
                             dtype=jnp.float32) -> Tuple[Dict, ISNetConfig]:
    """Convert a DIS ``isnet.py`` torch state dict (also the tensors inside
    rembg's isnet-anime/isnet-general-use ONNX, which share the naming).

    Naming: ``conv_in.conv/bn``, ``stage{N}[d].rebnconv{K}[d].conv_s1/bn_s1``,
    ``side{N}.weight/bias``.
    """
    cfg = cfg or ISNetConfig.dis()

    def rebn(prefix):
        return _fold_bn(sd, f"{prefix}.conv_s1", f"{prefix}.bn_s1")

    def rsu(prefix, height):
        p = {"rebnconvin": rebn(f"{prefix}.rebnconvin")}
        top = 4 if height == 0 else height
        for i in range(1, top + 1):
            p[f"rebnconv{i}"] = rebn(f"{prefix}.rebnconv{i}")
        for i in range(top - 1, 0, -1):
            p[f"rebnconv{i}d"] = rebn(f"{prefix}.rebnconv{i}d")
        return p

    params: Dict[str, Any] = {
        "conv_in": _fold_bn(sd, "conv_in.conv", "conv_in.bn")
    }
    for i, (height, *_r) in enumerate(cfg.stages):
        params[f"stage{i + 1}"] = rsu(f"stage{i + 1}", height)
    for j, (height, *_r) in enumerate(cfg.decoder_stages()):
        idx = len(cfg.stages) - 1 - j
        params[f"stage{idx}d"] = rsu(f"stage{idx}d", height)
    for k in range(len(cfg.stages)):
        w = np.asarray(sd[f"side{k + 1}.weight"], np.float32)
        params[f"side{k + 1}"] = {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "b": jnp.asarray(np.asarray(sd[f"side{k + 1}.bias"], np.float32)),
        }
    return jax.tree.map(lambda a: a.astype(dtype), params), cfg


# -- rembg-compatible mask extraction --------------------------------------------

# rembg session presets: (input size, mean, std) per model family
PRESETS = {
    # rembg/sessions/dis_anime.py: 1024px, mean .485/.456/.406, std 1
    "isnet-anime": ((1024, 1024), (0.485, 0.456, 0.406), (1.0, 1.0, 1.0)),
    # rembg/sessions/dis_general_use.py: 1024px, mean .5, std 1
    "isnet-general-use": ((1024, 1024), (0.5, 0.5, 0.5), (1.0, 1.0, 1.0)),
}


def extract_mask(params, cfg: ISNetConfig, image_u8: np.ndarray,
                 preset: str = "isnet-anime",
                 threshold: int = 127, size=None) -> np.ndarray:
    """uint8 HWC image -> uint8 {0,255} HW mask.

    Mirrors rembg's DIS predict + the reference's binarization
    (create_mask.py:22-27): min-max normalize the d1 side output, scale
    to [0,255], threshold >127.

    size: (h, w) inference resolution overriding the preset's (the
    mean/std normalization still comes from the preset) — for resized
    checkpoints and CI-scale models.
    """
    psize, mean, std = PRESETS[preset]
    size = size or psize
    h, w = image_u8.shape[:2]
    x = jax.image.resize(
        jnp.asarray(image_u8, jnp.float32) / 255.0,
        (size[0], size[1], 3), method="linear",
    )
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    d1 = jax.jit(
        lambda p, v: isnet_forward(p, cfg, v)[0],
        static_argnames=(),
    )(params, x[None])[0, :, :, 0]
    mi, ma = jnp.min(d1), jnp.max(d1)
    pred = (d1 - mi) / jnp.maximum(ma - mi, 1e-8)
    pred = jax.image.resize(pred, (h, w), method="linear")
    arr = np.asarray(jnp.round(pred * 255.0), np.uint8)
    return ((arr > threshold).astype(np.uint8)) * 255
