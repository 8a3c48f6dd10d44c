"""LPIPS perceptual distance (SqueezeNet backbone) — TPU-native port.

The reference metric battery uses
``LearnedPerceptualImagePatchSimilarity(net_type='squeeze')``
(``evaluate_brushnet.py:43``) and TrajectoryImitationLoss regularizes with
LPIPS (``diffusion/loss.py:36-119``).  This implements the published LPIPS
architecture: torchvision SqueezeNet-1.1 features split into 7 slices,
per-layer unit-normalized activations, squared differences through learned
1x1 "lin" heads, spatially averaged and summed.

Weights load from the ``lpips`` package's combined state dict
(``lpips.LPIPS(net='squeeze').state_dict()`` layout: ``scaling_layer.*``,
``net.sliceK.*``, ``linK.model.1.weight``) via
:func:`convert_lpips_state_dict`.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# SqueezeNet-1.1 feature plan: (type, args)
#   conv: (out, kernel, stride) ; fire: (squeeze, expand)
# slice boundaries follow lpips.pretrained_networks.squeezenet
_SLICES = [
    [("conv", 64, 3, 2)],                     # slice1 (+ReLU)
    [("pool",), ("fire", 16, 64), ("fire", 16, 64)],       # slice2
    [("pool",), ("fire", 32, 128), ("fire", 32, 128)],     # slice3
    [("pool",), ("fire", 48, 192)],                         # slice4
    [("fire", 48, 192)],                                    # slice5
    [("fire", 64, 256)],                                    # slice6
    [("fire", 64, 256)],                                    # slice7
]
LPIPS_CHANNELS = [64, 128, 256, 384, 384, 512, 512]

# lpips scaling layer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(p, x, stride=1, padding=0):
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, :, None, None]
    return y


def _maxpool(x):
    # torch MaxPool2d(kernel_size=3, stride=2, ceil_mode=True)
    b, c, h, w = x.shape
    ph = (-(h - 3)) % 2
    pw = (-(w - 3)) % 2
    x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)),
                constant_values=-jnp.inf)
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                             "VALID")


def _fire(p, x):
    s = jax.nn.relu(_conv(p["squeeze"], x))
    e1 = jax.nn.relu(_conv(p["expand1x1"], s))
    e3 = jax.nn.relu(_conv(p["expand3x3"], s, padding=1))
    return jnp.concatenate([e1, e3], axis=1)


def squeezenet_features(params, x):
    """x (B, 3, H, W) scaling-layer output -> list of 7 slice activations."""
    feats = []
    for slice_params, plan in zip(params["slices"], _SLICES):
        it = iter(slice_params)
        for op in plan:
            if op[0] == "conv":
                x = jax.nn.relu(_conv(next(it), x, stride=op[3]))
            elif op[0] == "pool":
                x = _maxpool(x)
            else:
                x = _fire(next(it), x)
        feats.append(x)
    return feats


def lpips_distance(params, img_a, img_b):
    """img (B, 3, H, W) in [-1, 1] -> LPIPS distance (B,)."""

    def scale(x):
        return ((x.astype(jnp.float32)
                 - jnp.asarray(_SHIFT)[None, :, None, None])
                / jnp.asarray(_SCALE)[None, :, None, None])

    fa = squeezenet_features(params, scale(img_a))
    fb = squeezenet_features(params, scale(img_b))
    total = 0.0
    for a, b, lin in zip(fa, fb, params["lins"]):
        na = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        w = lin["w"].astype(d.dtype)  # (1, C, 1, 1)
        total = total + jnp.mean(jnp.sum(d * w[0, :, 0, 0][None, :, None, None],
                                         axis=1), axis=(1, 2))
    return total


def convert_lpips_state_dict(sd: Dict[str, np.ndarray], dtype=None):
    """lpips.LPIPS(net='squeeze') state dict -> our param pytree."""

    def cw(name):
        p = {"w": np.asarray(sd[name + ".weight"])}
        if name + ".bias" in sd:
            p["b"] = np.asarray(sd[name + ".bias"])
        return p

    slices = []
    for k, plan in enumerate(_SLICES, start=1):
        # torch slices are Sequential with original feature indices as names
        idxs = sorted(
            {int(key.split(".")[2]) for key in sd
             if key.startswith(f"net.slice{k}.") and key.endswith(".weight")
             and "squeeze" not in key and "expand" not in key}
            | {int(key.split(".")[2]) for key in sd
               if key.startswith(f"net.slice{k}.") and ".squeeze." in key}
        )
        mods = []
        for idx in idxs:
            base = f"net.slice{k}.{idx}"
            if base + ".weight" in sd:  # plain conv
                mods.append(cw(base))
            elif base + ".squeeze.weight" in sd:  # fire module
                mods.append({
                    "squeeze": cw(base + ".squeeze"),
                    "expand1x1": cw(base + ".expand1x1"),
                    "expand3x3": cw(base + ".expand3x3"),
                })
        slices.append(mods)

    def lin_key(k):
        # lpips package: linK.model.1.weight ; plain Sequential: linK.1.weight
        for cand in (f"lin{k}.model.1.weight", f"lin{k}.1.weight"):
            if cand in sd:
                return cand
        raise KeyError(f"lin{k} weight not found")

    lins = [{"w": np.asarray(sd[lin_key(k)])} for k in range(len(_SLICES))]
    params: Dict[str, Any] = {"slices": slices, "lins": lins}
    if dtype is not None:
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    else:
        params = jax.tree.map(jnp.asarray, params)
    return params
