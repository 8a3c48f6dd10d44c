"""Qwen-Image blockwise ControlNet — functional JAX port.

Mirrors the reference ``QwenImageBlockWiseControlNet``
(``animation/diffsynth/models/qwen_image_controlnet.py``): a per-DiT-block
residual adapter — one ``[RMSNorm(x) + RMSNorm(cond) -> Linear -> GELU ->
Linear]`` block per transformer block, fed by a single ``img_in``
projection of the 2x2-packed conditioning latents; the output is added to
the main-image tokens after every DiT block
(``pipelines/qwen_image.py:797-805``), scale/sum/progress-gated by
``QwenImageBlockwiseMultiControlNet`` (:206-224).

TPU-native: the per-block adapter params ride the main DiT's ``lax.scan``
as stacked xs (see ``qwen_image_dit_forward(blockwise_controlnet=...)``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ...ops.norms import rms_norm
from .dit import _dense


@dataclasses.dataclass(frozen=True)
class QwenImageBlockwiseControlNetConfig:
    num_layers: int = 60
    in_dim: int = 64  # 16-ch latents packed 2x2
    additional_in_dim: int = 0  # inpaint variant: +4 packed mask dims
    dim: int = 3072
    eps: float = 1e-6

    @staticmethod
    def tiny(**over) -> "QwenImageBlockwiseControlNetConfig":
        base = dict(num_layers=2, in_dim=16, dim=96)
        base.update(over)
        return QwenImageBlockwiseControlNetConfig(**base)


def qwen_blockwise_cond_embed(params, cfg, cond_packed):
    """``process_controlnet_conditioning`` (qwen_image_controlnet.py:52-53):
    project the 2x2-packed conditioning latents once before the denoise
    loop."""
    return _dense(params["img_in"], cond_packed)


def qwen_blockwise_block(p, x, cond, eps: float):
    """``BlockWiseControlBlock.forward`` (qwen_image_controlnet.py:16-21);
    the GELU is exact (``nn.GELU()`` default), not tanh."""
    x = rms_norm(x, p["x_rms"], eps)
    cond = rms_norm(cond, p["y_rms"], eps)
    h = _dense(p["input_proj"], x + cond)
    return _dense(p["output_proj"], jax.nn.gelu(h, approximate=False))


def init_qwen_blockwise_controlnet_params(
        key, cfg: QwenImageBlockwiseControlNetConfig, dtype=jnp.float32):
    from .dit import _init_dense

    d = cfg.dim
    k_in, k_blocks = jax.random.split(key)

    def block(k):
        k1, k2 = jax.random.split(k)
        return {
            "x_rms": jnp.ones((d,), dtype),
            "y_rms": jnp.ones((d,), dtype),
            "input_proj": _init_dense(k1, d, d, dtype),
            "output_proj": _init_dense(k2, d, d, dtype),
        }

    blocks = [block(jax.random.fold_in(k_blocks, i))
              for i in range(cfg.num_layers)]
    return {
        "img_in": _init_dense(k_in, cfg.in_dim + cfg.additional_in_dim, d,
                              dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


def convert_qwen_blockwise_controlnet_state_dict(
        sd: Dict[str, Any], cfg: QwenImageBlockwiseControlNetConfig,
        dtype=None):
    import numpy as _np

    def lin(name):
        return {"w": _np.asarray(sd[name + ".weight"]).T,
                "b": _np.asarray(sd[name + ".bias"])}

    def block(i):
        pre = f"controlnet_blocks.{i}"
        return {
            "x_rms": _np.asarray(sd[pre + ".x_rms.weight"]),
            "y_rms": _np.asarray(sd[pre + ".y_rms.weight"]),
            "input_proj": lin(pre + ".input_proj"),
            "output_proj": lin(pre + ".output_proj"),
        }

    params = {
        "img_in": lin("img_in"),
        "blocks": jax.tree.map(
            lambda *xs: _np.stack(xs),
            *[block(i) for i in range(cfg.num_layers)]),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)


def detect_qwen_blockwise_controlnet_config(
        sd: Dict[str, Any], dim: int = 3072,
        base_in_dim: int = 64) -> QwenImageBlockwiseControlNetConfig:
    n = 1 + max(int(k.split(".")[1]) for k in sd
                if k.startswith("controlnet_blocks."))
    total_in = sd["img_in.weight"].shape[1]
    return QwenImageBlockwiseControlNetConfig(
        num_layers=n, in_dim=min(base_in_dim, total_in),
        additional_in_dim=max(0, total_in - base_in_dim),
        dim=sd["img_in.weight"].shape[0])
