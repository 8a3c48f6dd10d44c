"""Step1x-Edit connector — functional JAX port.

Mirrors the reference ``Qwen2Connector``
(``animation/diffsynth/models/step1x_connector.py:640-663``): a
SingleTokenRefiner over the Qwen2.5-VL LLM embedding — input projection,
timestep + masked-mean context conditioning, ``depth`` refiner blocks
(self-attention with a padding mask and 2-gate AdaLN, SiLU MLP) — plus a
``global_proj_out`` pooled head scaled by ``1 + scale_factor``.  The FLUX
driver swaps its prompt/pooled embeddings for the connector outputs and
zeroes the text ids (``model_fn_flux_image``,
``pipelines/flux_image.py:1103-1106``); the Step1x reference-image
latents ride the sequence kontext-style and the output keeps the first
half (:1121-1126, :1199-1201).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...ops.attention import attention
from .dit import _timestep_sinusoid


@dataclasses.dataclass(frozen=True)
class Step1xConnectorConfig:
    in_channels: int = 3584  # Qwen2.5-VL-7B hidden
    hidden_size: int = 4096
    heads_num: int = 32
    depth: int = 2
    mlp_ratio: int = 4
    freq_dim: int = 256
    pooled_dim: int = 768

    @staticmethod
    def tiny(**over) -> "Step1xConnectorConfig":
        base = dict(in_channels=24, hidden_size=32, heads_num=4, depth=2,
                    freq_dim=16, pooled_dim=12)
        base.update(over)
        return Step1xConnectorConfig(**base)


def _dense(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _ln(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        xf.var(-1, keepdims=True) + eps)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


def step1x_connector_forward(params, cfg: Step1xConnectorConfig, x, t, mask):
    """x (B, L, in_channels) LLM embedding, t (B,) timestep (already /1000
    by the driver), mask (B, L) 0/1 -> (prompt_emb (B, L, hidden),
    pooled (B, pooled_dim))."""
    b, l, _ = x.shape
    dtype = x.dtype
    mf = mask.astype(jnp.float32)[..., None]

    x_mean = (x.astype(jnp.float32) * mf).sum(1) / mf.sum(1)
    # pooled head consumes the mean scaled by 1 + scale_factor
    # (Qwen2Connector.forward, step1x_connector.py:655-659)
    scaled_mean = x_mean * (1.0 + params["scale_factor"].astype(jnp.float32))
    pooled = _dense(params["global_proj_out"], scaled_mean.astype(dtype))

    # conditioning: timestep + masked-mean context projection
    t_emb = _dense(params["t_mlp"]["fc2"], jax.nn.silu(
        _dense(params["t_mlp"]["fc1"],
               _timestep_sinusoid(t, cfg.freq_dim).astype(dtype))))
    c_emb = _dense(params["c_mlp"]["fc2"], jax.nn.silu(
        _dense(params["c_mlp"]["fc1"], x_mean.astype(dtype))))
    c = t_emb + c_emb  # (B, hidden)

    h = _dense(params["input_embedder"], x)

    # padding mask: token i attends j iff both valid; column 0 always
    # allowed (IndividualTokenRefiner.forward, step1x_connector.py:523-537)
    valid = mask.astype(bool)
    allow = valid[:, :, None] & valid[:, None, :]
    allow = allow.at[:, :, 0].set(True)
    bias = jnp.where(allow, 0.0, -1e30).astype(jnp.float32)[:, None]

    nh, hd = cfg.heads_num, cfg.hidden_size // cfg.heads_num

    def body(h, p):
        gates = _dense(p["adaln"], jax.nn.silu(c))
        g_msa, g_mlp = jnp.split(gates[:, None, :], 2, axis=-1)
        y = _ln(p["norm1"], h)
        qkv = _dense(p["qkv"], y).reshape(b, l, 3, nh, hd)
        o = attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias=bias)
        h = h + g_msa * _dense(p["proj"], o.reshape(b, l, nh * hd))
        y = _ln(p["norm2"], h)
        ff = _dense(p["fc2"], jax.nn.silu(_dense(p["fc1"], y)))
        return h + g_mlp * ff, None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    return h, pooled


def convert_step1x_connector_state_dict(sd: Dict[str, Any],
                                        cfg: Optional[Step1xConnectorConfig]
                                        = None, dtype=None):
    import numpy as _np

    if cfg is None:
        w = sd["S.input_embedder.weight"]
        cfg = Step1xConnectorConfig(
            in_channels=w.shape[1], hidden_size=w.shape[0],
            depth=1 + max(int(k.split(".")[3]) for k in sd
                          if k.startswith("S.individual_token_refiner.")),
            pooled_dim=sd["global_proj_out.weight"].shape[0])

    def lin(name):
        return {"w": _np.asarray(sd[name + ".weight"]).T,
                "b": _np.asarray(sd[name + ".bias"])}

    def ln(name):
        return {"w": _np.asarray(sd[name + ".weight"]),
                "b": _np.asarray(sd[name + ".bias"])}

    def block(i):
        pre = f"S.individual_token_refiner.blocks.{i}"
        return {
            "norm1": ln(pre + ".norm1"),
            "qkv": lin(pre + ".self_attn_qkv"),
            "proj": lin(pre + ".self_attn_proj"),
            "norm2": ln(pre + ".norm2"),
            "fc1": lin(pre + ".mlp.fc1"),
            "fc2": lin(pre + ".mlp.fc2"),
            "adaln": lin(pre + ".adaLN_modulation.1"),
        }

    params = {
        "input_embedder": lin("S.input_embedder"),
        "t_mlp": {"fc1": lin("S.t_embedder.mlp.0"),
                  "fc2": lin("S.t_embedder.mlp.2")},
        "c_mlp": {"fc1": lin("S.c_embedder.linear_1"),
                  "fc2": lin("S.c_embedder.linear_2")},
        "blocks": jax.tree.map(lambda *xs: _np.stack(xs),
                               *[block(i) for i in range(cfg.depth)]),
        "global_proj_out": lin("global_proj_out"),
        "scale_factor": _np.asarray(sd["scale_factor"]),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params), cfg
