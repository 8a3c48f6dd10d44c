"""FLUX value control — functional JAX port.

Mirrors the reference ``SingleValueEncoder`` / ``MultiValueEncoder``
(``animation/diffsynth/models/flux_value_control.py``): a scalar control
value (e.g. an aesthetic preference) becomes ``prefer_len`` learned text
tokens — sinusoid(value·1000) -> Linear/SiLU/Linear -> broadcast + learned
positional embedding — appended to the prompt embedding with zero text
ids (``FluxImageUnit_ValueControl``, ``pipelines/flux_image.py:764-790``,
applied to both CFG branches).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from .dit import _timestep_sinusoid


@dataclasses.dataclass(frozen=True)
class SingleValueEncoderConfig:
    dim_in: int = 256
    dim_out: int = 4096
    prefer_len: int = 32

    @staticmethod
    def tiny(**over) -> "SingleValueEncoderConfig":
        base = dict(dim_in=32, dim_out=48, prefer_len=4)
        base.update(over)
        return SingleValueEncoderConfig(**base)


def single_value_encode(params, cfg: SingleValueEncoderConfig, value):
    """value: scalar array () or (1,) -> (prefer_len, dim_out) tokens
    (reference SingleValueEncoder.forward, flux_value_control.py:35-44)."""
    v = jnp.reshape(jnp.asarray(value, jnp.float32), (1,)) * 1000.0
    emb = _timestep_sinusoid(v, cfg.dim_in)
    emb = jnp.dot(emb, params["fc1"]["w"]) + params["fc1"]["b"]
    emb = jax.nn.silu(emb)
    emb = jnp.dot(emb, params["fc2"]["w"]) + params["fc2"]["b"]
    base = jnp.broadcast_to(emb, (cfg.prefer_len, cfg.dim_out))
    return base + params["pos"]


def multi_value_encode(encoders, values: Sequence):
    """MultiValueEncoder (flux_value_control.py:12-19): one encoder per
    value, None values skipped, concatenated along the token axis ->
    (1, sum_prefer, dim_out)."""
    embs = [single_value_encode(p, cfg, v)
            for (p, cfg), v in zip(encoders, values) if v is not None]
    return jnp.concatenate(embs, axis=0)[None]


def init_single_value_encoder_params(key, cfg: SingleValueEncoderConfig,
                                     dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    lim1, lim2 = cfg.dim_in ** -0.5, cfg.dim_out ** -0.5
    return {
        "fc1": {"w": jax.random.uniform(k1, (cfg.dim_in, cfg.dim_out),
                                        dtype, -lim1, lim1),
                "b": jnp.zeros((cfg.dim_out,), dtype)},
        "fc2": {"w": jax.random.uniform(k2, (cfg.dim_out, cfg.dim_out),
                                        dtype, -lim2, lim2),
                "b": jnp.zeros((cfg.dim_out,), dtype)},
        "pos": jax.random.normal(k3, (cfg.prefer_len, cfg.dim_out), dtype),
    }


def convert_single_value_encoder_state_dict(sd: Dict[str, Any],
                                            cfg=None, dtype=None):
    import numpy as _np

    if cfg is None:
        w = sd["prefer_value_embedder.0.weight"]
        cfg = SingleValueEncoderConfig(
            dim_in=w.shape[1], dim_out=w.shape[0],
            prefer_len=sd["positional_embedding"].shape[0])
    params = {
        "fc1": {"w": _np.asarray(sd["prefer_value_embedder.0.weight"]).T,
                "b": _np.asarray(sd["prefer_value_embedder.0.bias"])},
        "fc2": {"w": _np.asarray(sd["prefer_value_embedder.2.weight"]).T,
                "b": _np.asarray(sd["prefer_value_embedder.2.bias"])},
        "pos": _np.asarray(sd["positional_embedding"]),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params), cfg
