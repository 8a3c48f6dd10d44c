"""FLUX.1 text encoders — thin layer over shared implementations.

TE1 (CLIP-L): the reference's FluxTextEncoderClip
(``flux_text_encoder_clip.py``) is the standard CLIP-L text tower with
quickGELU and pooled output at ``argmax(ids)`` on the final-LN states —
exactly ``models/sdxl/clip.py::clip_text_encode``'s pooling (the CLIP
tokenizer pads with eos, so first-eos == argmax).  This module adds the
converter for the reference's module naming.

TE2 (T5-XXL v1.1): the reference subclasses transformers' T5EncoderModel
(``flux_text_encoder_t5.py:5-43``); implemented by
``models/wan/text_encoder.py`` with ``shared_pos_bias=True``
(``UMT5Config.t5_v1_1_xxl()``) + ``convert_t5_encoder_state_dict``.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..sdxl.clip import CLIPTextConfig, clip_text_encode  # noqa: F401
from ..wan.text_encoder import (  # noqa: F401
    UMT5Config,
    convert_t5_encoder_state_dict,
    umt5_encode,
)


def flux_clip_l_config() -> CLIPTextConfig:
    """FLUX TE1 defaults (flux_text_encoder_clip.py:80-84)."""
    return CLIPTextConfig()  # CLIP-L, quick_gelu, first-eos pooling


def flux_encode_prompt_clip(params, cfg: CLIPTextConfig, ids):
    """-> pooled (B, hidden) — the only CLIP output FLUX consumes
    (flux_image.py encode_prompt: pooled_prompt_emb)."""
    return clip_text_encode(params, cfg, ids)["pooled"]


def convert_flux_clip_state_dict(sd: Dict[str, np.ndarray],
                                 cfg: CLIPTextConfig, dtype=None):
    """Reference FluxTextEncoderClip module naming (token_embedding /
    position_embeds / encoders.{i}.attn.to_* / fc1 / fc2 / final_layer_norm)
    onto the shared CLIP pytree."""

    def lw(name):
        p = {"w": np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = np.asarray(sd[name + ".bias"])
        return p

    def nw(name):
        return {"w": np.asarray(sd[name + ".weight"]),
                "b": np.asarray(sd[name + ".bias"])}

    layers = []
    for i in range(cfg.num_layers):
        lp = f"encoders.{i}"
        layers.append({
            "ln1": nw(lp + ".layer_norm1"),
            "attn": {
                "q_proj": lw(lp + ".attn.to_q"),
                "k_proj": lw(lp + ".attn.to_k"),
                "v_proj": lw(lp + ".attn.to_v"),
                "out_proj": lw(lp + ".attn.to_out"),
            },
            "ln2": nw(lp + ".layer_norm2"),
            "fc1": lw(lp + ".fc1"),
            "fc2": lw(lp + ".fc2"),
        })
    params = {
        "token_embedding": np.asarray(sd["token_embedding.weight"]),
        "position_embedding": np.asarray(sd["position_embeds"])[0],
        "layers": layers,
        "final_layer_norm": nw("final_layer_norm"),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)
