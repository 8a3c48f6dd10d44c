"""FLUX LoRA fusion onto the stacked param pytree.

Port of the reference ``FluxLoRALoader`` (``animation/diffsynth/utils/
lora/flux.py``): accepts the two common FLUX LoRA layouts —

  - **diffusers** (``transformer.transformer_blocks.{i}.attn.to_q...``):
    separate q/k/v adapters, mapped onto column slices of our fused
    qkv projections;
  - **civitai/BFL** (``lora_unet_double_blocks_{i}_img_attn_qkv...``):
    fused-qkv adapters, mapped whole.

Fusion math is the reference's ``W += alpha * B @ A``
(``utils/lora/general.py:44-62``), transposed for our (in, out) layout
and indexed into the lax.scan-stacked block arrays.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .dit import FluxDiTConfig

# canonical target -> (stack key, pytree path within a block, column range
# factory given dim d). None column range = whole output.
_DOUBLE_PATHS = {
    "attn.a_to_qkv": (("attn", "a_qkv"), None),
    "attn.b_to_qkv": (("attn", "b_qkv"), None),
    "attn.a_to_q": (("attn", "a_qkv"), (0, 1)),
    "attn.a_to_k": (("attn", "a_qkv"), (1, 2)),
    "attn.a_to_v": (("attn", "a_qkv"), (2, 3)),
    "attn.b_to_q": (("attn", "b_qkv"), (0, 1)),
    "attn.b_to_k": (("attn", "b_qkv"), (1, 2)),
    "attn.b_to_v": (("attn", "b_qkv"), (2, 3)),
    "attn.a_to_out": (("attn", "a_out"), None),
    "attn.b_to_out": (("attn", "b_out"), None),
    "ff_a.0": (("ff_a", "fc1"), None),
    "ff_a.2": (("ff_a", "fc2"), None),
    "ff_b.0": (("ff_b", "fc1"), None),
    "ff_b.2": (("ff_b", "fc2"), None),
    "norm1_a.linear": (("norm1_a",), None),
    "norm1_b.linear": (("norm1_b",), None),
}
_SINGLE_PATHS = {
    "to_qkv_mlp": (("to_qkv_mlp",), None),
    "a_to_q": (("to_qkv_mlp",), (0, 1)),
    "a_to_k": (("to_qkv_mlp",), (1, 2)),
    "a_to_v": (("to_qkv_mlp",), (2, 3)),
    "proj_in_besides_attn": (("to_qkv_mlp",), (3, 7)),  # the mlp columns
    "proj_out": (("proj_out",), None),
    "norm.linear": (("norm",), None),
}

# diffusers leaf -> canonical leaf
_DIFFUSERS_DOUBLE = {
    "attn.to_q": "attn.a_to_q", "attn.to_k": "attn.a_to_k",
    "attn.to_v": "attn.a_to_v", "attn.to_out.0": "attn.a_to_out",
    "attn.add_q_proj": "attn.b_to_q", "attn.add_k_proj": "attn.b_to_k",
    "attn.add_v_proj": "attn.b_to_v", "attn.to_add_out": "attn.b_to_out",
    "ff.net.0.proj": "ff_a.0", "ff.net.2": "ff_a.2",
    "ff_context.net.0.proj": "ff_b.0", "ff_context.net.2": "ff_b.2",
    "norm1.linear": "norm1_a.linear", "norm1_context.linear": "norm1_b.linear",
}
_DIFFUSERS_SINGLE = {
    "attn.to_q": "a_to_q", "attn.to_k": "a_to_k", "attn.to_v": "a_to_v",
    "proj_mlp": "proj_in_besides_attn", "proj_out": "proj_out",
    "norm.linear": "norm.linear",
}
# civitai/BFL underscore leaf -> canonical leaf
_CIVITAI_DOUBLE = {
    "img_mod_lin": "norm1_a.linear", "txt_mod_lin": "norm1_b.linear",
    "img_attn_qkv": "attn.a_to_qkv", "txt_attn_qkv": "attn.b_to_qkv",
    "img_attn_proj": "attn.a_to_out", "txt_attn_proj": "attn.b_to_out",
    "img_mlp_0": "ff_a.0", "img_mlp_2": "ff_a.2",
    "txt_mlp_0": "ff_b.0", "txt_mlp_2": "ff_b.2",
}
_CIVITAI_SINGLE = {
    "linear1": "to_qkv_mlp", "linear2": "proj_out",
    "modulation_lin": "norm.linear",
}


def _collect(sd: Dict[str, np.ndarray]):
    """-> list of (family, block_id, canonical_leaf, A, B)."""
    pairs: Dict[Tuple, Dict[str, np.ndarray]] = {}

    def put(family, i, leaf, which, v):
        pairs.setdefault((family, int(i), leaf), {})[which] = np.asarray(v)

    for k, v in sd.items():
        m = re.match(
            r"transformer\.transformer_blocks\.(\d+)\.(.+)\.lora_([AB])\.weight", k)
        if m and m.group(2) in _DIFFUSERS_DOUBLE:
            put("double", m.group(1), _DIFFUSERS_DOUBLE[m.group(2)],
                m.group(3), v)
            continue
        m = re.match(
            r"transformer\.single_transformer_blocks\.(\d+)\.(.+)\.lora_([AB])\.weight", k)
        if m and m.group(2) in _DIFFUSERS_SINGLE:
            put("single", m.group(1), _DIFFUSERS_SINGLE[m.group(2)],
                m.group(3), v)
            continue
        m = re.match(
            r"lora_unet_double_blocks_(\d+)_(.+)\.lora_(down|up)\.weight", k)
        if m and m.group(2) in _CIVITAI_DOUBLE:
            put("double", m.group(1), _CIVITAI_DOUBLE[m.group(2)],
                "A" if m.group(3) == "down" else "B", v)
            continue
        m = re.match(
            r"lora_unet_single_blocks_(\d+)_(.+)\.lora_(down|up)\.weight", k)
        if m and m.group(2) in _CIVITAI_SINGLE:
            put("single", m.group(1), _CIVITAI_SINGLE[m.group(2)],
                "A" if m.group(3) == "down" else "B", v)
            continue
    return [(f, i, leaf, ab["A"], ab["B"])
            for (f, i, leaf), ab in pairs.items() if "A" in ab and "B" in ab]


def load_flux_lora(params, cfg: FluxDiTConfig, sd: Dict[str, np.ndarray],
                   alpha: float = 1.0):
    """Fuse a FLUX LoRA into the DiT params (returns updated pytree).

    ``W += alpha * B @ A`` per target, with q/k/v(/mlp) adapters landing on
    the right column slice of the fused projections."""
    d = cfg.dim
    entries = _collect(sd)
    if not entries:
        raise ValueError("no recognizable FLUX LoRA keys")
    for family, i, leaf, A, B in entries:
        path_map = _DOUBLE_PATHS if family == "double" else _SINGLE_PATHS
        stack = "double_blocks" if family == "double" else "single_blocks"
        path, cols = path_map[leaf]
        node = params[stack]
        for p in path:
            node = node[p]
        w = node["w"]  # (L, in, out)
        delta = (np.asarray(B, np.float32) @ np.asarray(A, np.float32)).T
        delta = jnp.asarray(alpha * delta, w.dtype)
        if cols is None:
            node["w"] = w.at[i].add(delta)
        else:
            lo, hi = cols[0] * d, cols[1] * d
            node["w"] = w.at[i, :, lo:hi].add(delta)
    return params
