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


def guess_lora_alpha(sd: Dict[str, np.ndarray]) -> float:
    """Kohya-style ``.alpha`` scale detection (utils/lora/flux.py:113-123).

    Kohya checkpoints store a scalar ``<target>.alpha`` next to each pair;
    the effective update is ``(alpha/rank) * B @ A``.  Like the reference,
    sample the first alpha that has a matching down/A weight and return
    ``sqrt(alpha/rank)`` — the loader applies it to BOTH factors, so the
    product picks up the full ``alpha/rank``.  1.0 when no alpha keys."""
    for name, param in sd.items():
        if ".alpha" in name:
            for suffix in (".lora_down.weight", ".lora_A.weight"):
                down = name.replace(".alpha", suffix)
                if down in sd:
                    rank = sd[down].shape[0]
                    return float(np.sqrt(float(np.asarray(param)) / rank))
    return 1.0


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
    alpha = alpha * guess_lora_alpha(sd) ** 2  # net kohya alpha/rank scale
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


# ---------------------------------------------------------------------------
# Format conversion (reference FluxLoRAConverter, utils/lora/flux.py:207-306)

_OPENSOURCE_MIDDLE = {  # canonical middle -> kohya middle
    "norm.linear": "modulation_lin",
    "to_qkv_mlp": "linear1",
    "proj_out": "linear2",
    "norm1_a.linear": "img_mod_lin",
    "norm1_b.linear": "txt_mod_lin",
    "attn.a_to_qkv": "img_attn_qkv",
    "attn.b_to_qkv": "txt_attn_qkv",
    "attn.a_to_out": "img_attn_proj",
    "attn.b_to_out": "txt_attn_proj",
    "ff_a.0": "img_mlp_0",
    "ff_a.2": "img_mlp_2",
    "ff_b.0": "txt_mlp_0",
    "ff_b.2": "txt_mlp_2",
}
_OPENSOURCE_PREFIX = {"blocks": "lora_unet_double_blocks",
                      "single_blocks": "lora_unet_single_blocks"}


def flux_lora_to_opensource(sd: Dict[str, np.ndarray], alpha=None):
    """``FluxLoRAConverter.align_to_opensource_format`` (flux.py:211-255):
    canonical/diffsynth-layout LoRA keys (``blocks.{i}.attn.a_to_qkv.
    lora_A.weight``, optionally with a peft ``.default.`` infix) -> the
    kohya/BFL underscore layout, with a scalar ``.alpha`` emitted per pair
    (defaulting to the rank, i.e. neutral alpha/rank scaling).  Targets
    without a kohya name (per-leaf q/k/v adapters) are dropped, matching
    the reference."""
    out: Dict[str, np.ndarray] = {}
    for name, param in sd.items():
        names = name.split(".")
        if len(names) < 4:
            continue
        if names[-2] not in ("lora_A", "lora_B"):
            names.pop(-2)  # peft ".default." infix
        prefix, block_id = names[0], names[1]
        middle = ".".join(names[2:-2])
        if prefix not in _OPENSOURCE_PREFIX or middle not in _OPENSOURCE_MIDDLE:
            continue
        suffix = ("lora_up.weight" if names[-2] == "lora_B"
                  else "lora_down.weight")
        rename = (f"{_OPENSOURCE_PREFIX[prefix]}_{block_id}_"
                  f"{_OPENSOURCE_MIDDLE[middle]}.{suffix}")
        out[rename] = np.asarray(param)
        if suffix == "lora_up.weight":
            a = alpha if alpha is not None else param.shape[-1]
            out[rename.replace("lora_up.weight", "alpha")] = np.asarray(
                a, dtype=np.asarray(param).dtype)
    return out


def flux_lora_to_canonical(sd: Dict[str, np.ndarray]):
    """``FluxLoRAConverter.align_to_diffsynth_format`` (flux.py:256-306):
    kohya/BFL underscore keys -> canonical dotted layout (``blocks.{i}.
    attn.a_to_qkv.lora_A.weight``).  Unrecognized keys pass through
    unchanged, like the reference."""
    inv_prefix = {v: k for k, v in _OPENSOURCE_PREFIX.items()}
    inv_middle = {v: k for k, v in _OPENSOURCE_MIDDLE.items()}
    out: Dict[str, np.ndarray] = {}
    for name, param in sd.items():
        m = re.match(
            r"(lora_unet_(?:double|single)_blocks)_(\d+)_(.+)\.lora_(down|up)\.weight",
            name)
        if m and m.group(3) in inv_middle:
            ab = "lora_A" if m.group(4) == "down" else "lora_B"
            out[f"{inv_prefix[m.group(1)]}.{m.group(2)}."
                f"{inv_middle[m.group(3)]}.{ab}.weight"] = param
        else:
            out[name] = param
    return out
