"""Qwen-Image DiT LoRA fuse-at-load.

Consumes diffusers/peft-layout Qwen-Image LoRAs
(``transformer_blocks.{i}.<name>.lora_A(.default).weight`` — also what
Image2LoRA emits, ``models/qwen_image_image2lora.py:69-71``) and fuses
``W += alpha·B@A`` into the stacked DiT params, same math as the
reference ``GeneralLoRALoader.load`` (``models/flux_lora_patcher.py:
28-46``)."""
from __future__ import annotations

import re
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

# diffusers module name -> path in the stacked block pytree
_QWEN_LORA_PATHS = {
    "attn.to_q": ("attn", "to_q"),
    "attn.to_k": ("attn", "to_k"),
    "attn.to_v": ("attn", "to_v"),
    "attn.to_out.0": ("attn", "to_out"),
    "attn.add_q_proj": ("attn", "add_q"),
    "attn.add_k_proj": ("attn", "add_k"),
    "attn.add_v_proj": ("attn", "add_v"),
    "attn.to_add_out": ("attn", "to_add_out"),
    "img_mlp.net.0.proj": ("img_mlp", "fc1"),
    "img_mlp.net.2": ("img_mlp", "fc2"),
    "txt_mlp.net.0.proj": ("txt_mlp", "fc1"),
    "txt_mlp.net.2": ("txt_mlp", "fc2"),
    "img_mod.1": ("img_mod",),
    "txt_mod.1": ("txt_mod",),
}

_KEY_RE = re.compile(
    r"(?:diffusion_model\.)?(?:transformer\.)?transformer_blocks\.(\d+)\."
    r"(.+?)\.lora_([AB])(?:\.default)?\.weight$")


def load_qwen_image_lora(params, sd: Dict[str, Any], alpha: float = 1.0):
    """Fuse a Qwen-Image LoRA into the DiT params (returns the updated
    pytree)."""
    pairs: Dict[tuple, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = _KEY_RE.match(k)
        if m and m.group(2) in _QWEN_LORA_PATHS:
            pairs.setdefault((int(m.group(1)), m.group(2)), {})[
                m.group(3)] = np.asarray(v)
    if not pairs:
        raise ValueError("no recognizable Qwen-Image LoRA keys")
    for (i, name), ab in pairs.items():
        if "A" not in ab or "B" not in ab:
            continue
        node = params["blocks"]
        for p in _QWEN_LORA_PATHS[name]:
            node = node[p]
        delta = (ab["B"].astype(np.float32) @ ab["A"].astype(np.float32)).T
        node["w"] = node["w"].at[i].add(
            jnp.asarray(alpha * delta, node["w"].dtype))
    return params
