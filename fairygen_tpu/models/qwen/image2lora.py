"""Qwen-Image Image2LoRA — functional JAX port.

Mirrors the reference ``QwenImageImage2LoRAModel``
(``animation/diffsynth/models/qwen_image_image2lora.py``): per-DiT-block
trainer blocks that turn a (SigLIP2 ‖ DINOv3) pooled image embedding —
optionally with a Qwen2.5-VL residual stream through a ``SequencialMLP``
— into rank-``r`` LoRA A/B matrices for the Qwen DiT's attention/MLP/mod
layers.  Three released variants (style / coarse / fine) are merged
rank-concat at alpha 1/n and fused into the DiT like any other LoRA
(``QwenImageUnit_Image2LoRADecode``, ``pipelines/qwen_image.py:653-678``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (name, lora_a_dim, lora_b_dim) groups (qwen_image_image2lora.py:77-97);
# dims scale with the DiT width (3072 reference)
_PATTERN_GROUPS = (
    (("attn.to_q", 1, 1), ("attn.to_k", 1, 1), ("attn.to_v", 1, 1),
     ("attn.to_out.0", 1, 1)),
    (("img_mlp.net.2", 4, 1), ("img_mod.1", 1, 6)),
    (("attn.add_q_proj", 1, 1), ("attn.add_k_proj", 1, 1),
     ("attn.add_v_proj", 1, 1), ("attn.to_add_out", 1, 1)),
    (("txt_mlp.net.2", 4, 1), ("txt_mod.1", 1, 6)),
)


@dataclasses.dataclass(frozen=True)
class QwenImage2LoRAConfig:
    num_blocks: int = 60
    dim: int = 3072  # target DiT width
    in_dim: int = 1536 + 4096  # SigLIP2-g ‖ DINOv3 pooled
    compress_dim: int = 128
    rank: int = 4
    use_residual: bool = True
    residual_length: int = 64 + 7
    residual_dim: int = 3584
    residual_mid_dim: int = 1024
    residual_scale: float = 0.05

    @staticmethod
    def tiny(**over) -> "QwenImage2LoRAConfig":
        base = dict(num_blocks=2, dim=96, in_dim=24, compress_dim=8, rank=2,
                    residual_length=3, residual_dim=16, residual_mid_dim=4)
        base.update(over)
        return QwenImage2LoRAConfig(**base)


def _nobias(p, x):
    return jnp.dot(x, p["w"].astype(x.dtype))


def image2lora_forward(params, cfg: QwenImage2LoRAConfig, x,
                       residual=None) -> Dict[str, Any]:
    """x (1, in_dim); residual (1, residual_length*residual_dim) flattened
    Qwen2.5-VL embedding or None -> diffusers-layout LoRA dict
    (``transformer_blocks.{i}.{name}.lora_A/B.default.weight``)."""
    lora = {}
    if residual is not None and cfg.use_residual:
        residual = residual * cfg.residual_scale
    elif not cfg.use_residual:
        residual = None
    for gi, group in enumerate(_PATTERN_GROUPS):
        for b in range(cfg.num_blocks):
            p = params["blocks"][gi * cfg.num_blocks + b]
            res = None
            if residual is not None:
                # SequencialMLP (qwen_image_image2lora.py:33-47)
                rp = p["proj_residual"]
                h = residual.reshape(cfg.residual_length, cfg.residual_dim)
                h = _nobias(rp["proj_in"], h)
                h = h.reshape(1, cfg.residual_length * cfg.residual_mid_dim)
                res = _nobias(rp["proj_out"], h)
            for li, (name, am, bm) in enumerate(group):
                lp = p["layers"][li]
                a = _nobias(lp["proj_a"]["proj_out"],
                            _nobias(lp["proj_a"]["proj_in"], x)
                            + (0.0 if res is None else res))
                bmat = _nobias(lp["proj_b"]["proj_out"],
                               _nobias(lp["proj_b"]["proj_in"], x)
                               + (0.0 if res is None else res))
                a = a.reshape(cfg.rank, am * cfg.dim)
                bmat = bmat.reshape(bm * cfg.dim, cfg.rank)
                key = f"transformer_blocks.{b}.{name}"
                lora[key + ".lora_A.default.weight"] = a
                lora[key + ".lora_B.default.weight"] = bmat
    return lora


def merge_image2lora(loras: List[Dict[str, Any]],
                     alpha: Optional[float] = None) -> Dict[str, Any]:
    """Rank-concat merge with alpha scaling on the A side (reference
    ``merge_lora``, utils/lora/merge.py:10-20; alpha = 1/n in the decode
    unit)."""
    if alpha is None:
        alpha = 1.0 / len(loras)
    out = {}
    for k in loras[0]:
        if ".lora_A." in k:
            out[k] = jnp.concatenate([l[k] * alpha for l in loras], axis=0)
        else:
            out[k] = jnp.concatenate([l[k] for l in loras], axis=1)
    return out


def convert_image2lora_state_dict(sd: Dict[str, Any],
                                  cfg: Optional[QwenImage2LoRAConfig] = None,
                                  dtype=None):
    import numpy as _np

    if cfg is None:
        n = (1 + max(int(k.split(".")[1]) for k in sd
                     if k.startswith("blocks."))) // len(_PATTERN_GROUPS)
        a0 = sd["blocks.0.layers.0.proj_a.proj_out.weight"]
        pin = sd["blocks.0.layers.0.proj_a.proj_in.weight"]
        kw = dict(num_blocks=n, in_dim=pin.shape[1],
                  compress_dim=pin.shape[0],
                  use_residual="blocks.0.proj_residual.proj_in.weight" in sd)
        if kw["use_residual"]:
            rp = sd["blocks.0.proj_residual.proj_in.weight"]
            rpo = sd["blocks.0.proj_residual.proj_out.weight"]
            kw.update(residual_dim=rp.shape[1], residual_mid_dim=rp.shape[0],
                      residual_length=rpo.shape[1] // rp.shape[0])
        cfg = QwenImage2LoRAConfig(**kw)
        # rank*dim from the to_q head (am=1)
        cfg = dataclasses.replace(
            cfg, rank=a0.shape[0] // cfg.dim
            if a0.shape[0] % cfg.dim == 0 else cfg.rank)

    def lin(name):
        return {"w": _np.asarray(sd[name + ".weight"]).T}

    blocks = []
    for i in range(len(_PATTERN_GROUPS) * cfg.num_blocks):
        gi = i // cfg.num_blocks
        entry = {
            "layers": [
                {"proj_a": {"proj_in": lin(f"blocks.{i}.layers.{li}.proj_a"
                                           ".proj_in"),
                            "proj_out": lin(f"blocks.{i}.layers.{li}.proj_a"
                                            ".proj_out")},
                 "proj_b": {"proj_in": lin(f"blocks.{i}.layers.{li}.proj_b"
                                           ".proj_in"),
                            "proj_out": lin(f"blocks.{i}.layers.{li}.proj_b"
                                            ".proj_out")}}
                for li in range(len(_PATTERN_GROUPS[gi]))
            ],
        }
        if cfg.use_residual:
            entry["proj_residual"] = {
                "proj_in": lin(f"blocks.{i}.proj_residual.proj_in"),
                "proj_out": lin(f"blocks.{i}.proj_residual.proj_out"),
            }
        blocks.append(entry)
    params = {"blocks": blocks}
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params), cfg
