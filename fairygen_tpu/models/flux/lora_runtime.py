"""FLUX LoRA runtime extras — encoder + learned merger (patcher).

Mirrors two reference models:

``FluxLoRAEncoder`` (``animation/diffsynth/models/flux_lora_encoder.py:
485-515``): encodes a LoRA checkpoint itself into prompt tokens — each
targeted layer's (A, B) pair is probed by a learned ``x @ Aᵀ @ Bᵀ``
block (+LN), projected per layer TYPE to the embed dim, run through
CLIP-style encoder layers with a learned special token whose final state
(LN + Linear) becomes the LoRA embedding appended to the prompt
(``FluxImageUnit_LoRAEncode``, ``pipelines/flux_image.py:846-900``).

``FluxLoraPatcher`` (``models/flux_lora_patcher.py:250-306``): per-layer
``LoraMerger`` gates that combine a base linear output with a STACK of
hot (unfused) LoRA outputs —
``out = base + Σ_i w_out·σ(LN(base)·w_b + LN(lora_i)·w_l +
LN(base)·LN(lora_i)·w_x + bias)·lora_i`` — the runtime path behind
``pipe.enable_lora_merger()`` (``core/vram/layers.py:417-427``).

Hot (unfused) LoRAs ride the DiT block scans as stacked xs; see
``flux_dit_forward(hot_lora=...)``.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

# layer suffix -> (din, dout) per block family (flux_lora_encoder.py:
# 449-470 — also the patcher's dim table with dout only)
DOUBLE_LORA_DIMS = {
    "attn.a_to_qkv": (3072, 9216), "attn.a_to_out": (3072, 3072),
    "ff_a.0": (3072, 12288), "ff_a.2": (12288, 3072),
    "norm1_a.linear": (3072, 18432),
    "attn.b_to_qkv": (3072, 9216), "attn.b_to_out": (3072, 3072),
    "ff_b.0": (3072, 12288), "ff_b.2": (12288, 3072),
    "norm1_b.linear": (3072, 18432),
}
SINGLE_LORA_DIMS = {
    "to_qkv_mlp": (3072, 21504), "proj_out": (15360, 3072),
    "norm.linear": (3072, 9216),
}


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    y = (xf - xf.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        xf.var(-1, keepdims=True) + eps)
    return (y * p["w"].astype(jnp.float32)
            + p["b"].astype(jnp.float32)).astype(x.dtype)


# ------------------------------------------------------------------ merger
def lora_merger_apply(p, base, loras):
    """LoraMerger.forward (flux_lora_patcher.py:262-272).

    base (..., D); loras (n, ..., D) — one entry per hot LoRA."""
    nb = _ln(p["norm_base"], base)
    nl = _ln(p["norm_lora"], loras)
    gate = jax.nn.sigmoid(
        nb[None] * p["weight_base"] + nl * p["weight_lora"]
        + nb[None] * nl * p["weight_cross"] + p["bias"])
    return base + (p["weight_out"] * gate * loras).sum(axis=0)


def convert_lora_merger_state_dict(sd: Dict[str, Any], prefix: str = ""):
    import numpy as _np

    def g(name):
        return _np.asarray(sd[prefix + name])

    return {
        "weight_base": g("weight_base"), "weight_lora": g("weight_lora"),
        "weight_cross": g("weight_cross"), "weight_out": g("weight_out"),
        "bias": g("bias"),
        "norm_base": {"w": g("norm_base.weight"), "b": g("norm_base.bias")},
        "norm_lora": {"w": g("norm_lora.weight"), "b": g("norm_lora.bias")},
    }


def convert_flux_lora_patcher_state_dict(sd: Dict[str, Any], dtype=None):
    """FluxLoraPatcher state dict -> {layer name: merger params} keyed by
    the un-mangled layer names (``___`` -> ``.``)."""
    names = sorted({k.split(".")[1] for k in sd
                    if k.startswith("model_dict.")})
    params = {
        name.replace("___", "."): convert_lora_merger_state_dict(
            sd, f"model_dict.{name}.")
        for name in names
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params), None


def normalize_flux_lora_to_reference(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Any supported FLUX LoRA layout (diffusers / civitai / already-
    normalized) -> the fused reference module naming the encoder/patcher
    pattern tables use (``blocks.{i}.attn.a_to_qkv.lora_A.weight``...).
    Split q/k/v (or proj_mlp) adapters are assembled into one fused-layer
    LoRA: A rows concatenated, B placed block-diagonally on its column
    range — exactly equivalent to applying each split adapter to its
    slice."""
    import numpy as _np

    if any(".lora_A.weight" in k and k.startswith(("blocks.",
                                                   "single_blocks."))
           for k in sd):
        return sd
    from .lora import _collect, guess_lora_alpha

    scale = guess_lora_alpha(sd)  # kohya .alpha -> sqrt(alpha/rank) per factor

    _SLICES = {  # canonical split leaf -> (fused leaf, col block, n blocks)
        "attn.a_to_q": ("attn.a_to_qkv", 0, 3),
        "attn.a_to_k": ("attn.a_to_qkv", 1, 3),
        "attn.a_to_v": ("attn.a_to_qkv", 2, 3),
        "attn.b_to_q": ("attn.b_to_qkv", 0, 3),
        "attn.b_to_k": ("attn.b_to_qkv", 1, 3),
        "attn.b_to_v": ("attn.b_to_qkv", 2, 3),
        "a_to_q": ("to_qkv_mlp", 0, 7),
        "a_to_k": ("to_qkv_mlp", 1, 7),
        "a_to_v": ("to_qkv_mlp", 2, 7),
        "proj_in_besides_attn": ("to_qkv_mlp", 3, 7),  # 4 mlp columns
    }
    grouped: Dict[tuple, list] = {}
    out: Dict[str, Any] = {}
    for family, i, leaf, A, B in _collect(sd):
        A, B = A * scale, B * scale
        fam = "blocks" if family == "double" else "single_blocks"
        if leaf in _SLICES:
            grouped.setdefault((fam, i, _SLICES[leaf][0]), []).append(
                (leaf, _np.asarray(A), _np.asarray(B)))
        else:
            out[f"{fam}.{i}.{leaf}.lora_A.weight"] = _np.asarray(A)
            out[f"{fam}.{i}.{leaf}.lora_B.weight"] = _np.asarray(B)
    for (fam, i, fused), parts in grouped.items():
        din = parts[0][1].shape[1]
        n_cols = _SLICES[parts[0][0]][2]
        r_tot = sum(a.shape[0] for _, a, _ in parts)
        A_cat = _np.concatenate([a for _, a, _ in parts], axis=0)
        B_cat = _np.zeros((n_cols * din, r_tot), _np.float32)
        r0 = 0
        for leaf, a, b in parts:
            blk = _SLICES[leaf][1]
            span = 4 * din if leaf == "proj_in_besides_attn" else din
            B_cat[blk * din: blk * din + span, r0: r0 + a.shape[0]] = b
            r0 += a.shape[0]
        out[f"{fam}.{i}.{fused}.lora_A.weight"] = A_cat
        out[f"{fam}.{i}.{fused}.lora_B.weight"] = B_cat
    return out


def stack_hot_lora(loras: List[Dict[str, Any]], cfg,
                   patcher: Optional[Dict[str, Any]] = None,
                   dtype=None):
    """Build the ``hot_lora`` structure for ``flux_dit_forward`` from
    reference-layout LoRA dicts (``blocks.{i}.<suffix>.lora_A.weight``...)

    Returns {"double": {suffix: {"A": (L, n, din, r), "B": (L, n, r, dout),
    "merger": stacked-per-block merger params or None}}, "single": ...}.
    Missing layers get rank-0 zero matrices so every block scans the same
    pytree."""
    import numpy as _np

    def build(family, dims, n_blocks):
        out = {}
        for suffix, (din, dout) in dims.items():
            ranks = [
                max((_np.asarray(l[f"{family}.{i}.{suffix}.lora_A.weight"]
                                 ).shape[0]
                     for l in loras
                     if f"{family}.{i}.{suffix}.lora_A.weight" in l),
                    default=0)
                for i in range(n_blocks)]
            r = max(ranks, default=0)
            if r == 0:
                continue
            A = _np.zeros((n_blocks, len(loras), din, r), _np.float32)
            B = _np.zeros((n_blocks, len(loras), r, dout), _np.float32)
            for i in range(n_blocks):
                for j, l in enumerate(loras):
                    ka = f"{family}.{i}.{suffix}.lora_A.weight"
                    if ka not in l:
                        continue
                    a = _np.asarray(l[ka])  # (r, din)
                    b = _np.asarray(l[ka.replace("lora_A", "lora_B")])
                    A[i, j, :, : a.shape[0]] = a.T
                    B[i, j, : a.shape[0]] = b.T
            entry = {"A": A, "B": B}
            if patcher is not None:
                mergers = [patcher[f"{family}.{i}.{suffix}"]
                           for i in range(n_blocks)]
                entry["merger"] = jax.tree.map(
                    lambda *xs: _np.stack([_np.asarray(x) for x in xs]),
                    *mergers)
            out[suffix] = entry
        return out

    hot = {
        "double": build("blocks", _scaled_dims(DOUBLE_LORA_DIMS, cfg),
                        cfg.num_double_blocks),
        "single": build("single_blocks", _scaled_dims(SINGLE_LORA_DIMS, cfg),
                        cfg.num_single_blocks),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, hot)


def _scaled_dims(dims, cfg):
    """Rescale the 3072-based dim table to the config's width (tiny test
    configs)."""
    s = cfg.dim / 3072.0
    return {k: (int(round(a * s)), int(round(b * s)))
            for k, (a, b) in dims.items()}


def scale_hot_lora(hot_lora, scales):
    """Weight the hot-LoRA stack per adapter: scales (n,) multiplies each
    LoRA's contribution (applied on the A factors, so both the plain-sum
    path and the merger's per-LoRA inputs are gated).  scales is a traced
    array — per-request adapter selection/blending never recompiles."""
    scales = jnp.asarray(scales)
    if scales.ndim != 1:
        raise ValueError(f"scales must be 1-D (one weight per hot LoRA), "
                         f"got shape {scales.shape}")

    def fam(entries):
        out = {}
        for suffix, e in entries.items():
            if scales.shape[0] != e["A"].shape[1]:
                raise ValueError(
                    f"{suffix}: {scales.shape[0]} scales for "
                    f"{e['A'].shape[1]} hot LoRAs")
            s = scales.astype(e["A"].dtype)[None, :, None, None]
            out[suffix] = {**e, "A": e["A"] * s}
        return out

    return {k: (fam(v) if k in ("double", "single") and v else v)
            for k, v in (hot_lora or {}).items()}


def hot_dense(p, x, hot):
    """Base linear + hot-LoRA stack: plain sum without a merger
    (core/vram/layers.py:418-420), learned LoraMerger gates with one
    (:421-426).  Works for any leading shape (tokens or AdaLN vectors).

    Per-SLOT form (keys "As"/"Bs", shapes (B, din, r)/(B, r, dout)): each
    batch row applies its OWN adapter — the FLUX analogue of the Wan
    engine's select_slot_loras (models/adapters.apply_adapter), gathered
    at admission by ``select_flux_slot_loras`` so mixed-adapter t2i
    traffic shares one compiled batched step."""
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    if hot is None:
        return y
    if "As" in hot:
        lo = jnp.einsum("b...d,bdr->b...r", x, hot["As"].astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        lo = jnp.einsum("b...r,bro->b...o", lo, hot["Bs"].astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        return y + lo
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    lo = jnp.einsum("md,ndr->nmr", xf, hot["A"].astype(x.dtype))
    lo = jnp.einsum("nmr,nrd->nmd", lo, hot["B"].astype(x.dtype))
    lo = lo.reshape((lo.shape[0],) + lead + (lo.shape[-1],))
    if "merger" not in hot:
        return y + lo.sum(axis=0)
    return lora_merger_apply(hot["merger"], y, lo)


def build_flux_slot_lora_stack(loras: List[Dict[str, Any]], cfg,
                               alphas=None, dtype=None):
    """Stack K hot FLUX LoRAs for per-slot selection (serving/t2i_slots).

    Accepts any supported LoRA layout (normalized to the reference
    naming); returns {"double": {suffix: {"A": (L, K+1, din, r),
    "B": (L, K+1, r, dout)}}, "single": ...} — index 0 the identity
    (zeros) adapter, adapter i at i+1, ranks zero-padded to the max
    (exact).  ``alphas`` fold into B, matching the Wan stack
    (models/adapters.build_hot_lora_stack)."""
    alphas = list(alphas or [1.0] * len(loras))
    if len(alphas) != len(loras):
        raise ValueError("alphas and loras length mismatch")
    loras = [normalize_flux_lora_to_reference(l) for l in loras]
    hot = stack_hot_lora(loras, cfg, dtype=dtype)

    def fam(entries):
        out = {}
        for suffix, e in entries.items():
            A, B = e["A"], e["B"]
            a = jnp.asarray(alphas, B.dtype)[None, :, None, None]
            zA = jnp.zeros(A.shape[:1] + (1,) + A.shape[2:], A.dtype)
            zB = jnp.zeros(B.shape[:1] + (1,) + B.shape[2:], B.dtype)
            out[suffix] = {
                "A": jnp.concatenate([zA, A], axis=1),
                "B": jnp.concatenate([zB, B * a], axis=1),
            }
        return out

    return {k: fam(v) for k, v in hot.items()}


def select_flux_slot_loras(stack, adapter_ids):
    """Gather per-sample adapters from a ``build_flux_slot_lora_stack``
    registry: adapter_ids (B,) int (0 = none, i+1 = adapter i) ->
    the ``hot_lora`` argument of ``flux_dit_forward`` in per-slot form
    ({"As": (L, B, din, r), ...}; the block scans slice the leading L).
    Runs once per slot-occupancy change, not per step."""
    idx = jnp.asarray(adapter_ids, jnp.int32)

    def fam(entries):
        return {suffix: {"As": e["A"][:, idx], "Bs": e["B"][:, idx]}
                for suffix, e in entries.items()}

    return {k: fam(v) for k, v in stack.items()}


# ------------------------------------------------------------------ encoder
@dataclasses.dataclass(frozen=True)
class FluxLoRAEncoderConfig:
    embed_dim: int = 4096
    intermediate_size: int = 8192
    num_encoder_layers: int = 1
    num_heads: int = 32
    head_dim: int = 128
    num_embeds_per_lora: int = 16
    num_special_embeds: int = 1
    num_double_blocks: int = 19
    num_single_blocks: int = 38
    dim: int = 3072  # targeted DiT width (scales the pattern dims)


def _lora_patterns(cfg: FluxLoRAEncoderConfig):
    pats = []
    for i in range(cfg.num_double_blocks):
        for suffix, d in _scaled_dims(DOUBLE_LORA_DIMS, cfg).items():
            pats.append((f"blocks.{i}.{suffix}", suffix, d))
    for i in range(cfg.num_single_blocks):
        for suffix, d in _scaled_dims(SINGLE_LORA_DIMS, cfg).items():
            pats.append((f"single_blocks.{i}.{suffix}", suffix, d))
    return pats


def flux_lora_encoder_forward(params, cfg: FluxLoRAEncoderConfig, lora):
    """lora: reference-layout dict of ``<name>.lora_A/lora_B.weight``
    arrays -> (1, num_special_embeds, embed_dim)."""
    embeds = []
    for name, suffix, _ in _lora_patterns(cfg):
        blk = params["model_dict"][name]
        a = jnp.asarray(lora[name + ".lora_A.weight"], jnp.float32)
        b = jnp.asarray(lora[name + ".lora_B.weight"], jnp.float32)
        x = blk["x"] @ a.T @ b.T
        x = _ln(blk["ln"], x)
        proj = params["proj_dict"][suffix]
        embeds.append(x @ proj["w"] + proj["b"])
    x = jnp.concatenate([params["special_embeds"]] + embeds, axis=1)

    nh, hd = cfg.num_heads, cfg.head_dim
    for blk in params["encoders"]:
        h = _ln(blk["ln1"], x)
        b, l, _ = h.shape
        q = (h @ blk["q"]["w"] + blk["q"]["b"]).reshape(b, l, nh, hd)
        k = (h @ blk["k"]["w"] + blk["k"]["b"]).reshape(b, l, nh, hd)
        v = (h @ blk["v"]["w"] + blk["v"]["b"]).reshape(b, l, nh, hd)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k) * (hd ** -0.5)
        o = jnp.einsum("bnqk,bknd->bqnd", jax.nn.softmax(logits, -1), v)
        x = x + o.reshape(b, l, nh * hd) @ blk["o"]["w"] + blk["o"]["b"]
        h = _ln(blk["ln2"], x)
        h = h @ blk["fc1"]["w"] + blk["fc1"]["b"]
        h = h * jax.nn.sigmoid(1.702 * h)  # quickGELU
        x = x + (h @ blk["fc2"]["w"] + blk["fc2"]["b"])
    x = x[:, : cfg.num_special_embeds]
    x = _ln(params["final_ln"], x)
    return x @ params["final_linear"]["w"] + params["final_linear"]["b"]


def convert_flux_lora_encoder_state_dict(sd: Dict[str, Any],
                                         cfg: Optional[FluxLoRAEncoderConfig]
                                         = None, dtype=None):
    import numpy as _np

    if cfg is None:
        cfg = FluxLoRAEncoderConfig(
            embed_dim=sd["final_linear.weight"].shape[0],
            num_encoder_layers=1 + max(
                (int(k.split(".")[1]) for k in sd
                 if k.startswith("encoders.")), default=0),
            num_special_embeds=sd["special_embeds"].shape[1])

    def lin(name):
        return {"w": _np.asarray(sd[name + ".weight"]).T,
                "b": _np.asarray(sd[name + ".bias"])}

    def ln(name):
        return {"w": _np.asarray(sd[name + ".weight"]),
                "b": _np.asarray(sd[name + ".bias"])}

    model_dict, proj_dict = {}, {}
    for name, suffix, _ in _lora_patterns(cfg):
        key = name.replace(".", "___")
        model_dict[name] = {
            "x": _np.asarray(sd[f"embedder.model_dict.{key}.x"]),
            "ln": ln(f"embedder.model_dict.{key}.layer_norm"),
        }
        skey = suffix.replace(".", "___")
        if suffix not in proj_dict:
            proj_dict[suffix] = lin(f"embedder.proj_dict.{skey}")

    encoders = []
    for i in range(cfg.num_encoder_layers):
        pre = f"encoders.{i}"
        encoders.append({
            "ln1": ln(pre + ".layer_norm1"),
            "q": lin(pre + ".attn.to_q"), "k": lin(pre + ".attn.to_k"),
            "v": lin(pre + ".attn.to_v"), "o": lin(pre + ".attn.to_out"),
            "ln2": ln(pre + ".layer_norm2"),
            "fc1": lin(pre + ".fc1"), "fc2": lin(pre + ".fc2"),
        })
    params = {
        "model_dict": model_dict,
        "proj_dict": proj_dict,
        "encoders": encoders,
        "special_embeds": _np.asarray(sd["special_embeds"]),
        "final_ln": ln("final_layer_norm"),
        "final_linear": lin("final_linear"),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params), cfg
