"""LoRA / DoRA adapters and the FairyGen two-stage motion-adapter scheme.

First-class replacements for the reference's MethodType forward patches:

  * plain LoRA:    y = Wx + s·(x A) B                (peft LoraLayer)
  * DoRA:          y = Wx + [(m/‖W+sBA‖ − 1)·Wx + (m/‖W+sBA‖)·s·(xA)B]
                   (peft dora.py, used by the SDXL style adapter —
                    stylization/dora_training/train.py:762-776)
  * mask gating:   the adapter update is applied only on masked tokens
                   (dense-equivalent of the gather/scatter masked forward,
                    BrushNet fork attention_processor.py:3276-3334)
  * stage-1:       element dropout p=0.8 on B with 1/(1−p) rescale
                   (training_module.py:233-242) — realised here as a
                   parameter transform before the forward pass
  * stage-2:       frozen A1/B1 + zero-init B2 with dropout 0.5; forward
                   y = Wx + s·(xA)B1 + s·(xA)B2_dropped
                   (training_module.py:266-352)
  * merge tools:   B = B1 + B2 (merge_weights.py:28-44); fuse-at-load
                   W += α·A@B (utils/lora/general.py:44-62); rank-concat.

Adapter params live INSIDE the dense-layer param dict under "lora":
  {"w": ..., "b": ..., "lora": {"A": (in,r), "B": (r,out),
                                 "B2": optional, "mag": optional (out,),
                                 "scale": float}}
so they stack/scan/shard exactly like base weights.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------- forward
def apply_adapter(base_out, x, p, mask=None):
    """Adapter update given the base layer output.  Called by dense layers
    when p["lora"] exists.  mask: (B, N, 1) 0/1 token gate or None.

    Per-SAMPLE adapters (slot-level serving, serving/continuous.py): when
    ``A`` carries a leading batch axis — (B, in, r) against x (B, N, in) —
    each batch row applies its own adapter (hot-LoRA stack gathered by
    slot), so mixed-adapter traffic shares one compiled batched step."""
    ap = p["lora"]
    if ap["A"].ndim == x.ndim == 3:  # (B, in, r) per-sample hot adapters
        xa = jnp.einsum("bni,bir->bnr", x, ap["A"].astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        upd = jnp.einsum("bnr,bro->bno", xa, ap["B"].astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if mask is not None:
            upd = upd * mask.astype(upd.dtype)
        return base_out + upd
    # scale reaches here either as a weak python float (fresh init) or as a
    # STRONG f32 array leaf (device_put / checkpoint-restored params).  The
    # strong form would promote a bf16 residual stream to f32 — a dtype
    # change that breaks the scan carry in blocks_forward — so pin it to
    # x.dtype (numerically identical to the weak-float path, which also
    # multiplies in x.dtype).
    scale = jnp.asarray(ap.get("scale", 1.0), dtype=x.dtype)
    xa = jnp.dot(x, ap["A"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    upd = jnp.dot(xa, ap["B"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype) * scale
    if "B2" in ap:
        upd2 = jnp.dot(xa, ap["B2"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype) * scale
        upd = upd + upd2
    if "mag" in ap:
        # DoRA: column norm of W + s·AB (detached), magnitude rescale.
        # (full-precision scale here — the norm is computed in f32)
        w_eff = p["w"].astype(jnp.float32) + jnp.asarray(
            ap.get("scale", 1.0), dtype=jnp.float32) * (
            ap["A"].astype(jnp.float32) @ ap["B"].astype(jnp.float32)
        )
        norm = jax.lax.stop_gradient(jnp.linalg.norm(w_eff, axis=0))  # (out,)
        mns = (ap["mag"].astype(jnp.float32) / norm).astype(x.dtype)
        upd = (mns - 1) * base_out + mns * upd
    if mask is not None:
        upd = upd * mask.astype(upd.dtype)
    return base_out + upd


# ---------------------------------------------------------------------- init
def init_lora(key, d_in: int, d_out: int, rank: int, *, alpha: Optional[float] = None,
              dora: bool = False, base_w=None, with_b2: bool = False,
              dtype=jnp.float32) -> Dict[str, Any]:
    """Kaiming-A, zero-B init (peft default); scale = alpha/rank (alpha
    defaults to rank → scale 1, matching stage scripts' r=alpha=32)."""
    a = jax.random.normal(key, (d_in, rank), dtype) * (1.0 / d_in) ** 0.5
    p = {"A": a, "B": jnp.zeros((rank, d_out), dtype),
         "scale": float((alpha if alpha is not None else rank) / rank)}
    if with_b2:
        p["B2"] = jnp.zeros((rank, d_out), dtype)
    if dora:
        assert base_w is not None
        p["mag"] = jnp.linalg.norm(base_w.astype(jnp.float32), axis=0).astype(dtype)
    return p


WAN_LORA_TARGETS = ("q", "k", "v", "o", "ffn.0", "ffn.2")  # stage1_id.sh


def add_lora_to_wan_dit(params, key, rank: int = 32, alpha: Optional[float] = None,
                        targets: Sequence[str] = WAN_LORA_TARGETS,
                        with_b2: bool = False, dtype=jnp.float32):
    """Inject (stacked) LoRA params into the Wan DiT blocks.

    targets use the reference naming (q,k,v,o live in self_attn AND
    cross_attn; ffn.0/ffn.2 are the two FFN projections — stage1_id.sh).
    """
    import copy

    params = dict(params)
    blocks = dict(params["blocks"])
    L = jax.tree.leaves(blocks["modulation"])[0].shape[0]
    keys = iter(jax.random.split(key, 128))

    def stacked_lora(d_in, d_out):
        ps = [
            init_lora(next(keys), d_in, d_out, rank, alpha=alpha,
                      with_b2=with_b2, dtype=dtype)
            for _ in range(L)
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *ps)

    name_map = {"ffn.0": ("ffn", "fc1"), "ffn.2": ("ffn", "fc2")}
    for t in targets:
        if t in ("q", "k", "v", "o"):
            for attn in ("self_attn", "cross_attn"):
                sub = dict(blocks[attn])
                layer = dict(sub[t])
                w = layer["w"]
                layer["lora"] = stacked_lora(w.shape[-2], w.shape[-1])
                sub[t] = layer
                blocks[attn] = sub
        elif t in name_map:
            outer, inner = name_map[t]
            sub = dict(blocks[outer])
            layer = dict(sub[inner])
            w = layer["w"]
            layer["lora"] = stacked_lora(w.shape[-2], w.shape[-1])
            sub[inner] = layer
            blocks[outer] = sub
        else:
            raise ValueError(f"unknown target {t}")
    params["blocks"] = blocks
    return params


# -------------------------------------------------------- stage-wise dropout
def dropout_lora_b(params, rng, p_drop: float, which: str = "B"):
    """Element dropout on B (stage-1 p=0.8) or B2 (stage-2 p=0.5) with
    1/(1−p) rescale — training_module.py:233-242, 338-346.  Applied as a
    parameter transform before the forward pass (mathematically identical
    to masking inside the layer)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(rng, len(flat))
    out = []
    for (path, leaf), k in zip(flat, keys):
        names = [getattr(x, "key", None) for x in path]
        if "lora" in names and names[-1] == which:
            mask = (jax.random.uniform(k, leaf.shape) > p_drop).astype(leaf.dtype)
            out.append(leaf * mask / (1.0 - p_drop))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def lora_trainable_filter(which: Iterable[str] = ("A", "B", "B2")):
    """Path filter for optax.masked: train only adapter params."""
    which = set(which)

    def fit(path):
        names = [getattr(x, "key", None) for x in path]
        return "lora" in names and names[-1] in which
    return fit


# ------------------------------------------------------------------ merging
def normalize_lora_keys(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Foreign key layouts -> '<target>.lora_{A,B}.weight' pairs.

    Port of GeneralLoRALoader.get_name_dict/convert_state_dict
    (utils/lora/general.py:10-41): handles lora_up/lora_down naming,
    'default' adapter infix, and the 'diffusion_model.' prefix.
    """
    out = {}
    for key in state_dict:
        b_name = "lora_up" if ".lora_up." in key else "lora_B"
        a_name = "lora_down" if ".lora_up." in key else "lora_A"
        if b_name not in key:
            continue
        parts = key.split(".")
        bi = parts.index(b_name)
        if len(parts) > bi + 2:
            parts.pop(bi + 1)  # drop adapter name ('default')
        parts.pop(bi)
        if parts[0] == "diffusion_model":
            parts.pop(0)
        parts.pop(-1)  # drop 'weight'
        target = ".".join(parts)
        out[target + ".lora_B.weight"] = np.asarray(state_dict[key])
        out[target + ".lora_A.weight"] = np.asarray(state_dict[key.replace(b_name, a_name)])
    return out


def merge_stage_weights(stage1: Dict[str, np.ndarray], stage2: Dict[str, np.ndarray]):
    """Propagated motion adapter merge: keep A1, B = B1 + B2
    (merge_weights.py:28-44)."""
    merged = {}
    for k in stage1:
        if "lora_A" in k:
            merged[k] = np.asarray(stage1[k])
        elif "lora_B" in k:
            if k.endswith(".lora_B.default.weight"):
                b2 = k.replace(".lora_B.default.weight", ".lora_B2.weight")
            else:
                b2 = k.replace("lora_B", "lora_B2").replace(".default", "")
            merged[k] = np.asarray(stage1[k]) + (
                np.asarray(stage2[b2]) if b2 in stage2 else 0.0
            )
    return merged


def reset_lora_rank(lora: Dict[str, np.ndarray], rank: int) -> Dict[str, np.ndarray]:
    """PCA re-rank of a LoRA to ``rank`` (utils/lora/reset_rank.py:1-19).

    The reference uses torch.pca_lowrank(q=rank) — a RANDOMIZED low-rank
    sketch whose error exceeds the optimal rank-r truncation at q==rank.
    We use the exact truncated SVD instead: deterministic and the
    Eckart-Young-optimal approximation of B@A (strictly better than the
    reference's output, same factor shapes/contract)."""
    out = {}
    for key in [k for k in lora if ".lora_A." in k]:
        A = np.asarray(lora[key], np.float64)          # (r, in)
        B = np.asarray(lora[key.replace(".lora_A.", ".lora_B.")], np.float64)  # (out, r)
        W = B @ A
        U, S, Vt = np.linalg.svd(W, full_matrices=False)
        U, S, Vt = U[:, :rank], S[:rank], Vt[:rank]
        out[key] = Vt.astype(lora[key].dtype)                       # (rank, in)
        out[key.replace(".lora_A.", ".lora_B.")] = (U * S).astype(lora[key].dtype)
    return out


def merge_lora_rank_concat(sd_a, sd_b):
    """Rank-concatenate two LoRAs (utils/lora/merge.py:10-20)."""
    out = {}
    for k in sd_a:
        if "lora_A" in k or "lora_down" in k:
            out[k] = np.concatenate([np.asarray(sd_a[k]), np.asarray(sd_b[k])], axis=0)
        elif "lora_B" in k or "lora_up" in k:
            out[k] = np.concatenate([np.asarray(sd_a[k]), np.asarray(sd_b[k])], axis=1)
        else:
            out[k] = sd_a[k]
    return out


def fuse_lora_into_wan_dit(params, lora_state_dict, cfg, alpha: float = 1.0):
    """Merge a (torch-layout) Wan-DiT LoRA into base weights at load time:
    W += α·(B@A)ᵀ in our (in,out) convention — fuse semantics of
    GeneralLoRALoader.fuse_lora_to_base_model (general.py:44-62).

    Expects reference target names 'blocks.N.{self_attn,cross_attn}.{q,k,v,o}'
    and 'blocks.N.ffn.{0,2}'.
    """
    sd = normalize_lora_keys(lora_state_dict)
    targets = sorted({k[: -len(".lora_B.weight")] for k in sd if k.endswith(".lora_B.weight")})
    params = jax.tree.map(lambda x: x, params)  # shallow copy via identity map

    L = params["blocks"]["modulation"].shape[0]
    # accumulate per (module path) stacked deltas
    deltas: Dict[tuple, list] = {}
    n_fused = 0
    for t in targets:
        m = re.match(r"blocks\.(\d+)\.(self_attn|cross_attn)\.(q|k|v|o)$", t)
        m2 = re.match(r"blocks\.(\d+)\.ffn\.(0|2)$", t)
        up = sd[t + ".lora_B.weight"].astype(np.float32)  # (out, r)
        down = sd[t + ".lora_A.weight"].astype(np.float32)  # (r, in)
        delta = alpha * (up @ down).T  # (in, out)
        if m:
            i, attn, proj = int(m.group(1)), m.group(2), m.group(3)
            key = ("blocks", attn, proj, "w")
        elif m2:
            i = int(m2.group(1))
            key = ("blocks", "ffn", "fc1" if m2.group(2) == "0" else "fc2", "w")
        else:
            continue
        deltas.setdefault(key, [None] * L)[i] = delta
        n_fused += 1
    if targets and n_fused == 0:
        raise ValueError(
            f"no LoRA target matched the Wan block layout (of "
            f"{len(targets)}; e.g. {sorted(targets)[0]!r}) — is this a "
            "Wan-DiT adapter?")

    for key, per_layer in deltas.items():
        _, sub, proj, _ = key
        w = params["blocks"][sub][proj]["w"]
        stack = np.stack([
            d if d is not None else np.zeros(w.shape[1:], np.float32) for d in per_layer
        ])
        params["blocks"][sub][proj]["w"] = (
            w.astype(jnp.float32) + jnp.asarray(stack)
        ).astype(w.dtype)
    return params, n_fused


# ------------------------------------------------------------- hot (unfused)
def _wan_lora_layer_key(target: str):
    """'blocks.N.self_attn.q' / 'blocks.N.ffn.0' -> (i, sub, proj)."""
    m = re.match(r"blocks\.(\d+)\.(self_attn|cross_attn)\.(q|k|v|o)$", target)
    if m:
        return int(m.group(1)), m.group(2), m.group(3)
    m = re.match(r"blocks\.(\d+)\.ffn\.(0|2)$", target)
    if m:
        return int(m.group(1)), "ffn", "fc1" if m.group(2) == "0" else "fc2"
    return None


def hot_lora_into_wan_dit(params, lora_state_dict, alpha: float = 1.0,
                          dtype=None):
    """Attach a (torch-layout) Wan-DiT LoRA as runtime adapters WITHOUT
    fusing — the reference's hot-load path (base_pipeline.py:249-264:
    ``AutoWrappedLinear.lora_A_weights.append``; applied per forward,
    layers.py:417-427).  Works on quantized (int8) base weights, which
    fuse-at-load cannot.

    Multiple calls rank-concatenate: ``Σ_i α_i·B_i A_i x`` equals one
    concatenated pair, so swapping adapter sets with the same TOTAL rank
    keeps every pytree shape — the jitted denoise does not retrace.
    Remove all hot adapters with ``clear_hot_lora`` (the reference's
    ``pipe.clear_lora()``; fused LoRAs cannot be cleared, same caveat).

    Returns (params, n_attached)."""
    sd = normalize_lora_keys(lora_state_dict)
    targets = sorted({k[: -len(".lora_B.weight")] for k in sd
                      if k.endswith(".lora_B.weight")})
    params = jax.tree.map(lambda x: x, params)  # shallow copy
    blocks = dict(params["blocks"])
    L = jax.tree.leaves(blocks["modulation"])[0].shape[0]

    per_layer: Dict[tuple, dict] = {}  # (sub, proj) -> {i: (down, up)}
    n = 0
    for t in targets:
        loc = _wan_lora_layer_key(t)
        if loc is None:
            continue
        i, sub, proj = loc
        per_layer.setdefault((sub, proj), {})[i] = (
            sd[t + ".lora_A.weight"].astype(np.float32),  # (r, in)
            sd[t + ".lora_B.weight"].astype(np.float32),  # (out, r)
        )
        n += 1
    if targets and n == 0:
        # a LoRA in an unexpected layout must fail loudly, not report
        # "0 tensors patched" as success (mirrors the fuse path's contract)
        raise ValueError(
            f"no LoRA target matched the Wan block layout (of "
            f"{len(targets)}; e.g. {sorted(targets)[0]!r}) — is this a "
            "Wan-DiT adapter?")

    for (sub, proj), entries in per_layer.items():
        outer = dict(blocks[sub])
        layer = dict(outer[proj])
        w = layer.get("w", layer.get("w_int8"))
        d_in, d_out = w.shape[-2], w.shape[-1]
        dt = dtype or (w.dtype if "w" in layer else jnp.bfloat16)
        r = max(a.shape[0] for a, _ in entries.values())
        A = np.zeros((L, d_in, r), np.float32)
        B = np.zeros((L, r, d_out), np.float32)
        for i, (down, up) in entries.items():
            A[i, :, : down.shape[0]] = down.T
            B[i, : down.shape[0], :] = alpha * up.T
        if "lora" in layer:
            old = layer["lora"]
            # hot adapters are exactly {A, B}; anything else ("scale" from
            # init_lora, "B2"/"mag" from stage-2/DoRA) is a TRAINING
            # adapter — stacking would let a later clear_lora() silently
            # strip the trained weights along with the hot ones
            extra = set(old) - {"A", "B"}
            if extra:
                raise ValueError(
                    f"{sub}.{proj} already carries a training adapter "
                    f"(keys {sorted(extra)}); fuse it first "
                    "(load_lora(hotload=False)) — hot LoRAs cannot stack "
                    "on it")
            # no "scale" leaf on hot adapters: alphas are folded into B (a
            # python float would be a scan leaf with no leading axis; an
            # (L,) array a pointless extra input)
            layer["lora"] = {
                "A": jnp.concatenate(
                    [jnp.asarray(old["A"], dt), jnp.asarray(A, dt)], axis=-1),
                "B": jnp.concatenate(
                    [jnp.asarray(old["B"], dt), jnp.asarray(B, dt)], axis=-2),
            }
        else:
            layer["lora"] = {"A": jnp.asarray(A, dt), "B": jnp.asarray(B, dt)}
        outer[proj] = layer
        blocks[sub] = outer
    params["blocks"] = blocks
    return params, n


def build_hot_lora_stack(params, lora_state_dicts, alphas=None, dtype=None):
    """Stack K hot LoRAs for per-slot selection (serving/continuous.py).

    Returns ``{(sub, proj): {"A": (L, K+1, in, r), "B": (L, K+1, r, out)}}``
    — index 0 is the identity adapter (zeros; "no LoRA"), adapter i sits at
    index i+1.  Ranks pad to the max rank with zero columns (exact).
    Alphas fold into B like ``hot_lora_into_wan_dit``.  Layers no adapter
    touches are absent from the stack (their dense path stays LoRA-free).
    """
    alphas = list(alphas or [1.0] * len(lora_state_dicts))
    if len(alphas) != len(lora_state_dicts):
        raise ValueError("alphas and lora_state_dicts length mismatch")
    blocks = params["blocks"]
    L = jax.tree.leaves(blocks["modulation"])[0].shape[0]
    K = len(lora_state_dicts)

    # (sub, proj) -> per adapter k -> {i: (down, up)}
    per_layer: Dict[tuple, dict] = {}
    for kdx, raw in enumerate(lora_state_dicts):
        sd = normalize_lora_keys(raw)
        targets = sorted({t[: -len(".lora_B.weight")] for t in sd
                          if t.endswith(".lora_B.weight")})
        n = 0
        for t in targets:
            loc = _wan_lora_layer_key(t)
            if loc is None:
                continue
            i, sub, proj = loc
            per_layer.setdefault((sub, proj), {}).setdefault(kdx, {})[i] = (
                sd[t + ".lora_A.weight"].astype(np.float32),
                sd[t + ".lora_B.weight"].astype(np.float32),
            )
            n += 1
        if targets and n == 0:
            raise ValueError(
                f"adapter {kdx}: no LoRA target matched the Wan block "
                f"layout (e.g. {sorted(targets)[0]!r})")

    stack = {}
    for (sub, proj), by_adapter in per_layer.items():
        layer = blocks[sub][proj]
        w = layer.get("w", layer.get("w_int8"))
        d_in, d_out = w.shape[-2], w.shape[-1]
        dt = dtype or (w.dtype if "w" in layer else jnp.bfloat16)
        r = max(a.shape[0] for ent in by_adapter.values()
                for a, _ in ent.values())
        A = np.zeros((L, K + 1, d_in, r), np.float32)
        B = np.zeros((L, K + 1, r, d_out), np.float32)
        for kdx, entries in by_adapter.items():
            for i, (down, up) in entries.items():
                A[i, kdx + 1, :, : down.shape[0]] = down.T
                B[i, kdx + 1, : down.shape[0], :] = alphas[kdx] * up.T
        stack[(sub, proj)] = {"A": jnp.asarray(A, dt),
                              "B": jnp.asarray(B, dt)}
    return stack


def select_slot_loras(params, stack, adapter_ids):
    """Patch ``params`` with per-sample adapters gathered from ``stack``.

    ``adapter_ids``: (B,) int — 0 = none, i+1 = adapter i.  The gather runs
    once per slot-occupancy change (admission/eviction), NOT per step; the
    returned pytree shares every base-weight leaf with ``params``.
    Training adapters on a touched layer are rejected the same way
    ``hot_lora_into_wan_dit`` rejects them."""
    idx = jnp.asarray(adapter_ids, jnp.int32)
    params = jax.tree.map(lambda x: x, params)  # shallow copy
    blocks = dict(params["blocks"])
    for (sub, proj), ab in stack.items():
        outer = dict(blocks[sub])
        layer = dict(outer[proj])
        if "lora" in layer and (set(layer["lora"]) - {"A", "B"}):
            raise ValueError(
                f"{sub}.{proj} carries a training adapter; fuse it first "
                "(load_lora(hotload=False)) before per-slot serving")
        # (L, K+1, in, r)[:, idx] -> (L, B, in, r); scan slices layer 0
        layer["lora"] = {"A": ab["A"][:, idx], "B": ab["B"][:, idx]}
        outer[proj] = layer
        blocks[sub] = outer
    params["blocks"] = blocks
    return params


def clear_hot_lora(params):
    """Strip every runtime ``lora`` entry (reference ``clear_lora``,
    base_pipeline.py:269-277).  Returns (params, n_cleared)."""
    cleared = [0]

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if k == "lora" and isinstance(v, dict) and "A" in v:
                    cleared[0] += 1
                    continue
                out[k] = walk(v)
            return out
        return node

    return walk(params), cleared[0]
