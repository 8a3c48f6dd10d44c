"""Qwen2.5-VL vision tower — functional JAX port.

Enables image-conditioned prompts for Qwen-Image-Edit (reference
``pipelines/qwen_image.py:360-380`` passes ``pixel_values`` through
``Qwen2_5_VLModel.visual``) and is the NexusGen prerequisite.  Mirrors
transformers' ``Qwen2_5_VisionTransformerPretrainedModel``:

  - patch embed: Conv3d with kernel == stride == (2, 14, 14) — i.e. a
    dense projection of pre-extracted (C*T*P*P) patch vectors;
  - windowed attention with full-attention blocks at
    ``fullatt_block_indexes``; window partitioning and the token
    reordering it implies are computed HOST-SIDE from the static
    ``grid_thw`` (np port of ``get_window_index``);
  - 2D rotary embeddings over (h, w) patch coordinates (rotate-half
    convention, table duplicated over the two halves);
  - RMS-norm sandwich blocks with biased qkv and SwiGLU MLP (biased);
  - 2x2 patch merger (RMSNorm -> flatten 4 patches -> Linear/GELU/Linear).

Attention uses a dense block-diagonal mask built from the (static)
cu_seqlens — exact and simple; window sizes are <= (window/patch)^2
tokens so the mask stays small.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class QwenVLVisionConfig:
    hidden_size: int = 1280
    out_hidden_size: int = 3584
    intermediate_size: int = 3420
    depth: int = 32
    num_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    in_channels: int = 3
    eps: float = 1e-6

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @staticmethod
    def qwen2_5_vl_7b() -> "QwenVLVisionConfig":
        return QwenVLVisionConfig()

    @staticmethod
    def tiny(**over) -> "QwenVLVisionConfig":
        base = dict(hidden_size=32, out_hidden_size=48, intermediate_size=40,
                    depth=3, num_heads=4, window_size=56,
                    fullatt_block_indexes=(1,))
        base.update(over)
        return QwenVLVisionConfig(**base)


def _dense(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ------------------------------------------------------- host-side indexing
def vision_rot_pos_ids(grid_thw) -> np.ndarray:
    """(L, 2) (h, w) ids in merge-group order (rot_pos_emb)."""
    s = None
    out = []
    for t, h, w, merge in grid_thw:
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

        def group(a):
            a = a.reshape(h // merge, merge, w // merge, merge)
            return a.transpose(0, 2, 1, 3).reshape(-1)

        ids = np.stack([group(hpos), group(wpos)], -1)
        out.append(np.tile(ids, (t, 1)))
    return np.concatenate(out, 0)


def vision_window_index(grid_thw, window_size, patch_size, merge):
    """np port of get_window_index: returns (window_index (Lm,),
    cu_window_seqlens list) where Lm = tokens / merge_unit."""
    window_index: List[np.ndarray] = []
    cu: List[int] = [0]
    wid = 0
    vit_ws = window_size // merge // patch_size
    unit = merge * merge
    for t, h, w in grid_thw:
        gh, gw = h // merge, w // merge
        idx = np.arange(t * gh * gw).reshape(t, gh, gw)
        pad_h = vit_ws - gh % vit_ws
        pad_w = vit_ws - gw % vit_ws
        nh = (gh + pad_h) // vit_ws
        nw = (gw + pad_w) // vit_ws
        idxp = np.pad(idx, ((0, 0), (0, pad_h), (0, pad_w)),
                      constant_values=-100)
        idxp = idxp.reshape(t, nh, vit_ws, nw, vit_ws)
        idxp = idxp.transpose(0, 1, 3, 2, 4).reshape(t, nh * nw, vit_ws,
                                                     vit_ws)
        seqlens = (idxp != -100).sum((2, 3)).reshape(-1)
        flat = idxp.reshape(-1)
        keep = flat[flat != -100]
        window_index.append(keep + wid)
        for sl in np.cumsum(seqlens) * unit + cu[-1]:
            cu.append(int(sl))
        wid += t * gh * gw
    return np.concatenate(window_index), cu


def _block_mask(cu: List[int], length: int) -> np.ndarray:
    """Dense block-diagonal attention mask from cumulative seqlens."""
    seg = np.zeros((length,), np.int64)
    for i in range(1, len(cu)):
        seg[cu[i - 1]:cu[i]] = i
    return seg[:, None] == seg[None, :]


def _apply_rope_half(x, cos, sin):
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos[:, None, :] + rot * sin[:, None, :]).astype(x.dtype)


def qwen_vl_vision_encode(params, cfg: QwenVLVisionConfig, patches,
                          grid_thw):
    """patches (L, C*T*P*P) pre-extracted patch vectors (the processor
    layout transformers uses), grid_thw list of (t, h, w) per image ->
    merged features (L/4, out_hidden_size)."""
    merge = cfg.spatial_merge_size
    unit = merge * merge
    L = patches.shape[0]

    x = _dense(params["patch_embed"], patches)

    ids = vision_rot_pos_ids([(t, h, w, merge) for t, h, w in grid_thw])
    inv = 1.0 / 10000.0 ** (np.arange(0, cfg.head_dim // 2, 2,
                                      dtype=np.float64)
                            / (cfg.head_dim // 2))
    freqs = np.concatenate(
        [ids[:, 0:1] * inv[None], ids[:, 1:2] * inv[None]], -1)
    emb = np.concatenate([freqs, freqs], -1)
    cos = jnp.asarray(np.cos(emb), jnp.float32)
    sin = jnp.asarray(np.sin(emb), jnp.float32)

    widx, cu_window = vision_window_index(grid_thw, cfg.window_size,
                                          cfg.patch_size, merge)
    cu_window = sorted(set(cu_window))
    # reorder tokens into window order (merge groups move together)
    perm = (widx[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    x = x[perm]
    cos = cos[perm]
    sin = sin[perm]

    cu_full = [0]
    for t, h, w in grid_thw:
        for _ in range(t):
            cu_full.append(cu_full[-1] + h * w)
    mask_full = jnp.asarray(_block_mask(cu_full, L))
    mask_win = jnp.asarray(_block_mask(cu_window, L))

    n, hd = cfg.num_heads, cfg.head_dim
    neg = jnp.finfo(jnp.float32).min
    for i, p in enumerate(params["blocks"]):
        mask = mask_full if i in cfg.fullatt_block_indexes else mask_win
        h1 = rms_norm(x, p["norm1"], cfg.eps)
        qkv = _dense(p["qkv"], h1).reshape(L, 3, n, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = _apply_rope_half(q, cos, sin)
        k = _apply_rope_half(k, cos, sin)
        logits = jnp.einsum("qnd,knd->nqk", q, k).astype(jnp.float32)
        logits = logits * (hd ** -0.5)
        logits = jnp.where(mask[None], logits, neg)
        probs = jax.nn.softmax(logits, -1).astype(x.dtype)
        o = jnp.einsum("nqk,knd->qnd", probs, v).reshape(L, n * hd)
        x = x + _dense(p["proj"], o)
        h2 = rms_norm(x, p["norm2"], cfg.eps)
        gate = jax.nn.silu(_dense(p["gate"], h2).astype(jnp.float32)).astype(
            x.dtype)
        x = x + _dense(p["down"], gate * _dense(p["up"], h2))

    # merger: RMSNorm then 2x2 group flatten then MLP (exact-erf GELU)
    x = rms_norm(x, params["merger"]["ln_q"], cfg.eps)
    x = x.reshape(L // unit, unit * cfg.hidden_size)
    x = _dense(params["merger"]["fc1"], x)
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    x = _dense(params["merger"]["fc2"], x)

    # undo the window reordering (merged-token granularity)
    rev = np.argsort(widx)
    return x[jnp.asarray(rev)]


# ------------------------------------------------------------------ convert
def convert_qwen_vl_vision_state_dict(sd: Dict[str, np.ndarray],
                                      cfg: QwenVLVisionConfig, dtype=None):
    """transformers ``...visual.`` naming (prefix stripped or intact)."""
    pre = ""
    for cand in ("visual.", "model.visual."):
        if any(k.startswith(cand + "blocks.0.") for k in sd):
            pre = cand
            break

    def lin(name):
        p = {"w": np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = np.asarray(sd[name + ".bias"])
        return p

    blocks = []
    for i in range(cfg.depth):
        bp = f"{pre}blocks.{i}"
        blocks.append({
            "norm1": np.asarray(sd[bp + ".norm1.weight"]),
            "norm2": np.asarray(sd[bp + ".norm2.weight"]),
            "qkv": lin(bp + ".attn.qkv"),
            "proj": lin(bp + ".attn.proj"),
            "gate": lin(bp + ".mlp.gate_proj"),
            "up": lin(bp + ".mlp.up_proj"),
            "down": lin(bp + ".mlp.down_proj"),
        })
    pw = np.asarray(sd[pre + "patch_embed.proj.weight"])  # (E, C, T, P, P)
    params = {
        "patch_embed": {"w": pw.reshape(pw.shape[0], -1).T},
        "blocks": blocks,
        "merger": {
            "ln_q": np.asarray(sd[pre + "merger.ln_q.weight"]),
            "fc1": lin(pre + "merger.mlp.0"),
            "fc2": lin(pre + "merger.mlp.2"),
        },
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)


# -------------------------------------------------------- preprocessing
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280):
    """transformers qwen2_vl smart_resize: /factor dims, pixel budget,
    aspect preserved."""
    import math

    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, math.floor(height / beta / factor) * factor)
        w_bar = max(factor, math.floor(width / beta / factor) * factor)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def preprocess_image_for_vl(image, cfg: QwenVLVisionConfig,
                            min_pixels: int = 56 * 56,
                            max_pixels: int = 14 * 14 * 4 * 1280):
    """PIL image -> (patches (L, C*T*P*P), grid (t, h, w)) matching the
    transformers Qwen2VLImageProcessor: smart_resize to /28 multiples,
    bicubic, rescale 1/255, CLIP mean/std normalize, temporal repeat to
    T=2, and the (gh/m, gw/m, m, m, C, T, P, P) patch flattening order."""
    from PIL import Image

    p, tp, m = cfg.patch_size, cfg.temporal_patch_size, cfg.spatial_merge_size
    h_bar, w_bar = smart_resize(image.height, image.width,
                                factor=p * m, min_pixels=min_pixels,
                                max_pixels=max_pixels)
    arr = np.asarray(
        image.convert("RGB").resize((w_bar, h_bar), Image.BICUBIC),
        np.float32) / 255.0
    arr = (arr - np.asarray(OPENAI_CLIP_MEAN)) / np.asarray(OPENAI_CLIP_STD)
    arr = arr.transpose(2, 0, 1)[None]  # (1, C, H, W)
    arr = np.repeat(arr, tp, axis=0)  # temporal repeat for a still image
    c = arr.shape[1]
    gt = arr.shape[0] // tp
    gh, gw = h_bar // p, w_bar // p
    patches = arr.reshape(gt, tp, c, gh // m, m, p, gw // m, m, p)
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return (patches.reshape(gt * gh * gw, c * tp * p * p).astype(np.float32),
            (gt, gh, gw))
