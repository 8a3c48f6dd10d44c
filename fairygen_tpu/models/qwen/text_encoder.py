"""Qwen2.5-VL text encoder (text-only path) — functional JAX port.

Qwen-Image conditions on the LAST hidden state of Qwen2.5-VL-7B run over
a chat-templated prompt, dropping the 34 template tokens (reference
``qwen_image_text_encoder.py:5-161``, ``pipelines/qwen_image.py:348-358``).
The reference subclasses transformers' ``Qwen2_5_VLModel``; this module
implements the text decoder stack it runs for t2i prompts:

  - GQA attention (q/k/v with bias, kv heads repeated), causal + padding
    mask, fp32 softmax;
  - RoPE with the standard rotate-half convention.  Qwen2.5-VL's mRoPE
    splits frequencies into (t, h, w) sections, but for TEXT tokens all
    three position streams are identical, so it reduces exactly to 1D
    RoPE — validated by the golden test against transformers;
  - RMSNorm pre-norms + SwiGLU MLP, final RMSNorm (the conditioning
    tensor: transformers' ``hidden_states[-1]`` is post-final-norm).

Image-conditioned editing prompts (``<|image_pad|>`` + the vision tower)
are supported natively — ``models/qwen/vision.py`` provides the tower and
``encode_prompt_with_images`` splices image embeds with real (t,h,w)
mRoPE positions (``tests/test_qwen_vision.py``, ``test_qwen_multimodal.py``).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class QwenVLTextConfig:
    vocab: int = 152064
    dim: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    ffn_dim: int = 18944
    rope_theta: float = 1000000.0
    eps: float = 1e-6
    head_dim_override: int = 0  # Qwen3 decouples head_dim from dim/heads
    qk_norm: bool = False  # Qwen3 per-head q/k RMS norms
    attn_bias: bool = True  # Qwen2.5 has q/k/v biases; Qwen3 none
    mrope_section: Tuple[int, ...] = ()  # Qwen2.5-VL (16, 24, 24)
    image_token_id: int = 151655
    vision_start_token_id: int = 151652

    @property
    def head_dim(self):
        return self.head_dim_override or self.dim // self.num_heads

    @staticmethod
    def qwen2_5_vl_7b() -> "QwenVLTextConfig":
        """Qwen-Image's text encoder (qwen_image_text_encoder.py:8-115)."""
        return QwenVLTextConfig(mrope_section=(16, 24, 24))

    @staticmethod
    def qwen3_4b() -> "QwenVLTextConfig":
        """Z-Image's text encoder (z_image_text_encoder.py:8-37)."""
        return QwenVLTextConfig(
            vocab=151936, dim=2560, num_layers=36, num_heads=32,
            num_kv_heads=8, ffn_dim=9728, head_dim_override=128,
            qk_norm=True, attn_bias=False)

    @staticmethod
    def mistral3_small() -> "QwenVLTextConfig":
        """FLUX.2's text encoder (flux2_text_encoder.py:6-55): Mistral-3
        Small 24B text stack — bias-free GQA, no qk norms."""
        return QwenVLTextConfig(
            vocab=131072, dim=5120, num_layers=40, num_heads=32,
            num_kv_heads=8, ffn_dim=32768, head_dim_override=128,
            rope_theta=1000000000.0, eps=1e-5, attn_bias=False)

    @staticmethod
    def tiny(**over) -> "QwenVLTextConfig":
        base = dict(vocab=128, dim=32, num_layers=2, num_heads=4,
                    num_kv_heads=2, ffn_dim=48)
        base.update(over)
        return QwenVLTextConfig(**base)


def _dense(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _rope_cos_sin(length: int, head_dim: int, theta: float):
    inv = 1.0 / theta ** (np.arange(0, head_dim, 2, dtype=np.float64)
                          / head_dim)
    ang = np.einsum("l,d->ld", np.arange(length, dtype=np.float64), inv)
    # rotate-half convention: frequencies repeated over the two halves
    ang = np.concatenate([ang, ang], axis=-1)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _mrope_cos_sin(position_ids: np.ndarray, head_dim: int, theta: float,
                   sections):
    """Multimodal RoPE tables from (3, L) positions: per-pair angle picks
    its stream by mrope_section (transformers
    apply_multimodal_rotary_pos_emb — the doubled-section split over the
    duplicated halves reduces to a section-wise pick on the half table)."""
    inv = 1.0 / theta ** (np.arange(0, head_dim, 2, dtype=np.float64)
                          / head_dim)
    ang3 = np.einsum("sl,d->sld", position_ids.astype(np.float64), inv)
    parts = []
    off = 0
    for i, width in enumerate(sections):
        parts.append(ang3[i % 3, :, off:off + width])
        off += width
    half = np.concatenate(parts, axis=-1)
    ang = np.concatenate([half, half], axis=-1)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def qwen_vl_rope_index(input_ids: np.ndarray, image_grid_thw,
                       cfg: "QwenVLTextConfig",
                       spatial_merge_size: int = 2) -> np.ndarray:
    """(L,) token ids + per-image (t, h, w) grids -> (3, L) mRoPE positions
    (host-side port of Qwen2_5_VLModel.get_rope_index, text+image path:
    text advances all streams; vision tokens get (t, h, w) grid positions
    offset past the preceding text)."""
    ids = list(np.asarray(input_ids).reshape(-1))
    pos_list = []
    st = 0
    image_index = 0
    for _ in range(len(image_grid_thw)):
        ed = ids.index(cfg.image_token_id, st)
        t, h, w = image_grid_thw[image_index]
        image_index += 1
        gh, gw = h // spatial_merge_size, w // spatial_merge_size
        text_len = ed - st
        st_idx = int(pos_list[-1].max()) + 1 if pos_list else 0
        pos_list.append(np.broadcast_to(np.arange(text_len), (3, text_len))
                        + st_idx)
        t_index = np.repeat(np.arange(t), gh * gw)
        h_index = np.tile(np.repeat(np.arange(gh), gw), t)
        w_index = np.tile(np.arange(gw), t * gh)
        pos_list.append(np.stack([t_index, h_index, w_index])
                        + text_len + st_idx)
        st = ed + t * gh * gw
    if st < len(ids):
        st_idx = int(pos_list[-1].max()) + 1 if pos_list else 0
        text_len = len(ids) - st
        pos_list.append(np.broadcast_to(np.arange(text_len), (3, text_len))
                        + st_idx)
    return np.concatenate(pos_list, axis=1)


def _apply_rope_half(x, cos, sin):
    """(B, L, N, D) rotate-half RoPE (transformers Qwen2 convention)."""
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (xf * c + rot * s).astype(x.dtype)


def qwen_vl_text_encode(params, cfg: QwenVLTextConfig, ids,
                        attention_mask: Optional[jnp.ndarray] = None,
                        hidden_state_index: Optional[int] = None,
                        hidden_state_indices=None,
                        image_embeds: Optional[jnp.ndarray] = None,
                        position_ids: Optional[np.ndarray] = None,
                        inputs_embeds: Optional[jnp.ndarray] = None):
    """ids (B, L) -> hidden states (B, L, dim).

    ``image_embeds``: (L_img, dim) vision-tower outputs spliced into the
    ``image_token_id`` positions (Qwen-Image-Edit / multimodal prompts);
    pass ``position_ids`` (3, L) from :func:`qwen_vl_rope_index` with it.
    ``hidden_state_indices``: tuple of positive layer indices -> ALSO
    return those layers' raw outputs (transformers ``hidden_states[k]``),
    as FLUX.2 stacks layers (10, 20, 30) (flux2_image.py:181-218).
    ``hidden_state_index``: None -> post-final-norm last hidden state
    (transformers ``hidden_states[-1]``, what Qwen-Image consumes);
    -2 -> the input of the last decoder layer, i.e. run num_layers-1
    layers with NO final norm (``hidden_states[-2]``, what Z-Image
    consumes, z_image.py:189)."""
    b, l = ids.shape
    n, nk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = params["embed"][ids] if inputs_embeds is None else inputs_embeds
    if image_embeds is not None:
        assert b == 1, "image splicing runs per sample"
        mask = (ids[0] == cfg.image_token_id)
        # scatter the vision features into the image-token slots in order
        slot = jnp.cumsum(mask) - 1
        x = jnp.where(mask[None, :, None],
                      image_embeds.astype(x.dtype)[slot][None], x)
    if position_ids is not None:
        assert cfg.mrope_section, "mrope_section required for position_ids"
        cos, sin = _mrope_cos_sin(position_ids, hd, cfg.rope_theta,
                                  cfg.mrope_section)
    else:
        cos, sin = _rope_cos_sin(l, hd, cfg.rope_theta)

    causal = jnp.tril(jnp.ones((l, l), bool))[None, None]
    if attention_mask is not None:
        causal = causal & (attention_mask[:, None, None, :] > 0)
    neg = jnp.finfo(jnp.float32).min

    layers = params["layers"]
    if hidden_state_index is not None:
        assert hidden_state_index < 0
        layers = layers[: len(layers) + 1 + hidden_state_index]
    if hidden_state_indices:
        # layers past the deepest requested hidden state are dead compute
        # (FLUX.2 reads (10, 20, 30) of Mistral's 40 layers)
        layers = layers[: max(hidden_state_indices)]
    collected = {}
    for li, p in enumerate(layers):
        h = rms_norm(x, p["ln1"], cfg.eps)
        q = _dense(p["q"], h).reshape(b, l, n, hd)
        k = _dense(p["k"], h).reshape(b, l, nk, hd)
        v = _dense(p["v"], h).reshape(b, l, nk, hd)
        if cfg.qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.eps)
            k = rms_norm(k, p["k_norm"], cfg.eps)
        q = _apply_rope_half(q, cos, sin)
        k = _apply_rope_half(k, cos, sin)
        rep = n // nk
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32)
        logits = logits * (hd ** -0.5)
        logits = jnp.where(causal, logits, neg)
        probs = jax.nn.softmax(logits, -1).astype(x.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, l, n * hd)
        x = x + _dense(p["o"], o)  # o_proj consumes n*hd (may differ from dim)
        h = rms_norm(x, p["ln2"], cfg.eps)
        gate = jax.nn.silu(_dense(p["gate"], h).astype(jnp.float32)).astype(
            x.dtype)
        x = x + _dense(p["down"], gate * _dense(p["up"], h))
        if hidden_state_indices and (li + 1) in hidden_state_indices:
            collected[li + 1] = x
    if hidden_state_indices:
        return [collected[k] for k in hidden_state_indices]
    if hidden_state_index is not None:
        return x
    return rms_norm(x, params["norm"], cfg.eps)


# ------------------------------------------------------------------ convert
def convert_qwen_vl_text_state_dict(sd: Dict[str, np.ndarray],
                                    cfg: QwenVLTextConfig, dtype=None):
    """transformers Qwen2_5_VLModel naming (``language_model.`` /
    ``model.`` / bare prefixes; visual tower ignored)."""
    pre = ""
    for cand in ("language_model.", "model.language_model.", "model."):
        if any(k.startswith(cand + "layers.0.") for k in sd):
            pre = cand
            break

    def lin(name, bias=True):
        p = {"w": np.asarray(sd[name + ".weight"]).T}
        if bias and name + ".bias" in sd:
            p["b"] = np.asarray(sd[name + ".bias"])
        return p

    layers = []
    for i in range(cfg.num_layers):
        lp = f"{pre}layers.{i}"
        layer = {
            "ln1": np.asarray(sd[lp + ".input_layernorm.weight"]),
            "q": lin(lp + ".self_attn.q_proj"),
            "k": lin(lp + ".self_attn.k_proj"),
            "v": lin(lp + ".self_attn.v_proj"),
            "o": lin(lp + ".self_attn.o_proj"),
            "ln2": np.asarray(sd[lp + ".post_attention_layernorm.weight"]),
            "gate": lin(lp + ".mlp.gate_proj"),
            "up": lin(lp + ".mlp.up_proj"),
            "down": lin(lp + ".mlp.down_proj"),
        }
        if cfg.qk_norm:
            layer["q_norm"] = np.asarray(sd[lp + ".self_attn.q_norm.weight"])
            layer["k_norm"] = np.asarray(sd[lp + ".self_attn.k_norm.weight"])
        layers.append(layer)
    params = {
        "embed": np.asarray(sd[pre + "embed_tokens.weight"]),
        "layers": layers,
        "norm": np.asarray(sd[pre + "norm.weight"]),
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)
