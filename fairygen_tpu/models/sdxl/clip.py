"""CLIP text encoders for SDXL (CLIP-L/14 + OpenCLIP bigG).

Functional port of transformers' ``CLIPTextModel`` /
``CLIPTextModelWithProjection`` as used by the reference pipelines
(``pipeline_brushnet_sd_xl.py`` encode_prompt): token + learned position
embeddings, pre-LN causal transformer, final LN, EOS pooling (argmax of
ids), optional text projection.  SDXL consumes the PENULTIMATE hidden
state of both encoders concatenated (768 + 1280 = 2048) and the projected
pooled output of the big encoder.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"  # CLIP-L; bigG uses "gelu"
    projection_dim: Optional[int] = None
    # eos_token_id=2 => transformers falls back to argmax(ids) pooling;
    # otherwise pool at the first occurrence of the eos token.
    eos_token_id: int = 49407

    @staticmethod
    def sdxl_te1() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def sdxl_te2() -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=1280, intermediate_size=5120, num_layers=32,
            num_heads=20, hidden_act="gelu", projection_dim=1280,
        )

    @staticmethod
    def openclip_h14_text() -> "CLIPTextConfig":
        """OpenCLIP ViT-H/14 text tower (HPSv2.1 backbone)."""
        return CLIPTextConfig(
            hidden_size=1024, intermediate_size=4096, num_layers=24,
            num_heads=16, hidden_act="gelu", projection_dim=1024,
        )

    @staticmethod
    def tiny(**over) -> "CLIPTextConfig":
        base = dict(vocab_size=100, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=4, max_position_embeddings=16)
        base.update(over)
        return CLIPTextConfig(**base)


def _act(x, kind):
    xf = x.astype(jnp.float32)
    if kind == "quick_gelu":
        y = xf * jax.nn.sigmoid(1.702 * xf)
    else:
        y = jax.nn.gelu(xf, approximate=False)
    return y.astype(x.dtype)


def _ln(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _dense(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _attn(p, x, num_heads, causal_mask):
    b, l, c = x.shape
    hd = c // num_heads
    q = _dense(p["q_proj"], x).reshape(b, l, num_heads, hd)
    k = _dense(p["k_proj"], x).reshape(b, l, num_heads, hd)
    v = _dense(p["v_proj"], x).reshape(b, l, num_heads, hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32) * (hd**-0.5)
    logits = jnp.where(causal_mask[None, None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, l, c)
    return _dense(p["out_proj"], o)


def clip_text_encode(params, cfg: CLIPTextConfig, ids):
    """ids (B, L) -> dict(hidden_states=[per-layer], last, pooled, projected).

    hidden_states[i] is the input of layer i (transformers convention:
    output_hidden_states includes embeddings first); hidden_states[-2] is
    the penultimate state SDXL consumes (clip_skip=None default).
    """
    b, l = ids.shape
    x = params["token_embedding"][ids] + params["position_embedding"][:l]
    causal = jnp.tril(jnp.ones((l, l), bool))
    hidden_states = [x]
    for blk in params["layers"]:
        h = _ln(blk["ln1"], x)
        x = x + _attn(blk["attn"], h, cfg.num_heads, causal)
        h = _ln(blk["ln2"], x)
        h = _dense(blk["fc1"], h)
        h = _dense(blk["fc2"], _act(h, cfg.hidden_act))
        x = x + h
        hidden_states.append(x)
    last = _ln(params["final_layer_norm"], x)
    if cfg.eos_token_id == 2:
        eos_idx = jnp.argmax(ids, axis=-1)
    else:
        eos_idx = jnp.argmax((ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = last[jnp.arange(b), eos_idx]
    out = {"hidden_states": hidden_states, "last_hidden_state": last, "pooled": pooled}
    if "text_projection" in params:
        out["text_embeds"] = jnp.dot(
            pooled, params["text_projection"].astype(pooled.dtype)
        )
    return out


def sdxl_encode_prompt(te1, te1_cfg, te2, te2_cfg, ids1, ids2):
    """SDXL dual-encoder prompt embedding (pipeline_brushnet_sd_xl.py
    encode_prompt): concat penultimate states; pooled from TE2 projection."""
    o1 = clip_text_encode(te1, te1_cfg, ids1)
    o2 = clip_text_encode(te2, te2_cfg, ids2)
    prompt_embeds = jnp.concatenate(
        [o1["hidden_states"][-2], o2["hidden_states"][-2]], axis=-1
    )
    return prompt_embeds, o2["text_embeds"]


# ------------------------------------------------------------------ converter
def convert_clip_text_state_dict(sd: Dict[str, np.ndarray], cfg: CLIPTextConfig,
                                 dtype=None):
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""

    def lw(name):
        p = {"w": np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = np.asarray(sd[name + ".bias"])
        return p

    def nw(name):
        return {"w": np.asarray(sd[name + ".weight"]), "b": np.asarray(sd[name + ".bias"])}

    layers = []
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        layers.append({
            "ln1": nw(lp + ".layer_norm1"),
            "attn": {
                "q_proj": lw(lp + ".self_attn.q_proj"),
                "k_proj": lw(lp + ".self_attn.k_proj"),
                "v_proj": lw(lp + ".self_attn.v_proj"),
                "out_proj": lw(lp + ".self_attn.out_proj"),
            },
            "ln2": nw(lp + ".layer_norm2"),
            "fc1": lw(lp + ".mlp.fc1"),
            "fc2": lw(lp + ".mlp.fc2"),
        })
    params = {
        "token_embedding": np.asarray(sd[pre + "embeddings.token_embedding.weight"]),
        "position_embedding": np.asarray(sd[pre + "embeddings.position_embedding.weight"]),
        "layers": layers,
        "final_layer_norm": nw(pre + "final_layer_norm"),
    }
    if "text_projection.weight" in sd:
        params["text_projection"] = np.asarray(sd["text_projection.weight"]).T
    if dtype is not None:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    else:
        params = jax.tree.map(jnp.asarray, params)
    return params


# ------------------------------------------------------------- vision tower
@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT vision tower with projection — CLIPScore / aesthetic metrics
    use openai CLIP-L/14 (evaluate_brushnet.py:41,54)."""
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"  # openai CLIP; OpenCLIP H/14 uses gelu

    @staticmethod
    def clip_l14() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def openclip_h14() -> "CLIPVisionConfig":
        """OpenCLIP ViT-H/14 vision tower (HPSv2.1 backbone)."""
        return CLIPVisionConfig(
            hidden_size=1280, num_layers=32, num_heads=16,
            intermediate_size=5120, projection_dim=1024, hidden_act="gelu",
        )

    @staticmethod
    def tiny(**over) -> "CLIPVisionConfig":
        base = dict(hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, image_size=32, patch_size=8,
                    projection_dim=16)
        base.update(over)
        return CLIPVisionConfig(**base)


CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_vision_encode(params, cfg: CLIPVisionConfig, pixel_values):
    """pixel_values (B, 3, H, W) CLIP-normalized -> projected image embeds
    (B, projection_dim) — HF CLIPVisionModelWithProjection forward."""
    b = pixel_values.shape[0]
    x = jnp.transpose(pixel_values, (0, 2, 3, 1))  # NHWC
    p = cfg.patch_size
    # patch conv (no bias) as rearrange + matmul
    B, H, W, C = x.shape
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, (H // p) * (W // p), C * p * p)
    x = jnp.dot(x, params["patch_embedding"].astype(x.dtype))
    cls = jnp.broadcast_to(params["class_embedding"][None, None].astype(x.dtype),
                           (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][: x.shape[1]].astype(x.dtype)
    x = _ln(params["pre_layernorm"], x)
    full = jnp.ones((x.shape[1], x.shape[1]), bool)  # bidirectional
    for blk in params["layers"]:
        h = _ln(blk["ln1"], x)
        x = x + _attn(blk["attn"], h, cfg.num_heads, full)
        h = _ln(blk["ln2"], x)
        h = _dense(blk["fc1"], h)
        h = _dense(blk["fc2"], _act(h, cfg.hidden_act))
        x = x + h
    pooled = _ln(params["post_layernorm"], x[:, 0])
    return jnp.dot(pooled, params["visual_projection"].astype(pooled.dtype))


def convert_clip_vision_state_dict(sd: Dict[str, np.ndarray],
                                   cfg: CLIPVisionConfig, dtype=None):
    pre = "vision_model." if any(k.startswith("vision_model.")
                                 for k in sd) else ""

    def g(name):
        return np.asarray(sd[name])

    def lw(name):
        return {"w": g(name + ".weight").T, "b": g(name + ".bias")}

    def nw(name):
        return {"w": g(name + ".weight"), "b": g(name + ".bias")}

    pe = g(pre + "embeddings.patch_embedding.weight")  # (D, 3, p, p)
    params = {
        # (3, p, p) pixel vector order matches the forward's rearrange
        "patch_embedding": pe.reshape(cfg.hidden_size, -1).T,
        "class_embedding": g(pre + "embeddings.class_embedding"),
        "position_embedding": g(pre + "embeddings.position_embedding.weight"),
        # HF typo preserved in checkpoints: "pre_layrnorm"
        "pre_layernorm": nw(pre + ("pre_layrnorm" if pre + "pre_layrnorm.weight"
                                   in sd else "pre_layernorm")),
        "post_layernorm": nw(pre + "post_layernorm"),
        "visual_projection": np.asarray(sd["visual_projection.weight"]).T,
        "layers": [],
    }
    i = 0
    while f"{pre}encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"{pre}encoder.layers.{i}"
        params["layers"].append({
            "ln1": nw(lp + ".layer_norm1"),
            "ln2": nw(lp + ".layer_norm2"),
            "attn": {
                "q_proj": lw(lp + ".self_attn.q_proj"),
                "k_proj": lw(lp + ".self_attn.k_proj"),
                "v_proj": lw(lp + ".self_attn.v_proj"),
                "out_proj": lw(lp + ".self_attn.out_proj"),
            },
            "fc1": lw(lp + ".mlp.fc1"),
            "fc2": lw(lp + ".mlp.fc2"),
        })
        i += 1
    if dtype is not None:
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    else:
        params = jax.tree.map(jnp.asarray, params)
    return params


# ------------------------------------------------------- OpenCLIP checkpoints
def convert_open_clip_state_dict(sd: Dict[str, np.ndarray], dtype=None):
    """Convert an OpenCLIP-format checkpoint (both towers) to our trees.

    OpenCLIP/HPSv2 checkpoints (``visual.transformer.resblocks...``,
    fused ``attn.in_proj_weight``) — the format of HPSv2.1's ViT-H/14
    (reference evaluate_brushnet.py:65 ``hpsv2.score``).  Returns
    ``(visual_params, text_params, logit_scale)``; pair with
    ``CLIPVisionConfig.openclip_h14()`` / ``CLIPTextConfig.openclip_h14_text()``
    for the real model.
    """

    def g(name):
        return np.asarray(sd[name])

    def nw(name):
        return {"w": g(name + ".weight"), "b": g(name + ".bias")}

    def block(prefix, dim):
        w = g(prefix + ".attn.in_proj_weight")  # (3D, D)
        b = g(prefix + ".attn.in_proj_bias")
        qw, kw, vw = w[:dim], w[dim:2 * dim], w[2 * dim:]
        qb, kb, vb = b[:dim], b[dim:2 * dim], b[2 * dim:]
        return {
            "ln1": nw(prefix + ".ln_1"),
            "ln2": nw(prefix + ".ln_2"),
            "attn": {
                "q_proj": {"w": qw.T, "b": qb},
                "k_proj": {"w": kw.T, "b": kb},
                "v_proj": {"w": vw.T, "b": vb},
                "out_proj": {"w": g(prefix + ".attn.out_proj.weight").T,
                             "b": g(prefix + ".attn.out_proj.bias")},
            },
            "fc1": {"w": g(prefix + ".mlp.c_fc.weight").T,
                    "b": g(prefix + ".mlp.c_fc.bias")},
            "fc2": {"w": g(prefix + ".mlp.c_proj.weight").T,
                    "b": g(prefix + ".mlp.c_proj.bias")},
        }

    vdim = g("visual.class_embedding").shape[0]
    conv1 = g("visual.conv1.weight")  # (D, 3, p, p), no bias
    visual = {
        "patch_embedding": conv1.reshape(vdim, -1).T,
        "class_embedding": g("visual.class_embedding"),
        "position_embedding": g("visual.positional_embedding"),
        "pre_layernorm": nw("visual.ln_pre"),
        "post_layernorm": nw("visual.ln_post"),
        # already (D, proj): no transpose, unlike HF's (proj, D)
        "visual_projection": g("visual.proj"),
        "layers": [],
    }
    i = 0
    while f"visual.transformer.resblocks.{i}.ln_1.weight" in sd:
        visual["layers"].append(block(f"visual.transformer.resblocks.{i}",
                                      vdim))
        i += 1

    tdim = g("token_embedding.weight").shape[1]
    text = {
        "token_embedding": g("token_embedding.weight"),
        "position_embedding": g("positional_embedding"),
        "final_layer_norm": nw("ln_final"),
        "text_projection": g("text_projection"),
        "layers": [],
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        text["layers"].append(block(f"transformer.resblocks.{i}", tdim))
        i += 1

    cast = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return (jax.tree.map(cast, visual), jax.tree.map(cast, text),
            float(np.exp(g("logit_scale"))) if "logit_scale" in sd else 100.0)
