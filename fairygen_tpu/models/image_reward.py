"""ImageReward-v1.0 scorer — functional JAX port of the BLIP reward model.

The reference metric battery scores generations with
``RM.load("ImageReward-v1.0")`` (evaluate_brushnet.py:56,60-62).
ImageReward (THUDM) = BLIP backbone + a linear MLP head:

  - vision: timm-style ViT-L/16 (``blip.visual_encoder.*``: cls token +
    learned pos embed, pre-LN blocks with fused qkv, final LayerNorm)
  - text: BLIP "med" BERT-base with cross-attention over the image tokens
    in every layer (``blip.text_encoder.*``: post-LN self-attn ->
    cross-attn -> GELU FFN)
  - head: MLP 768->1024->128->64->16->1 with NO nonlinearities
    (ImageReward.py MLP), applied to the [CLS] text state, then fixed
    z-normalization (mean/std constants from ImageReward.py score()).

``convert_image_reward_state_dict`` consumes the published
ImageReward-v1.0 checkpoint naming verbatim.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ImageReward.py score(): reward z-normalization constants
IMAGE_REWARD_MEAN = 0.16717362830052426
IMAGE_REWARD_STD = 1.0333394966054072


@dataclasses.dataclass(frozen=True)
class BlipViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0

    @staticmethod
    def vit_l16() -> "BlipViTConfig":
        return BlipViTConfig()

    @staticmethod
    def tiny(**over) -> "BlipViTConfig":
        base = dict(image_size=32, patch_size=8, hidden_size=24,
                    num_layers=2, num_heads=4)
        base.update(over)
        return BlipViTConfig(**base)


@dataclasses.dataclass(frozen=True)
class MedBertConfig:
    vocab_size: int = 30524  # bert-base-uncased + [DEC]/[ENC] tokens
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    encoder_width: int = 1024  # ViT-L hidden
    layer_norm_eps: float = 1e-12

    @staticmethod
    def image_reward() -> "MedBertConfig":
        return MedBertConfig()

    @staticmethod
    def tiny(**over) -> "MedBertConfig":
        base = dict(vocab_size=64, hidden_size=16, num_layers=2,
                    num_heads=2, intermediate_size=32,
                    max_position_embeddings=24, encoder_width=24)
        base.update(over)
        return MedBertConfig(**base)


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["w"] + p["b"]).astype(x.dtype)


def _dense(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    return y + p["b"].astype(x.dtype) if "b" in p else y


def _mha(q, k, v, num_heads, mask=None):
    b, lq, c = q.shape
    lk = k.shape[1]
    hd = q.shape[-1] // num_heads
    q = q.reshape(b, lq, num_heads, hd)
    k = k.reshape(b, lk, num_heads, hd)
    v = v.reshape(b, lk, num_heads, hd)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32)
    logits = logits * (hd ** -0.5)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :].astype(bool), logits,
                           jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, -1).astype(v.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, lq, -1)


# -- BLIP ViT (timm naming) ----------------------------------------------------

def blip_vit_forward(params, cfg: BlipViTConfig, pixel_values):
    """pixel_values (B, 3, H, W) BLIP-normalized -> (B, 1+N, D) tokens
    (blip.py VisionTransformer.forward; final LayerNorm included)."""
    x = jnp.transpose(pixel_values, (0, 2, 3, 1))
    p = cfg.patch_size
    B, H, W, C = x.shape
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(B, -1, C * p * p)
    x = jnp.dot(x, params["patch_embedding"]["w"].astype(x.dtype))
    x = x + params["patch_embedding"]["b"].astype(x.dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][: x.shape[1]].astype(x.dtype)
    for blk in params["blocks"]:
        h = _ln(blk["norm1"], x, 1e-6)
        qkv = _dense(blk["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + _dense(blk["proj"], _mha(q, k, v, cfg.num_heads))
        h = _ln(blk["norm2"], x, 1e-6)
        x = x + _dense(blk["fc2"], jax.nn.gelu(
            _dense(blk["fc1"], h).astype(jnp.float32), approximate=False
        ).astype(x.dtype))
    return _ln(params["norm"], x, 1e-6)


# -- BLIP med BERT with cross-attention ------------------------------------------

def med_bert_forward(params, cfg: MedBertConfig, ids, attention_mask,
                     encoder_hidden_states):
    """BLIP med.py BertModel in multimodal mode: every layer runs
    self-attention (masked), cross-attention over the image tokens, and a
    GELU FFN — all post-LN."""
    eps = cfg.layer_norm_eps
    l = ids.shape[1]
    x = (params["word_embeddings"][ids]
         + params["position_embeddings"][:l][None])
    x = _ln(params["embeddings_norm"], x, eps)
    for blk in params["layers"]:
        # self attention (post-LN: residual then LayerNorm)
        sa = blk["self"]
        o = _mha(_dense(sa["q"], x), _dense(sa["k"], x), _dense(sa["v"], x),
                 cfg.num_heads, mask=attention_mask)
        x = _ln(sa["out_norm"], x + _dense(sa["out"], o), eps)
        # cross attention over image tokens
        ca = blk["cross"]
        o = _mha(_dense(ca["q"], x),
                 _dense(ca["k"], encoder_hidden_states.astype(x.dtype)),
                 _dense(ca["v"], encoder_hidden_states.astype(x.dtype)),
                 cfg.num_heads)
        x = _ln(ca["out_norm"], x + _dense(ca["out"], o), eps)
        # FFN
        h = jax.nn.gelu(_dense(blk["fc1"], x).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = _ln(blk["ffn_norm"], x + _dense(blk["fc2"], h), eps)
    return x


# -- reward head ------------------------------------------------------------------

def image_reward_score(params, image_pixels, text_ids, attention_mask,
                       vit_cfg: BlipViTConfig = None,
                       bert_cfg: MedBertConfig = None,
                       normalize: bool = True):
    """ImageReward.py score(): BLIP multimodal [CLS] feature -> MLP ->
    z-normalized reward.  image_pixels: (B, 3, H, W) BLIP-normalized."""
    vit_cfg = vit_cfg or BlipViTConfig.vit_l16()
    bert_cfg = bert_cfg or MedBertConfig.image_reward()
    image_embeds = blip_vit_forward(params["visual_encoder"], vit_cfg,
                                    image_pixels)
    txt = med_bert_forward(params["text_encoder"], bert_cfg,
                           jnp.asarray(text_ids), jnp.asarray(attention_mask),
                           image_embeds)
    feat = txt[:, 0, :]
    h = feat
    for layer in params["mlp"]:
        h = _dense(layer, h)  # no nonlinearity (ImageReward.py MLP)
    reward = h[..., 0]
    if normalize:
        reward = (reward - IMAGE_REWARD_MEAN) / IMAGE_REWARD_STD
    return reward


def blip_preprocess(image_uint8, size: int = 224):
    """ImageReward _transform: bicubic resize + center crop + CLIP-stat
    normalization -> (1, 3, size, size)."""
    from ..utils.metrics import clip_preprocess

    return clip_preprocess(image_uint8, size)


# -- converter ---------------------------------------------------------------------

def convert_image_reward_state_dict(
    sd: Dict[str, np.ndarray], dtype=None,
) -> Tuple[Dict[str, Any], BlipViTConfig, MedBertConfig]:
    """Convert the published ImageReward-v1.0 state dict
    (``blip.visual_encoder.*`` timm ViT naming, ``blip.text_encoder.*``
    med BERT naming, ``mlp.layers.{0,2,4,6,7}``)."""

    def g(name):
        return np.asarray(sd[name])

    def lw(name):
        p = {"w": g(name + ".weight").T}
        if name + ".bias" in sd:
            p["b"] = g(name + ".bias")
        return p

    def nw(name):
        return {"w": g(name + ".weight"), "b": g(name + ".bias")}

    # vision (timm ViT)
    vp = "blip.visual_encoder."
    conv = g(vp + "patch_embed.proj.weight")  # (D, 3, p, p)
    dim = conv.shape[0]
    patch = conv.shape[-1]
    visual: Dict[str, Any] = {
        "patch_embedding": {"w": conv.reshape(dim, -1).T,
                            "b": g(vp + "patch_embed.proj.bias")},
        "cls_token": g(vp + "cls_token")[0],          # (1, 1, D) -> (1, D)
        "pos_embed": g(vp + "pos_embed")[0],          # (1, L, D) -> (L, D)
        "norm": nw(vp + "norm"),
        "blocks": [],
    }
    i = 0
    while f"{vp}blocks.{i}.norm1.weight" in sd:
        b = f"{vp}blocks.{i}"
        visual["blocks"].append({
            "norm1": nw(b + ".norm1"),
            "qkv": lw(b + ".attn.qkv"),
            "proj": lw(b + ".attn.proj"),
            "norm2": nw(b + ".norm2"),
            "fc1": lw(b + ".mlp.fc1"),
            "fc2": lw(b + ".mlp.fc2"),
        })
        i += 1
    n_layers_v = i
    heads_v = 16 if dim >= 1024 else max(dim // 64, 1)
    vit_cfg = BlipViTConfig(
        image_size=int(np.sqrt(visual["pos_embed"].shape[0] - 1)) * patch,
        patch_size=patch, hidden_size=dim, num_layers=n_layers_v,
        num_heads=heads_v,
    )

    # text (med BERT)
    tp = "blip.text_encoder."
    text: Dict[str, Any] = {
        "word_embeddings": g(tp + "embeddings.word_embeddings.weight"),
        "position_embeddings": g(tp + "embeddings.position_embeddings.weight"),
        "embeddings_norm": nw(tp + "embeddings.LayerNorm"),
        "layers": [],
    }
    i = 0
    while f"{tp}encoder.layer.{i}.attention.self.query.weight" in sd:
        b = f"{tp}encoder.layer.{i}"
        text["layers"].append({
            "self": {
                "q": lw(b + ".attention.self.query"),
                "k": lw(b + ".attention.self.key"),
                "v": lw(b + ".attention.self.value"),
                "out": lw(b + ".attention.output.dense"),
                "out_norm": nw(b + ".attention.output.LayerNorm"),
            },
            "cross": {
                "q": lw(b + ".crossattention.self.query"),
                "k": lw(b + ".crossattention.self.key"),
                "v": lw(b + ".crossattention.self.value"),
                "out": lw(b + ".crossattention.output.dense"),
                "out_norm": nw(b + ".crossattention.output.LayerNorm"),
            },
            "fc1": lw(b + ".intermediate.dense"),
            "fc2": lw(b + ".output.dense"),
            "ffn_norm": nw(b + ".output.LayerNorm"),
        })
        i += 1
    hidden_t = text["word_embeddings"].shape[1]
    bert_cfg = MedBertConfig(
        vocab_size=text["word_embeddings"].shape[0],
        hidden_size=hidden_t, num_layers=i,
        num_heads=12 if hidden_t >= 768 else max(hidden_t // 64, 1),
        intermediate_size=text["layers"][0]["fc1"]["w"].shape[1],
        max_position_embeddings=text["position_embeddings"].shape[0],
        encoder_width=dim,
    )

    # MLP head: Sequential indices 0,2,4,6,7 (dropouts hold 1,3,5)
    mlp = []
    for idx in (0, 2, 4, 6, 7):
        if f"mlp.layers.{idx}.weight" in sd:
            mlp.append(lw(f"mlp.layers.{idx}"))

    params = {"visual_encoder": visual, "text_encoder": text, "mlp": mlp}
    cast = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(cast, params), vit_cfg, bert_cfg
