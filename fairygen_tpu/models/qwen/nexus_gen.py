"""NexusGen autoregressive image-embedding generator — functional port.

The reference's NexusGen (``animation/diffsynth/models/nexus_gen.py`` +
``nexus_gen_ar_model.py``) is Qwen2.5-VL plus a ``vision_head`` linear
projection and 81 learned ``image_prefill_embeds`` query slots.  The
DiffSynth inference path is a SINGLE prefill pass (not iterative decode):
the prompt's target-image token span carries the prefill queries, the
model's ``vision_head(hidden)`` output shifted by one position yields the
81 image embeddings, and the generation ``NexusGenAdapter`` MLP projects
them to the FLUX context dimension — they drive FluxImagePipeline as
``prompt_emb`` (reference ``FluxImageUnit_NexusGen``,
``pipelines/flux_image.py:615-668``).

Reuses the shared Qwen2.5-VL stack (text + vision tower + mRoPE) from
``models/qwen``.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.norms import rms_norm
from .text_encoder import (
    QwenVLTextConfig,
    convert_qwen_vl_text_state_dict,
    qwen_vl_rope_index,
    qwen_vl_text_encode,
)

NUM_IMG_TOKENS = 81  # image_prefill_embeds table size (the 252x252 slot)


def nexus_gen_target_embeddings(
    params,
    cfg: QwenVLTextConfig,
    ids: np.ndarray,  # (1, L) with the target-image token span
    image_grid_thw: Sequence[Tuple[int, int, int]],  # incl. the target slot
    input_image_embeds: Optional[jnp.ndarray] = None,  # (L_in, dim) edit ref
    num_img_tokens: int = NUM_IMG_TOKENS,
):
    """-> (num_img_tokens, dim) predicted image embeddings
    (reference get_target_embeddings, nexus_gen.py:116-152): splice edit
    reference features (if any) into the leading image-token slots and the
    learned prefill queries into the trailing ``num_img_tokens`` slots,
    run the prefill, apply vision_head, and read the predictions at the
    positions PRECEDING each target slot (the shift-by-one)."""
    ids_np = np.asarray(ids)
    x = jnp.asarray(params["embed"])[jnp.asarray(ids_np)]
    mask = ids_np[0] == cfg.image_token_id
    img_positions = np.nonzero(mask)[0]
    gt_positions = img_positions[-num_img_tokens:]
    in_positions = img_positions[: len(img_positions) - num_img_tokens]

    if len(in_positions):
        assert input_image_embeds is not None
        x = x.at[0, jnp.asarray(in_positions)].set(
            input_image_embeds.astype(x.dtype))
    prefill = jnp.asarray(params["image_prefill"])[:num_img_tokens]
    x = x.at[0, jnp.asarray(gt_positions)].set(prefill.astype(x.dtype))

    pos = qwen_vl_rope_index(ids_np[0], image_grid_thw, cfg)
    hidden = qwen_vl_text_encode(params, cfg, jnp.asarray(ids_np),
                                 position_ids=pos, inputs_embeds=x)
    image_embeds = jnp.dot(hidden, params["vision_head"]["w"].astype(
        hidden.dtype))
    # shift: predictions live one position before each target slot
    return image_embeds[0][jnp.asarray(gt_positions - 1)]


def nexus_gen_adapter(params, x):
    """Generation adapter: Linear -> LayerNorm -> ReLU -> Linear ->
    LayerNorm (nexus_gen_projector.py:389-406), 3584 -> 4096 (FLUX ctx)."""

    def ln(p, v):
        vf = v.astype(jnp.float32)
        mu = vf.mean(-1, keepdims=True)
        var = vf.var(-1, keepdims=True)
        y = (vf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (y * p["w"] + p["b"]).astype(v.dtype)

    def dense(p, v):
        return jnp.dot(v, p["w"].astype(v.dtype)) + p["b"].astype(v.dtype)

    x = ln(params["ln1"], dense(params["fc1"], x))
    x = jax.nn.relu(x)
    return ln(params["ln2"], dense(params["fc2"], x))


# ------------------------------------------------------------------ convert
def convert_nexus_gen_state_dict(sd: Dict[str, np.ndarray],
                                 cfg: QwenVLTextConfig, dtype=None):
    """Fork naming: model.language_model.* (or model.model.*) text stack +
    vision_head + image_prefill_embeds (visual.* handled by the vision
    converter)."""
    params = convert_qwen_vl_text_state_dict(sd, cfg, dtype=dtype)
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    params["vision_head"] = {"w": to(np.asarray(sd["vision_head.weight"]).T)}
    params["image_prefill"] = to(np.asarray(sd["image_prefill_embeds.weight"]))
    return params


def convert_nexus_gen_adapter_state_dict(sd: Dict[str, np.ndarray],
                                         dtype=None):
    pre = "adapter." if any(k.startswith("adapter.") for k in sd) else ""
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray

    def lin(i):
        return {"w": to(np.asarray(sd[f"{pre}adapter.{i}.weight"]).T),
                "b": to(np.asarray(sd[f"{pre}adapter.{i}.bias"]))}

    def norm(i):
        return {"w": to(np.asarray(sd[f"{pre}adapter.{i}.weight"])),
                "b": to(np.asarray(sd[f"{pre}adapter.{i}.bias"]))}

    return {"fc1": lin(0), "ln1": norm(1), "fc2": lin(3), "ln2": norm(4)}


# ------------------------------------------------------------------ merger
import dataclasses as _dc


@_dc.dataclass(frozen=True)
class NexusGenMergerConfig:
    """NexusGenImageEmbeddingMerger (nexus_gen_projector.py:255-372): one
    (or more) bidirectional Qwen2.5-VL decoder layers over the
    [target; reference] embeddings with FRACTIONAL mRoPE positions scaled
    to a (1, 72, 72) base grid, then an RMS/Linear/RMS/SiLU/Linear/RMS
    projector to the FLUX context dim."""
    hidden: int = 3584
    num_heads: int = 28
    num_kv_heads: int = 4
    intermediate: int = 18944
    num_layers: int = 1
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    rope_theta: float = 1e6
    eps: float = 1e-6
    out_channel: int = 4096
    expand_ratio: int = 4
    base_grid: Tuple[int, int, int] = (1, 72, 72)
    spatial_merge_size: int = 2
    tokens_per_second: int = 2

    @property
    def head_dim(self):
        return self.hidden // self.num_heads

    @staticmethod
    def tiny(**over) -> "NexusGenMergerConfig":
        base = dict(hidden=32, num_heads=4, num_kv_heads=2, intermediate=64,
                    mrope_section=(2, 1, 1), out_channel=48, expand_ratio=2)
        base.update(over)
        return NexusGenMergerConfig(**base)


def nexus_gen_merger_positions(grid, cfg: NexusGenMergerConfig):
    """(3, L) FRACTIONAL positions (get_position_ids,
    nexus_gen_projector.py:327-356): h/w indices scaled by
    base_grid / grid so every resolution maps onto the 72x72 frame."""
    t, h, w = grid
    m = cfg.spatial_merge_size
    gh, gw = h // m, w // m
    sh, sw = cfg.base_grid[1] / h, cfg.base_grid[2] / w
    t_idx = np.repeat(np.arange(t) * cfg.tokens_per_second, gh * gw)
    h_idx = np.tile(np.repeat(np.arange(gh), gw), t) * sh
    w_idx = np.tile(np.arange(gw), t * gh) * sw
    return np.stack([t_idx, h_idx, w_idx]).astype(np.float64)


def nexus_gen_merger(params, cfg: NexusGenMergerConfig, embeds, grid,
                     ref_embeds=None, ref_grid=None):
    """embeds (1, L, hidden) target embeddings (+ optional reference) ->
    (1, L(+Lr), out_channel) FLUX prompt embedding."""
    from .text_encoder import _mrope_cos_sin

    pos = nexus_gen_merger_positions(grid, cfg)
    x = embeds
    if ref_embeds is not None:
        pos = np.concatenate(
            [pos, nexus_gen_merger_positions(ref_grid, cfg)], axis=1)
        x = jnp.concatenate([embeds, ref_embeds], axis=1)
    cos, sin = _mrope_cos_sin(pos, cfg.head_dim, cfg.rope_theta,
                              cfg.mrope_section)

    b, l, _ = x.shape
    n, nk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    for p in params["layers"]:
        h = rms_norm(x, p["ln1"], cfg.eps)
        q = _merger_dense(p["q"], h).reshape(b, l, n, hd)
        k = _merger_dense(p["k"], h).reshape(b, l, nk, hd)
        v = _merger_dense(p["v"], h).reshape(b, l, nk, hd)
        q = _rope_half_tables(q, cos, sin)
        k = _rope_half_tables(k, cos, sin)
        rep = n // nk
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        # bidirectional — the merger layer applies NO mask
        # (nexus_gen_projector.py:131-178)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32) \
            * (hd ** -0.5)
        probs = jax.nn.softmax(logits, -1).astype(x.dtype)
        o = jnp.einsum("bnqk,bknd->bqnd", probs, v).reshape(b, l, n * hd)
        x = x + _merger_dense(p["o"], o)
        h = rms_norm(x, p["ln2"], cfg.eps)
        gate = jax.nn.silu(_merger_dense(p["gate"], h).astype(jnp.float32)
                           ).astype(x.dtype)
        x = x + _merger_dense(p["down"], gate * _merger_dense(p["up"], h))

    pj = params["projector"]
    x = rms_norm(x, pj["rms1"], cfg.eps)
    x = _merger_dense(pj["fc1"], x)
    x = rms_norm(x, pj["rms2"], cfg.eps)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = _merger_dense(pj["fc2"], x)
    return rms_norm(x, pj["rms3"], cfg.eps)


def _merger_dense(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _rope_half_tables(x, cos, sin):
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos[None, :, None, :] + rot * sin[None, :, None, :]).astype(
        x.dtype)


def convert_nexus_gen_merger_state_dict(sd: Dict[str, np.ndarray],
                                        cfg: Optional[NexusGenMergerConfig]
                                        = None, dtype=None):
    if any(k.startswith("embedding_merger.") for k in sd):
        sd = {k[len("embedding_merger."):]: v for k, v in sd.items()
              if k.startswith("embedding_merger.")}
    if cfg is None:
        cfg = NexusGenMergerConfig(num_layers=1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("layers.")))

    def lin(name):
        p = {"w": np.asarray(sd[name + ".weight"]).T}
        if name + ".bias" in sd:
            p["b"] = np.asarray(sd[name + ".bias"])
        return p

    def layer(i):
        pre = f"layers.{i}"
        return {
            "ln1": np.asarray(sd[pre + ".input_layernorm.weight"]),
            "q": lin(pre + ".self_attn.q_proj"),
            "k": lin(pre + ".self_attn.k_proj"),
            "v": lin(pre + ".self_attn.v_proj"),
            "o": lin(pre + ".self_attn.o_proj"),
            "ln2": np.asarray(sd[pre + ".post_attention_layernorm.weight"]),
            "gate": lin(pre + ".mlp.gate_proj"),
            "up": lin(pre + ".mlp.up_proj"),
            "down": lin(pre + ".mlp.down_proj"),
        }

    params = {
        "layers": [layer(i) for i in range(cfg.num_layers)],
        "projector": {
            "rms1": np.asarray(sd["projector.0.weight"]),
            "fc1": lin("projector.1"),
            "rms2": np.asarray(sd["projector.2.weight"]),
            "fc2": lin("projector.4"),
            "rms3": np.asarray(sd["projector.5.weight"]),
        },
    }
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params), cfg


def nexus_gen_editing_text_ids(lat_h: int, lat_w: int, embed_grid,
                               ref_grid) -> np.ndarray:
    """Fractional FLUX text ids for the editing prompt tokens
    (FluxImageUnit_NexusGen.get_editing_text_ids, flux_image.py:648-668):
    target tokens span the latent grid; reference tokens get batch-axis 1."""
    def ids(h, w, batch_axis):
        e = np.zeros((h // 2, w // 2, 3), np.float64)
        e[..., 0] = batch_axis
        e[..., 1] += np.arange(h // 2)[:, None] * (lat_h / h)
        e[..., 2] += np.arange(w // 2)[None, :] * (lat_w / w)
        return e.reshape(-1, 3)

    return np.concatenate([ids(embed_grid[1], embed_grid[2], 0.0),
                           ids(ref_grid[1], ref_grid[2], 1.0)], axis=0)


GENERATION_MESSAGES = [
    {"role": "user",
     "content": "Generate an image according to the following description: {}"},
    {"role": "assistant",
     "content": "Here is an image based on the description: <image>"},
]
TARGET_GRID = (1, 18, 18)  # the blank 252x252 target slot (252/14 = 18)


EDITING_MESSAGES = [
    {"role": "user", "content": "<image> {}"},
    {"role": "assistant", "content": "Here is the image: <image>"},
]


def nexus_gen_editing_flux_prompt_emb(ar_params, cfg: QwenVLTextConfig,
                                      vision_params, vision_cfg,
                                      merger_params,
                                      merger_cfg: "NexusGenMergerConfig",
                                      tokenizer, instruction: str,
                                      ref_image, lat_h: int, lat_w: int):
    """instruction + reference image -> (prompt_emb (1, L, 4096),
    txt_ids (L, 3)) for the FLUX editing flow (reference
    FluxImageUnit_NexusGen editing branch, flux_image.py:632-668 +
    NexusGen.forward with ref_image, nexus_gen.py:102-108)."""
    from .vision import preprocess_image_for_vl, qwen_vl_vision_encode

    patches, ref_grid = preprocess_image_for_vl(ref_image, vision_cfg)
    ref_embeds = qwen_vl_vision_encode(vision_params, vision_cfg,
                                       jnp.asarray(patches), [ref_grid])

    msg = instruction if "<image>" in instruction else "<image> " + instruction
    messages = [{"role": "user", "content": msg},
                {"role": "assistant", "content": "Here is the image: <image>"}]
    text = tokenizer.apply_chat_template(messages, tokenize=False,
                                         add_generation_prompt=False)
    m = vision_cfg.spatial_merge_size
    ref_merged = ref_grid[0] * (ref_grid[1] // m) * (ref_grid[2] // m)
    tgt_merged = TARGET_GRID[0] * (TARGET_GRID[1] // 2) * (TARGET_GRID[2] // 2)
    parts = text.split("<image>")
    assert len(parts) == 3
    text = (parts[0]
            + "<|vision_start|>" + "<|image_pad|>" * ref_merged
            + "<|vision_end|>" + parts[1]
            + "<|vision_start|>" + "<|image_pad|>" * tgt_merged
            + "<|vision_end|>" + parts[2])
    ids = tokenizer(text, return_tensors="np").input_ids
    embed = nexus_gen_target_embeddings(
        ar_params, cfg, ids, [tuple(ref_grid), TARGET_GRID],
        input_image_embeds=ref_embeds, num_img_tokens=tgt_merged)
    prompt_emb = nexus_gen_merger(merger_params, merger_cfg, embed[None],
                                  TARGET_GRID, ref_embeds[None],
                                  tuple(ref_grid))
    txt_ids = nexus_gen_editing_text_ids(lat_h, lat_w, TARGET_GRID,
                                         tuple(ref_grid))
    return prompt_emb, txt_ids


def nexus_gen_flux_prompt_emb(ar_params, cfg: QwenVLTextConfig,
                              adapter_params, tokenizer, instruction: str):
    """instruction -> (1, 81, 4096) FLUX prompt embedding (the reference
    generation flow: chat template with the <image> target slot, single
    prefill, generation adapter — nexus_gen.py:96-114 +
    FluxImageUnit_NexusGen).  ``tokenizer``: a Qwen2.5-VL tokenizer."""
    messages = [
        {"role": m["role"],
         "content": m["content"].format(instruction)
         if "{}" in m["content"] else m["content"]}
        for m in GENERATION_MESSAGES
    ]
    text = tokenizer.apply_chat_template(messages, tokenize=False,
                                         add_generation_prompt=False)
    merged = TARGET_GRID[0] * (TARGET_GRID[1] // 2) * (TARGET_GRID[2] // 2)
    text = text.replace(
        "<image>",
        "<|vision_start|>" + "<|image_pad|>" * merged + "<|vision_end|>")
    ids = tokenizer(text, return_tensors="np").input_ids
    emb = nexus_gen_target_embeddings(ar_params, cfg, ids, [TARGET_GRID],
                                      num_img_tokens=merged)
    return nexus_gen_adapter(adapter_params, emb)[None]
