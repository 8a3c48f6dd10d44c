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


GENERATION_MESSAGES = [
    {"role": "user",
     "content": "Generate an image according to the following description: {}"},
    {"role": "assistant",
     "content": "Here is an image based on the description: <image>"},
]
TARGET_GRID = (1, 18, 18)  # the blank 252x252 target slot (252/14 = 18)


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
