"""Generic 2D diffusion UNet: SDXL UNet + BrushNet in one functional module.

Covers the reference stack's two stylization models:

  * SDXL ``UNet2DConditionModel`` — including the BrushNet fork's
    per-sub-block residual *consumption* (``down_block_add_samples`` /
    ``mid_block_add_sample`` / ``up_block_add_samples``, reference
    ``BrushNet/src/diffusers/models/unets/unet_2d_condition.py:1199-1273``)
    and the mask-gated LoRA/DoRA adapters threaded into attention
    projections (fork ``attention_processor.py:3251-3334``; masked-forward
    ``dora_training/train.py:63-139``).

  * ``BrushNetModel`` — dual-branch inpainting clone without cross
    attention, 9-channel ``conv_in_condition``, one zero-conv'd feature per
    sub-block (reference ``models/brushnet.py:61-925``).

Layout is NHWC (TPU-native convs); converters transpose from the torch
checkpoints once at load.  Attention rides the shared ops.attention
dispatch (Pallas flash kernel on TPU).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.attention import attention
from ..adapters import apply_adapter


# --------------------------------------------------------------------- config
@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    down_block_types: Tuple[str, ...] = (
        "DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D",
    )
    mid_block_type: Optional[str] = "UNetMidBlock2DCrossAttn"
    layers_per_block: int = 2
    transformer_layers_per_block: Tuple[int, ...] = (1, 2, 10)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20)
    attention_head_dim: Optional[int] = None  # for plain UNetMidBlock2D attn
    cross_attention_dim: int = 2048
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    addition_embed_type: Optional[str] = "text_time"  # None | "text_time"
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    # BrushNet
    conditioning_channels: int = 0  # >0 => conv_in_condition consumes concat

    @staticmethod
    def sdxl_base() -> "UNet2DConfig":
        return UNet2DConfig()

    @staticmethod
    def sd15_base() -> "UNet2DConfig":
        """SD1.5 UNet2DConditionModel (pipeline_brushnet.py variant)."""
        return UNet2DConfig(
            block_out_channels=(320, 640, 1280, 1280),
            down_block_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                              "CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D",
                            "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
            transformer_layers_per_block=(1, 1, 1, 1),
            num_attention_heads=(8, 8, 8, 8),
            cross_attention_dim=768,
            addition_embed_type=None,
        )

    @staticmethod
    def brushnet_sd15() -> "UNet2DConfig":
        return UNet2DConfig(
            block_out_channels=(320, 640, 1280, 1280),
            down_block_types=("DownBlock2D",) * 4,
            up_block_types=("UpBlock2D",) * 4,
            mid_block_type="UNetMidBlock2D",
            transformer_layers_per_block=(0, 0, 0, 0),
            num_attention_heads=(8, 8, 8, 8),
            attention_head_dim=8,
            cross_attention_dim=768,
            addition_embed_type=None,
            conditioning_channels=5,
        )

    @staticmethod
    def brushnet_sdxl() -> "UNet2DConfig":
        """BrushNet-SDXL: plain blocks, no cross attention
        (reference brushnet.py:144-156 defaults + SDXL channel plan)."""
        return UNet2DConfig(
            down_block_types=("DownBlock2D", "DownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "UpBlock2D", "UpBlock2D"),
            mid_block_type="UNetMidBlock2D",
            transformer_layers_per_block=(0, 0, 0),
            attention_head_dim=64,
            conditioning_channels=5,
        )


# ----------------------------------------------------------------- primitives
def _conv2d(p, x, strides=(1, 1), padding=((1, 1), (1, 1))):
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + p["b"].astype(x.dtype)


def _dense(p, x, mask=None):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    if "lora" in p:
        y = apply_adapter(y, x, p, mask=mask)
    return y


def group_norm(x, p, num_groups=32, eps=1e-5):
    """NHWC GroupNorm in fp32."""
    orig_shape = x.shape
    c = orig_shape[-1]
    xf = x.astype(jnp.float32).reshape(orig_shape[:-1] + (num_groups, c // num_groups))
    red = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
    mean = xf.mean(axis=red, keepdims=True)
    var = xf.var(axis=red, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y.reshape(orig_shape)
    y = y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def timestep_embedding(timesteps, dim, flip_sin_to_cos=True, freq_shift=0,
                       max_period=10000.0):
    """diffusers get_timestep_embedding (fp32)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


# -------------------------------------------------------------------- resnet
def resnet_block(p, x, emb, cfg: UNet2DConfig):
    h = group_norm(x, p["norm1"], cfg.norm_num_groups, cfg.norm_eps)
    h = _conv2d(p["conv1"], _silu(h))
    t = _dense(p["time_emb_proj"], _silu(emb))
    h = h + t[:, None, None, :]
    h = group_norm(h, p["norm2"], cfg.norm_num_groups, cfg.norm_eps)
    h = _conv2d(p["conv2"], _silu(h))
    if "conv_shortcut" in p:
        x = _conv2d(p["conv_shortcut"], x, padding=((0, 0), (0, 0)))
    return x + h


# ----------------------------------------------------------------- attention
def _mha(q_p, k_p, v_p, o_p, x, ctx, heads, mask_q=None, mask_kv=None):
    b, n, c = x.shape
    hd = None
    q = _dense(q_p, x, mask=mask_q)
    k = _dense(k_p, ctx, mask=mask_kv)
    v = _dense(v_p, ctx, mask=mask_kv)
    hd = q.shape[-1] // heads
    q = q.reshape(b, n, heads, hd)
    k = k.reshape(b, ctx.shape[1], heads, hd)
    v = v.reshape(b, ctx.shape[1], heads, hd)
    o = attention(q, k, v).reshape(b, n, heads * hd)
    return _dense(o_p, o, mask=mask_q)


def transformer_block(p, x, ctx, heads, mask=None):
    """BasicTransformerBlock: LN→self-attn, LN→cross-attn, LN→GEGLU FF.

    mask: (B, N, 1) token gate for mask-gated adapters. Per the fork's
    shape-check semantics (dora train.py:94,111), cross-attn k/v updates
    are NOT masked (text tokens), q/out are.
    """
    h = _ln(x, p["norm1"])
    a1 = p["attn1"]
    x = x + _mha(a1["to_q"], a1["to_k"], a1["to_v"], a1["to_out"], h, h, heads,
                 mask_q=mask, mask_kv=mask)
    h = _ln(x, p["norm2"])
    a2 = p["attn2"]
    x = x + _mha(a2["to_q"], a2["to_k"], a2["to_v"], a2["to_out"], h, ctx,
                 heads, mask_q=mask, mask_kv=None)
    h = _ln(x, p["norm3"])
    ff = _dense(p["ff_proj"], h)
    a, gate = jnp.split(ff, 2, axis=-1)
    gg = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype)
    x = x + _dense(p["ff_out"], gg)
    return x


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def transformer2d(p, x, ctx, heads, cfg: UNet2DConfig, mask_latents=None):
    """Transformer2DModel with use_linear_projection=True (SDXL)."""
    b, h, w, c = x.shape
    residual = x
    y = group_norm(x, p["norm"], cfg.norm_num_groups, 1e-6)
    y = y.reshape(b, h * w, c)
    y = _dense(p["proj_in"], y)
    mask = None
    if mask_latents is not None:
        mask = _resize_mask(mask_latents, h, w)  # (B, h*w, 1)
    for blk in p["blocks"]:
        y = transformer_block(blk, y, ctx, heads, mask=mask)
    y = _dense(p["proj_out"], y)
    return y.reshape(b, h, w, c) + residual


def _resize_mask(mask, h, w):
    """(B, 1, Hm, Wm) or (B, Hm, Wm, 1) -> (B, h·w, 1) nearest —
    fork attention_processor.py:3268-3272."""
    if mask.ndim == 4 and mask.shape[1] == 1:
        m = mask[:, 0]
    elif mask.ndim == 4:
        m = mask[..., 0]
    else:
        m = mask
    b, hm, wm = m.shape
    ih = (jnp.arange(h) * hm // h).astype(jnp.int32)
    iw = (jnp.arange(w) * wm // w).astype(jnp.int32)
    m = m[:, ih][:, :, iw]
    return m.reshape(b, h * w, 1)


def attention_block_plain(p, x, head_dim, cfg: UNet2DConfig):
    """Self Attention block in plain UNetMidBlock2D (group-norm qkv attn,
    residual)."""
    b, h, w, c = x.shape
    y = group_norm(x, p["group_norm"], cfg.norm_num_groups, cfg.norm_eps)
    y = y.reshape(b, h * w, c)
    heads = c // head_dim
    o = _mha(p["to_q"], p["to_k"], p["to_v"], p["to_out"], y, y, heads)
    return x + o.reshape(b, h, w, c)


# ------------------------------------------------------------------- blocks
class _Popper:
    """Consume add-samples in reference pop(0) order; None = disabled."""

    def __init__(self, items: Optional[List]):
        self.items = list(items) if items is not None else None

    def __call__(self, x):
        if self.items is None:
            return x
        return x + self.items.pop(0).astype(x.dtype)


def _downsample(p, x):
    return _conv2d(p["conv"], x, strides=(2, 2), padding=((1, 1), (1, 1)))


def _upsample(p, x):
    b, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return _conv2d(p["conv"], x)


# ------------------------------------------------------------------ the UNet
def unet2d_forward(
    params,
    cfg: UNet2DConfig,
    sample,  # (B, C, H, W) — torch layout at the API boundary
    timestep,  # (B,) or scalar
    encoder_hidden_states=None,  # (B, L, cross_dim)
    *,
    text_embeds=None,  # (B, 1280) pooled — text_time
    time_ids=None,  # (B, 6)
    down_block_add_samples=None,  # list of NCHW residuals (BrushNet)
    mid_block_add_sample=None,
    up_block_add_samples=None,
    mask_latents=None,  # (B, 1, Hl, Wl) mask-gated adapters
    return_res_samples=False,  # emit per-sub-block features (BrushNet body)
    brushnet_cond=None,  # (B, cond_ch, H, W) for BrushNet conv_in_condition
):
    x = jnp.transpose(sample, (0, 2, 3, 1))  # NHWC
    if timestep.ndim == 0:
        timestep = jnp.broadcast_to(timestep, (x.shape[0],))

    # 1. time + added embeddings
    t_emb = timestep_embedding(
        timestep, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
    ).astype(x.dtype)
    emb = _dense(params["time_embedding"]["linear_2"],
                 _silu(_dense(params["time_embedding"]["linear_1"], t_emb)))
    if cfg.addition_embed_type == "text_time":
        te = timestep_embedding(
            time_ids.reshape(-1), cfg.addition_time_embed_dim,
            cfg.flip_sin_to_cos, cfg.freq_shift,
        ).reshape(text_embeds.shape[0], -1).astype(x.dtype)
        add = jnp.concatenate([text_embeds.astype(x.dtype), te], axis=-1)
        aug = _dense(params["add_embedding"]["linear_2"],
                     _silu(_dense(params["add_embedding"]["linear_1"], add)))
        emb = emb + aug

    # 2. conv in
    if brushnet_cond is not None:
        cond = jnp.transpose(brushnet_cond, (0, 2, 3, 1))
        x = _conv2d(params["conv_in_condition"], jnp.concatenate([x, cond], axis=-1))
    else:
        x = _conv2d(params["conv_in"], x)

    add_down = _Popper(down_block_add_samples)
    add_up = _Popper(up_block_add_samples)
    # quirk preserved from the fork (unet_2d_condition.py:1196-1199): the
    # conv_in skip is stored BEFORE the BrushNet residual is added; inside
    # blocks, adds happen before skip collection (unet_2d_blocks.py:1396-1408)
    res_stack = [x]
    x = add_down(x)

    emitted = [x] if return_res_samples else None

    # 3. down
    for i, block_type in enumerate(cfg.down_block_types):
        bp = params["down_blocks"][i]
        heads = cfg.num_attention_heads[i]
        n_res = len(bp["resnets"])
        for j in range(n_res):
            x = resnet_block(bp["resnets"][j], x, emb, cfg)
            if "attentions" in bp:
                x = transformer2d(bp["attentions"][j], x, encoder_hidden_states,
                                  heads, cfg, mask_latents)
            x = add_down(x)
            res_stack.append(x)
        if "downsamplers" in bp:
            x = _downsample(bp["downsamplers"], x)
            x = add_down(x)
            res_stack.append(x)
    if return_res_samples:
        emitted = list(res_stack)

    # 4. mid
    if cfg.mid_block_type is not None:
        mp = params["mid_block"]
        x = resnet_block(mp["resnets"][0], x, emb, cfg)
        for j, ap in enumerate(mp.get("attentions", [])):
            if cfg.mid_block_type == "UNetMidBlock2DCrossAttn":
                x = transformer2d(ap, x, encoder_hidden_states,
                                  cfg.num_attention_heads[-1], cfg, mask_latents)
            else:
                x = attention_block_plain(ap, x, cfg.attention_head_dim, cfg)
            x = resnet_block(mp["resnets"][j + 1], x, emb, cfg)
    if mid_block_add_sample is not None:
        # add samples are NHWC (brushnet_forward emits NHWC)
        x = x + mid_block_add_sample.astype(x.dtype)
    mid_emitted = x if return_res_samples else None

    # 5. up
    up_emitted = [] if return_res_samples else None
    for i, block_type in enumerate(cfg.up_block_types):
        bp = params["up_blocks"][i]
        heads = cfg.num_attention_heads[len(cfg.block_out_channels) - 1 - i]
        n_res = len(bp["resnets"])
        skips = res_stack[-n_res:]
        del res_stack[-n_res:]
        for j in range(n_res):
            skip = skips[-(j + 1)]
            x = jnp.concatenate([x, skip], axis=-1)
            x = resnet_block(bp["resnets"][j], x, emb, cfg)
            if "attentions" in bp:
                x = transformer2d(bp["attentions"][j], x, encoder_hidden_states,
                                  heads, cfg, mask_latents)
            x = add_up(x)
            if return_res_samples:
                up_emitted.append(x)
        if "upsamplers" in bp:
            x = _upsample(bp["upsamplers"], x)
            x = add_up(x)
            if return_res_samples:
                up_emitted.append(x)

    if return_res_samples:
        return emitted, mid_emitted, up_emitted

    # 6. out
    x = group_norm(x, params["conv_norm_out"], cfg.norm_num_groups, cfg.norm_eps)
    x = _conv2d(params["conv_out"], _silu(x))
    return jnp.transpose(x, (0, 3, 1, 2))


def brushnet_forward(
    params,
    cfg: UNet2DConfig,
    sample,  # (B, 4, H, W) noisy latents
    timestep,
    encoder_hidden_states,
    brushnet_cond,  # (B, 5, H, W): masked-image latents ⊕ downscaled mask
    *,
    text_embeds=None,
    time_ids=None,
    conditioning_scale: float = 1.0,
    guess_mode: bool = False,
):
    """BrushNetModel.forward — reference brushnet.py:678-925.

    Returns (down_samples, mid_sample, up_samples): zero-conv'd per-sub-
    block features scaled by conditioning_scale (logspace in guess mode),
    all NHWC (ready for injection into unet2d_forward).
    """
    down, mid, up = unet2d_forward(
        params, cfg, sample, timestep, encoder_hidden_states,
        text_embeds=text_embeds, time_ids=time_ids,
        return_res_samples=True, brushnet_cond=brushnet_cond,
    )
    down = [_conv2d_zero(z, f) for z, f in zip(params["brushnet_down_blocks"], down)]
    mid = _conv2d_zero(params["brushnet_mid_block"], mid)
    up = [_conv2d_zero(z, f) for z, f in zip(params["brushnet_up_blocks"], up)]

    if guess_mode:
        n = len(down) + 1 + len(up)
        scales = jnp.logspace(-1, 0, n) * conditioning_scale
        down = [d * scales[i] for i, d in enumerate(down)]
        mid = mid * scales[len(down)]
        up = [u * scales[len(down) + 1 + i] for i, u in enumerate(up)]
    else:
        down = [d * conditioning_scale for d in down]
        mid = mid * conditioning_scale
        up = [u * conditioning_scale for u in up]
    return down, mid, up


def _conv2d_zero(p, x):
    return _conv2d(p, x, padding=((0, 0), (0, 0)))


# ------------------------------------------------------------------ converter
def _cw(sd, name):  # conv OIHW -> HWIO
    return {"w": np.asarray(sd[name + ".weight"]).transpose(2, 3, 1, 0),
            "b": np.asarray(sd[name + ".bias"])}


def _lw(sd, name):  # linear -> (in, out); 1x1 convs (SD1.5 proj_in/out) squeeze
    w = np.asarray(sd[name + ".weight"])
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    p = {"w": w.T}
    if name + ".bias" in sd:
        p["b"] = np.asarray(sd[name + ".bias"])
    return p


def _nw(sd, name):
    return {"w": np.asarray(sd[name + ".weight"]), "b": np.asarray(sd[name + ".bias"])}


def convert_unet2d_state_dict(sd: Dict[str, np.ndarray], cfg: UNet2DConfig,
                              dtype=None):
    """diffusers UNet2DConditionModel / BrushNetModel state dict -> pytree."""

    def resnet(pre):
        p = {
            "norm1": _nw(sd, pre + ".norm1"),
            "conv1": _cw(sd, pre + ".conv1"),
            "time_emb_proj": _lw(sd, pre + ".time_emb_proj"),
            "norm2": _nw(sd, pre + ".norm2"),
            "conv2": _cw(sd, pre + ".conv2"),
        }
        if pre + ".conv_shortcut.weight" in sd:
            p["conv_shortcut"] = _cw(sd, pre + ".conv_shortcut")
        return p

    def tblock(pre):
        return {
            "norm1": _nw(sd, pre + ".norm1"),
            "attn1": {
                "to_q": _lw(sd, pre + ".attn1.to_q"),
                "to_k": _lw(sd, pre + ".attn1.to_k"),
                "to_v": _lw(sd, pre + ".attn1.to_v"),
                "to_out": _lw(sd, pre + ".attn1.to_out.0"),
            },
            "norm2": _nw(sd, pre + ".norm2"),
            "attn2": {
                "to_q": _lw(sd, pre + ".attn2.to_q"),
                "to_k": _lw(sd, pre + ".attn2.to_k"),
                "to_v": _lw(sd, pre + ".attn2.to_v"),
                "to_out": _lw(sd, pre + ".attn2.to_out.0"),
            },
            "norm3": _nw(sd, pre + ".norm3"),
            "ff_proj": _lw(sd, pre + ".ff.net.0.proj"),
            "ff_out": _lw(sd, pre + ".ff.net.2"),
        }

    def transformer(pre):
        blocks = []
        i = 0
        while f"{pre}.transformer_blocks.{i}.norm1.weight" in sd:
            blocks.append(tblock(f"{pre}.transformer_blocks.{i}"))
            i += 1
        return {
            "norm": _nw(sd, pre + ".norm"),
            "proj_in": _lw(sd, pre + ".proj_in"),
            "blocks": blocks,
            "proj_out": _lw(sd, pre + ".proj_out"),
        }

    def plain_attn(pre):
        return {
            "group_norm": _nw(sd, pre + ".group_norm"),
            "to_q": _lw(sd, pre + ".to_q"),
            "to_k": _lw(sd, pre + ".to_k"),
            "to_v": _lw(sd, pre + ".to_v"),
            "to_out": _lw(sd, pre + ".to_out.0"),
        }

    params: Dict[str, Any] = {
        "time_embedding": {
            "linear_1": _lw(sd, "time_embedding.linear_1"),
            "linear_2": _lw(sd, "time_embedding.linear_2"),
        },
    }
    if "conv_in.weight" in sd:
        params["conv_in"] = _cw(sd, "conv_in")
    if "conv_in_condition.weight" in sd:
        params["conv_in_condition"] = _cw(sd, "conv_in_condition")
    if cfg.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "linear_1": _lw(sd, "add_embedding.linear_1"),
            "linear_2": _lw(sd, "add_embedding.linear_2"),
        }

    down = []
    for i, bt in enumerate(cfg.down_block_types):
        pre = f"down_blocks.{i}"
        bp: Dict[str, Any] = {
            "resnets": [resnet(f"{pre}.resnets.{j}") for j in range(cfg.layers_per_block)]
        }
        if bt.startswith("CrossAttn"):
            bp["attentions"] = [
                transformer(f"{pre}.attentions.{j}") for j in range(cfg.layers_per_block)
            ]
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            bp["downsamplers"] = {"conv": _cw(sd, f"{pre}.downsamplers.0.conv")}
        down.append(bp)
    params["down_blocks"] = down

    if cfg.mid_block_type is not None:
        mp: Dict[str, Any] = {"resnets": []}
        j = 0
        while f"mid_block.resnets.{j}.norm1.weight" in sd:
            mp["resnets"].append(resnet(f"mid_block.resnets.{j}"))
            j += 1
        atts = []
        j = 0
        if cfg.mid_block_type == "UNetMidBlock2DCrossAttn":
            while f"mid_block.attentions.{j}.norm.weight" in sd:
                atts.append(transformer(f"mid_block.attentions.{j}"))
                j += 1
        else:
            while f"mid_block.attentions.{j}.group_norm.weight" in sd:
                atts.append(plain_attn(f"mid_block.attentions.{j}"))
                j += 1
        mp["attentions"] = atts
        params["mid_block"] = mp

    ups = []
    for i, bt in enumerate(cfg.up_block_types):
        pre = f"up_blocks.{i}"
        bp = {
            "resnets": [
                resnet(f"{pre}.resnets.{j}") for j in range(cfg.layers_per_block + 1)
            ]
        }
        if bt.startswith("CrossAttn"):
            bp["attentions"] = [
                transformer(f"{pre}.attentions.{j}")
                for j in range(cfg.layers_per_block + 1)
            ]
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            bp["upsamplers"] = {"conv": _cw(sd, f"{pre}.upsamplers.0.conv")}
        ups.append(bp)
    params["up_blocks"] = ups

    if "conv_norm_out.weight" in sd:
        params["conv_norm_out"] = _nw(sd, "conv_norm_out")
        params["conv_out"] = _cw(sd, "conv_out")

    # BrushNet zero convs
    if "brushnet_mid_block.weight" in sd:
        zs = []
        i = 0
        while f"brushnet_down_blocks.{i}.weight" in sd:
            zs.append(_cw(sd, f"brushnet_down_blocks.{i}"))
            i += 1
        params["brushnet_down_blocks"] = zs
        params["brushnet_mid_block"] = _cw(sd, "brushnet_mid_block")
        zs = []
        i = 0
        while f"brushnet_up_blocks.{i}.weight" in sd:
            zs.append(_cw(sd, f"brushnet_up_blocks.{i}"))
            i += 1
        params["brushnet_up_blocks"] = zs

    if dtype is not None:
        params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
    else:
        params = jax.tree.map(jnp.asarray, params)
    return params


def init_unet2d_params(cfg: UNet2DConfig, dtype=jnp.float32, brushnet=False):
    """Structure-true zero-init params for ``unet2d_forward`` /
    ``brushnet_forward`` (norm scales = 1).

    The reference relies on diffusers' ``from_config`` for weightless
    instantiation (e.g. its benchmarks suite,
    stylization/BrushNet/benchmarks/base_classes.py); this is the
    functional equivalent used by ``benchmarks/`` and ``tools/`` for
    timing runs, where wall-clock is weight-independent.
    """
    def dense(i, o):
        return {"w": jnp.zeros((i, o), dtype), "b": jnp.zeros((o,), dtype)}

    def conv(kh, kw, i, o):
        return {"w": jnp.zeros((kh, kw, i, o), dtype),
                "b": jnp.zeros((o,), dtype)}

    def norm(c):
        return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    def resnet(i, o, temb):
        p = {"norm1": norm(i), "conv1": conv(3, 3, i, o),
             "time_emb_proj": dense(temb, o),
             "norm2": norm(o), "conv2": conv(3, 3, o, o)}
        if i != o:
            p["conv_shortcut"] = conv(1, 1, i, o)
        return p

    def tblock(c, ctx):
        def att(q_in, kv_in):
            return {"to_q": dense(q_in, c), "to_k": dense(kv_in, c),
                    "to_v": dense(kv_in, c), "to_out": dense(c, c)}

        return {"norm1": norm(c), "attn1": att(c, c), "norm2": norm(c),
                "attn2": att(c, ctx), "norm3": norm(c),
                "ff_proj": dense(c, 8 * c), "ff_out": dense(4 * c, c)}

    def transformer(c, depth, ctx):
        return {"norm": norm(c), "proj_in": dense(c, c),
                "blocks": [tblock(c, ctx) for _ in range(depth)],
                "proj_out": dense(c, c)}

    bo = cfg.block_out_channels
    temb = bo[0] * 4
    params = {"time_embedding": {"linear_1": dense(bo[0], temb),
                                 "linear_2": dense(temb, temb)}}
    if cfg.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "linear_1": dense(cfg.projection_class_embeddings_input_dim, temb),
            "linear_2": dense(temb, temb)}
    cin = cfg.in_channels + (cfg.conditioning_channels if brushnet else 0)
    params["conv_in_condition" if brushnet else "conv_in"] = conv(3, 3, cin, bo[0])

    down, ch = [], bo[0]
    for i, bt in enumerate(cfg.down_block_types):
        out = bo[i]
        st = {"resnets": [resnet(ch if j == 0 else out, out, temb)
                          for j in range(cfg.layers_per_block)]}
        if bt.startswith("CrossAttn"):
            st["attentions"] = [
                transformer(out, cfg.transformer_layers_per_block[i],
                            cfg.cross_attention_dim)
                for _ in range(cfg.layers_per_block)]
        if i != len(cfg.down_block_types) - 1:
            st["downsamplers"] = {"conv": conv(3, 3, out, out)}
        down.append(st)
        ch = out
    params["down_blocks"] = down

    mid_c = bo[-1]
    if cfg.mid_block_type == "UNetMidBlock2DCrossAttn":
        params["mid_block"] = {
            "resnets": [resnet(mid_c, mid_c, temb), resnet(mid_c, mid_c, temb)],
            "attentions": [transformer(
                mid_c, cfg.transformer_layers_per_block[-1],
                cfg.cross_attention_dim)]}
    else:
        params["mid_block"] = {
            "resnets": [resnet(mid_c, mid_c, temb), resnet(mid_c, mid_c, temb)],
            "attentions": [{"group_norm": norm(mid_c),
                            "to_q": dense(mid_c, mid_c),
                            "to_k": dense(mid_c, mid_c),
                            "to_v": dense(mid_c, mid_c),
                            "to_out": dense(mid_c, mid_c)}]}

    ups, rev = [], list(reversed(bo))
    prev = rev[0]
    for i, bt in enumerate(cfg.up_block_types):
        out = rev[i]
        inp = rev[min(i + 1, len(rev) - 1)]
        st = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            skip = inp if j == cfg.layers_per_block else out
            rin = prev if j == 0 else out
            st["resnets"].append(resnet(rin + skip, out, temb))
        if bt.startswith("CrossAttn"):
            depth = cfg.transformer_layers_per_block[len(bo) - 1 - i]
            st["attentions"] = [transformer(out, depth, cfg.cross_attention_dim)
                                for _ in range(cfg.layers_per_block + 1)]
        if i != len(cfg.up_block_types) - 1:
            st["upsamplers"] = {"conv": conv(3, 3, out, out)}
        ups.append(st)
        prev = out
    params["up_blocks"] = ups

    if not brushnet:
        params["conv_norm_out"] = norm(bo[0])
        params["conv_out"] = conv(3, 3, bo[0], cfg.out_channels)
    else:
        chs_down = [bo[0]]
        for i in range(len(cfg.down_block_types)):
            chs_down.extend([bo[i]] * cfg.layers_per_block)
            if i != len(cfg.down_block_types) - 1:
                chs_down.append(bo[i])
        params["brushnet_down_blocks"] = [conv(1, 1, c, c) for c in chs_down]
        params["brushnet_mid_block"] = conv(1, 1, mid_c, mid_c)
        chs_up = []
        for i in range(len(cfg.up_block_types)):
            chs_up.extend([rev[i]] * (cfg.layers_per_block + 1))
            if i != len(cfg.up_block_types) - 1:
                chs_up.append(rev[i])
        params["brushnet_up_blocks"] = [conv(1, 1, c, c) for c in chs_up]
    return params
