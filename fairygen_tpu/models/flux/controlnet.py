"""FLUX ControlNet — functional JAX port.

Mirrors the reference ``FluxControlNet``
(``animation/diffsynth/models/flux_controlnet.py:62-168``): a truncated
FluxDiT (N joint + M single blocks, same block math — reused from
``models/flux/dit.py``) with a second ``controlnet_x_embedder`` on the
patchified conditioning image, a zero-init linear tap after every block,
and the ``align_res_stack_to_original_blocks`` broadcast that maps the
truncated stacks onto the main DiT's 19/38 blocks.  Union-mode variants
(InstantX canny/tile/depth/…) prepend a learned mode embedding to the
text stream (and one extra zero text id).

The multi-controlnet scale/sum/progress-gating driver
(``pipelines/flux_image.py:22-53`` MultiControlNet) lives in
``pipelines/flux_image.py`` here; this module is the per-model forward.

TPU-native: one ``lax.scan`` per block family with the taps emitted as
scan outputs; the alignment is a static host-side index gather.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dit import (
    FluxDiTConfig,
    _LOG2E,
    _dense,
    _init_dense,
    _mlp_embed,
    _sd_double_block,
    _sd_lin,
    _sd_mlp,
    _sd_single_block,
    _sd_stack,
    _timestep_sinusoid,
    flux_double_block,
    flux_single_block,
    patchify,
    prepare_image_ids,
    rope_table,
)

# InstantX union-mode processor table (reference flux_controlnet.py:357:
# the "78d18b91..." hash entry's mode_dict)
UNION_MODE_DICT = (("canny", 0), ("tile", 1), ("depth", 2), ("blur", 3),
                   ("pose", 4), ("gray", 5), ("lq", 6))


@dataclasses.dataclass(frozen=True)
class FluxControlNetConfig:
    base: FluxDiTConfig = dataclasses.field(
        default_factory=FluxDiTConfig.flux1_dev)
    num_joint_blocks: int = 5
    num_single_blocks: int = 10
    guidance_embed: bool = True  # disable_guidance_embedder inverse
    mode_dict: Tuple[Tuple[str, int], ...] = ()  # union-mode models
    additional_input_dim: int = 0  # inpaint models: +4 packed mask dims

    @staticmethod
    def tiny(**over) -> "FluxControlNetConfig":
        base = dict(base=FluxDiTConfig.tiny(), num_joint_blocks=2,
                    num_single_blocks=2)
        base.update(over)
        return FluxControlNetConfig(**base)


def flux_controlnet_forward(
    params,
    cfg: FluxControlNetConfig,
    latents,  # (B, 16, H, W) noisy latents
    controlnet_cond,  # (B, 16 + extra/4, H, W) conditioning latents
    timestep,  # (B,)
    prompt_emb,  # (B, Lt, context_dim)
    pooled_prompt_emb,  # (B, pooled_dim)
    guidance=None,
    *,
    processor_id: Optional[str] = None,  # union-mode selector (static)
    image_ids: Optional[np.ndarray] = None,
    prescaled: bool = False,
):
    """Returns the RAW tap stacks ``(res, single_res)`` of shapes
    ``(num_joint_blocks, B, L_img, dim)`` / ``(num_single_blocks, …)``;
    align with :func:`align_controlnet_res` before feeding the main DiT."""
    bcfg = cfg.base
    b, c, h, w = latents.shape
    dtype = latents.dtype

    cond = _mlp_embed(params["time_embedder"],
                      _timestep_sinusoid(timestep, bcfg.time_freq_dim), dtype)
    cond = cond + _mlp_embed(params["pooled_text_embedder"],
                             pooled_prompt_emb, dtype)
    if cfg.guidance_embed:
        assert guidance is not None
        cond = cond + _mlp_embed(
            params["guidance_embedder"],
            _timestep_sinusoid(guidance * 1000.0, bcfg.time_freq_dim), dtype)

    ctx = _dense(params["context_embedder"], prompt_emb.astype(dtype))
    n_mode = 0
    if cfg.mode_dict:
        idx = dict(cfg.mode_dict)[processor_id]
        mode = params["mode_embedder"]["w"][idx].astype(dtype)
        ctx = jnp.concatenate(
            [jnp.broadcast_to(mode[None, None, :], (b, 1, bcfg.dim)), ctx],
            axis=1)
        n_mode = 1  # one extra zero text id (flux_controlnet.py:137)

    x = _dense(params["x_embedder"], patchify(latents))
    x = x + _dense(params["controlnet_x_embedder"], patchify(controlnet_cond))

    if image_ids is None:
        image_ids = prepare_image_ids(h, w)
    ids = np.concatenate(
        [np.zeros((prompt_emb.shape[1] + n_mode, 3), np.float64), image_ids],
        axis=0)
    cos, sin = rope_table(ids, bcfg.axes_dim, bcfg.theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    lt = ctx.shape[1]

    def jnt(carry, p):
        xa, xb = carry
        xa, xb = flux_double_block(p["block"], xa, xb, cond, cos, sin, bcfg,
                                   prescaled)
        return (xa, xb), _dense(p["tap"], xa)

    (xa, c2), res = jax.lax.scan(
        jnt, (x, ctx),
        {"block": params["blocks"], "tap": params["controlnet_blocks"]})

    hh = jnp.concatenate([c2, xa], axis=1)

    def sgl(carry, p):
        hh = flux_single_block(p["block"], carry, cond, cos, sin, bcfg,
                               prescaled)
        return hh, _dense(p["tap"], hh[:, lt:])

    if cfg.num_single_blocks:
        hh, single_res = jax.lax.scan(
            sgl, hh, {"block": params["single_blocks"],
                      "tap": params["controlnet_single_blocks"]})
    else:
        single_res = jnp.zeros((0,) + x.shape, dtype)
    return res, single_res


def align_controlnet_res(res, num_blocks: int):
    """``align_res_stack_to_original_blocks`` (flux_controlnet.py:108-114):
    broadcast an n-entry tap stack onto the main DiT's ``num_blocks`` via
    ``aligned[i] = res[i // ceil(num_blocks / n)]``; empty -> None (the
    main DiT then skips the adds entirely instead of adding zeros)."""
    n = res.shape[0]
    if n == 0:
        return None
    interval = (num_blocks + n - 1) // n
    idx = np.arange(num_blocks) // interval
    return jnp.take(res, jnp.asarray(idx), axis=0)


# ------------------------------------------------------------------ params
def init_flux_controlnet_params(key, cfg: FluxControlNetConfig,
                                dtype=jnp.float32):
    from .dit import init_flux_dit_params

    bcfg = dataclasses.replace(
        cfg.base, num_double_blocks=cfg.num_joint_blocks,
        num_single_blocks=cfg.num_single_blocks,
        guidance_embed=cfg.guidance_embed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = init_flux_dit_params(k1, bcfg, dtype)
    d = bcfg.dim
    params = {k: p[k] for k in
              ("time_embedder", "pooled_text_embedder", "context_embedder",
               "x_embedder")}
    if cfg.guidance_embed:
        params["guidance_embedder"] = p["guidance_embedder"]
    params["blocks"] = p["double_blocks"]
    params["single_blocks"] = p["single_blocks"]
    params["controlnet_x_embedder"] = _init_dense(
        k2, cfg.base.in_dim + cfg.additional_input_dim, d, dtype)

    def taps(k, n):
        base = [_init_dense(jax.random.fold_in(k, i), d, d, dtype)
                for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *base)

    params["controlnet_blocks"] = taps(k3, cfg.num_joint_blocks)
    if cfg.num_single_blocks:
        params["controlnet_single_blocks"] = taps(k4, cfg.num_single_blocks)
    if cfg.mode_dict:
        n_mode = max(i for _, i in cfg.mode_dict) + 1
        params["mode_embedder"] = {
            "w": jax.random.normal(jax.random.fold_in(key, 99),
                                   (n_mode, d), dtype)}
    return params


# ------------------------------------------------------------------ convert
def convert_flux_controlnet_state_dict(sd: Dict[str, Any],
                                       cfg: FluxControlNetConfig,
                                       dtype=None, prescale: bool = False):
    """Consumes the reference FluxControlNet module naming (what its
    ``state_dict()`` emits after ``FluxControlNetStateDictConverter``)."""
    s = (cfg.base.head_dim ** -0.5) * _LOG2E if prescale else 1.0
    params = {
        "time_embedder": _sd_mlp(sd, "time_embedder.timestep_embedder"),
        "pooled_text_embedder": _sd_mlp(sd, "pooled_text_embedder"),
        "context_embedder": _sd_lin(sd, "context_embedder"),
        "x_embedder": _sd_lin(sd, "x_embedder"),
        "controlnet_x_embedder": _sd_lin(sd, "controlnet_x_embedder"),
        "blocks": _sd_stack(
            [_sd_double_block(sd, f"blocks.{i}", s)
             for i in range(cfg.num_joint_blocks)]),
        "controlnet_blocks": _sd_stack(
            [_sd_lin(sd, f"controlnet_blocks.{i}")
             for i in range(cfg.num_joint_blocks)]),
    }
    if cfg.num_single_blocks:
        params["single_blocks"] = _sd_stack(
            [_sd_single_block(sd, f"single_blocks.{i}", s)
             for i in range(cfg.num_single_blocks)])
        params["controlnet_single_blocks"] = _sd_stack(
            [_sd_lin(sd, f"controlnet_single_blocks.{i}")
             for i in range(cfg.num_single_blocks)])
    if cfg.guidance_embed:
        params["guidance_embedder"] = _sd_mlp(
            sd, "guidance_embedder.timestep_embedder")
    if cfg.mode_dict:
        import numpy as _np

        params["mode_embedder"] = {
            "w": _np.asarray(sd["controlnet_mode_embedder.weight"])}
    to = (lambda a: jnp.asarray(a, dtype)) if dtype is not None else jnp.asarray
    return jax.tree.map(to, params)


def detect_flux_controlnet_config(
        sd: Dict[str, Any],
        base: Optional[FluxDiTConfig] = None) -> FluxControlNetConfig:
    """Shape-probe the architecture knobs the reference keys off md5 hashes
    (flux_controlnet.py:356-369): block counts, guidance, union mode, and
    the inpaint models' extra conditioning dims."""
    base = base or FluxDiTConfig.flux1_dev()
    n_joint = 1 + max((int(k.split(".")[1]) for k in sd
                       if k.startswith("blocks.")), default=-1)
    n_single = 1 + max((int(k.split(".")[1]) for k in sd
                        if k.startswith("single_blocks.")), default=-1)
    extra = sd["controlnet_x_embedder.weight"].shape[1] - base.in_dim
    return FluxControlNetConfig(
        base=base, num_joint_blocks=n_joint, num_single_blocks=n_single,
        guidance_embed="guidance_embedder.timestep_embedder.0.weight" in sd,
        mode_dict=(UNION_MODE_DICT
                   if "controlnet_mode_embedder.weight" in sd else ()),
        additional_input_dim=extra,
    )


# Diffusers-layout -> reference module naming (port of the rename tables in
# FluxControlNetStateDictConverter.from_diffusers,
# flux_controlnet.py:284-355 — pure key-mapping data, shared with the DiT's
# BFL tables where the names coincide).
_DIFFUSERS_TOP = {
    "context_embedder": "context_embedder",
    "x_embedder": "x_embedder",
    "controlnet_x_embedder": "controlnet_x_embedder",
    "controlnet_mode_embedder": "controlnet_mode_embedder",
    "time_text_embed.timestep_embedder.linear_1":
        "time_embedder.timestep_embedder.0",
    "time_text_embed.timestep_embedder.linear_2":
        "time_embedder.timestep_embedder.2",
    "time_text_embed.guidance_embedder.linear_1":
        "guidance_embedder.timestep_embedder.0",
    "time_text_embed.guidance_embedder.linear_2":
        "guidance_embedder.timestep_embedder.2",
    "time_text_embed.text_embedder.linear_1": "pooled_text_embedder.0",
    "time_text_embed.text_embedder.linear_2": "pooled_text_embedder.2",
}
_DIFFUSERS_DOUBLE = {
    "norm1.linear": "norm1_a.linear",
    "norm1_context.linear": "norm1_b.linear",
    "attn.to_q": "attn.a_to_q",
    "attn.to_k": "attn.a_to_k",
    "attn.to_v": "attn.a_to_v",
    "attn.to_out.0": "attn.a_to_out",
    "attn.add_q_proj": "attn.b_to_q",
    "attn.add_k_proj": "attn.b_to_k",
    "attn.add_v_proj": "attn.b_to_v",
    "attn.to_add_out": "attn.b_to_out",
    "ff.net.0.proj": "ff_a.0",
    "ff.net.2": "ff_a.2",
    "ff_context.net.0.proj": "ff_b.0",
    "ff_context.net.2": "ff_b.2",
    "attn.norm_q": "attn.norm_q_a",
    "attn.norm_k": "attn.norm_k_a",
    "attn.norm_added_q": "attn.norm_q_b",
    "attn.norm_added_k": "attn.norm_k_b",
}
_DIFFUSERS_SINGLE = {
    "attn.to_q": "a_to_q",
    "attn.to_k": "a_to_k",
    "attn.to_v": "a_to_v",
    "attn.norm_q": "norm_q_a",
    "attn.norm_k": "norm_k_a",
    "norm.linear": "norm.linear",
    "proj_mlp": "mlp_in",
    "proj_out": "proj_out",
}


def normalize_flux_controlnet_source(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Diffusers-format FLUX ControlNet checkpoints (InstantX/Shakker etc.)
    -> the module naming :func:`convert_flux_controlnet_state_dict`
    consumes, incl. the q/k/v (+mlp) fusions.  Already-normalized dicts
    pass through untouched."""
    import numpy as _np

    if not any(k.startswith("transformer_blocks.") for k in sd):
        return sd
    out = {}
    for name, v in sd.items():
        v = _np.asarray(v)
        parts = name.split(".")
        stem, leaf = ".".join(parts[:-1]), parts[-1]
        if stem in _DIFFUSERS_TOP:
            out[f"{_DIFFUSERS_TOP[stem]}.{leaf}"] = v
        elif parts[0] == "transformer_blocks":
            mid = ".".join(parts[2:-1])
            if mid in _DIFFUSERS_DOUBLE:
                out[f"blocks.{parts[1]}.{_DIFFUSERS_DOUBLE[mid]}.{leaf}"] = v
        elif parts[0] == "single_transformer_blocks":
            mid = ".".join(parts[2:-1])
            key = _DIFFUSERS_SINGLE.get(mid)
            if key is not None:
                out[f"single_blocks.{parts[1]}.{key}.{leaf}"] = v
        else:
            out[name] = v
    # fuse q/k/v (+ the single blocks' mlp input) the way the blocks expect
    for name in [n for n in list(out) if ".a_to_q." in n or ".b_to_q." in n]:
        comp = "a" if f".a_to_q." in name else "b"
        parts_v = [out.pop(name.replace(f".{comp}_to_q.", f".{comp}_to_{t}."))
                   for t in ("q", "k", "v")]
        if f"single_blocks." in name and comp == "a":
            mlp_name = name.replace(".a_to_q.", ".mlp_in.")
            if mlp_name in out:
                parts_v.append(out.pop(mlp_name))
                out[name.replace(".a_to_q.", ".to_qkv_mlp.")] = (
                    _np.concatenate(parts_v, axis=0))
                continue
        out[name.replace(f".{comp}_to_q.", f".{comp}_to_qkv.")] = (
            _np.concatenate(parts_v, axis=0))
    return out
