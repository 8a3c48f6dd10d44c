"""Fused LayerNorm -> modulate Pallas kernel.

The DiT block runs three LayerNorms plus two AdaLN modulations per block
over the (S, D) activation; measured on v5e these expose ~2.7 ms/block
even though each is "just" elementwise+reduction — XLA materializes the
fp32 normalized intermediate between the reduction and the consumer
matmul (docs/NOTES.md round-3).  This kernel does
``(x - mean) * rsqrt(var + eps) * (1 + scale) + shift`` in ONE HBM pass:
read the bf16 tile, reduce in VMEM fp32, select the per-token modulation
row, write bf16.

The modulation rows come in the DiT's two-segment form (reference
per-token timestep, wan_video.py:1218-1228: first-frame tokens get row 0,
the rest row 1) — pass ``(B, 2, D)`` rows and the static ``seg`` boundary.
Uniform modulation passes the same row twice.  Differentiable via
custom_vjp (backward recomputes through the reference XLA formula, so
remat/training paths are unaffected).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .attention import _on_tpu


def _ln_mod_reference(x, shift2, scale2, seg: int, eps: float):
    """Plain-XLA reference (also the backward recompute path)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    idx = jnp.arange(x.shape[1])[None, :, None]
    sc = jnp.where(idx >= seg, scale2[:, 1:2], scale2[:, 0:1]).astype(jnp.float32)
    sh = jnp.where(idx >= seg, shift2[:, 1:2], shift2[:, 0:1]).astype(jnp.float32)
    return (y * (1.0 + sc) + sh).astype(x.dtype)


def _ln_mod_kernel(x_ref, sh_ref, sc_ref, o_ref, *, eps, seg, bq):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (bq, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * lax.rsqrt(var + eps)
    idx = lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0) + i * bq
    # arithmetic select (mosaic dislikes the (bq,1) i1 x (1,D) broadcast)
    m = (idx >= seg).astype(jnp.float32)  # (bq, 1)
    sc0 = sc_ref[0, 0][None, :].astype(jnp.float32)
    sc1 = sc_ref[0, 1][None, :].astype(jnp.float32)
    sh0 = sh_ref[0, 0][None, :].astype(jnp.float32)
    sh1 = sh_ref[0, 1][None, :].astype(jnp.float32)
    sc = sc0 + m * (sc1 - sc0)
    sh = sh0 + m * (sh1 - sh0)
    o_ref[0] = (y * (1.0 + sc) + sh).astype(o_ref.dtype)


def _ln_mod_pallas(x, shift2, scale2, seg: int, eps: float, bq: int = 256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d = x.shape
    pad = (-s) % bq
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    sp = xp.shape[1]
    out = pl.pallas_call(
        functools.partial(_ln_mod_kernel, eps=eps, seg=seg, bq=bq),
        grid=(b, sp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, 2, d), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, 2, d), lambda bb, i: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(xp, shift2, scale2)
    return out[:, :s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_modulate(x, shift2, scale2, seg: int = 0, eps: float = 1e-6):
    """x (B, S, D); shift2/scale2 (B, 2, D) segment rows; tokens with index
    >= ``seg`` use row 1 (``seg=0`` => row 1 everywhere — pass the same row
    twice for uniform modulation)."""
    if _on_tpu() and x.shape[-1] % 128 == 0:
        return _ln_mod_pallas(x, shift2, scale2, seg, eps)
    return _ln_mod_reference(x, shift2, scale2, seg, eps)


def _ln_mod_fwd(x, shift2, scale2, seg, eps):
    return layer_norm_modulate(x, shift2, scale2, seg, eps), (x, shift2, scale2)


def _ln_mod_bwd(seg, eps, res, g):
    x, shift2, scale2 = res
    _, vjp = jax.vjp(
        lambda x_, sh_, sc_: _ln_mod_reference(x_, sh_, sc_, seg, eps),
        x, shift2, scale2)
    return vjp(g)


layer_norm_modulate.defvjp(_ln_mod_fwd, _ln_mod_bwd)


def ln_modulate(x, shift, scale, eps: float = 1e-6):
    """Uniform AdaLN: ``layer_norm(x) * (1 + scale) + shift`` with
    shift/scale of shape (B, 1, D) / (B, D) (one modulation row per
    sample — the FLUX/Qwen/FLUX.2 adaLN form, reference
    flux_dit.py:108-148).  On TPU this routes through the fused Pallas
    kernel (one HBM pass); elsewhere it is exactly the legacy XLA
    expression (bit-identical to the pre-fusion code path)."""
    if _on_tpu() and x.shape[-1] % 128 == 0 and x.shape[1] >= 256:
        b, d = x.shape[0], x.shape[-1]
        sh = jnp.broadcast_to(shift.reshape(shift.shape[0], 1, d), (b, 2, d))
        sc = jnp.broadcast_to(scale.reshape(scale.shape[0], 1, d), (b, 2, d))
        return layer_norm_modulate(x, sh, sc, 0, eps)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * (1 + scale) + shift


def _rms_mod_reference(x, weight, scale, eps: float):
    """Bit-identical to ``rms_norm(x, weight, eps) * scale`` (ops/norms)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    out = y.astype(x.dtype) * weight
    return out if scale is None else out * scale


def _rms_mod_kernel(x_ref, w_ref, sc_ref, o_ref, *, eps, has_scale):
    import jax.lax as lax

    x = x_ref[0].astype(jnp.float32)
    y = x * lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    out = y.astype(o_ref.dtype) * w_ref[0, 0][None, :]
    if has_scale:
        out = out * sc_ref[0, 0][None, :]
    o_ref[0] = out


def _rms_mod_pallas(x, weight, scale, eps: float, bq: int = 256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, d = x.shape
    pad = (-s) % bq
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x
    sp = xp.shape[1]
    w = jnp.broadcast_to(weight.astype(x.dtype)[None, None], (b, 1, d))
    sc = (jnp.broadcast_to(scale.reshape(scale.shape[0], 1, d), (b, 1, d))
          .astype(x.dtype) if scale is not None
          else jnp.zeros((b, 1, d), x.dtype))
    out = pl.pallas_call(
        functools.partial(_rms_mod_kernel, eps=eps,
                          has_scale=scale is not None),
        grid=(b, sp // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, 1, d), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda bb, i: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(xp, w, sc)
    return out[:, :s]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _rms_modulate_tpu(x, weight, scale, eps: float):
    return _rms_mod_pallas(x, weight, scale, eps)


def _rms_mod_fwd(x, weight, scale, eps):
    return _rms_modulate_tpu(x, weight, scale, eps), (x, weight, scale)


def _rms_mod_bwd(eps, res, g):
    x, weight, scale = res
    _, vjp = jax.vjp(
        lambda x_, w_, sc_: _rms_mod_reference(x_, w_, sc_, eps),
        x, weight, scale)
    return vjp(g)


_rms_modulate_tpu.defvjp(_rms_mod_fwd, _rms_mod_bwd)


def rms_modulate(x, weight, scale=None, eps: float = 1e-5):
    """Fused ``rms_norm(x, weight, eps) * scale`` (the Z-Image sandwich-norm
    form, z_image_dit.py:139-218): one HBM pass on TPU, bit-identical XLA
    fallback elsewhere.  scale (B, 1, D)/(B, D) or None."""
    if _on_tpu() and x.shape[-1] % 128 == 0 and x.shape[1] >= 256:
        return _rms_modulate_tpu(x, weight, scale, eps)
    return _rms_mod_reference(x, weight, scale, eps)


def _vae_rms_silu_reference(x, gamma, silu: bool):
    """Bit-identical to models/wan/vae.py vae_rms_norm (F.normalize over
    channels · sqrt(C) · gamma) optionally followed by _silu."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    y = xf / jnp.maximum(n, 1e-12) * (x.shape[-1] ** 0.5)
    out = (y * gamma.astype(jnp.float32)).astype(dtype)
    if silu:
        out = jax.nn.silu(out.astype(jnp.float32)).astype(dtype)
    return out


def _vae_rms_silu_kernel(x_ref, g_ref, o_ref, *, silu, scale):
    import jax.lax as lax

    x = x_ref[...].astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    y = x / jnp.maximum(n, 1e-12) * scale
    out = (y * g_ref[0][None, :].astype(jnp.float32)).astype(o_ref.dtype)
    if silu:
        out = jax.nn.silu(out.astype(jnp.float32)).astype(o_ref.dtype)
    o_ref[...] = out


def _vae_rms_silu_pallas(x2, gamma, silu: bool, bq: int = 512):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, c = x2.shape
    pad = (-rows) % bq
    xp = jnp.pad(x2, ((0, pad), (0, 0))) if pad else x2
    out = pl.pallas_call(
        functools.partial(_vae_rms_silu_kernel, silu=silu, scale=c ** 0.5),
        grid=(xp.shape[0] // bq,),
        in_specs=[
            pl.BlockSpec((bq, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bq, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(xp, gamma.astype(x2.dtype)[None, :])
    return out[:rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _vae_rms_silu_tpu(x, gamma, silu: bool):
    shape = x.shape
    out = _vae_rms_silu_pallas(x.reshape(-1, shape[-1]), gamma, silu)
    return out.reshape(shape)


def _vae_rms_silu_fwd(x, gamma, silu):
    return _vae_rms_silu_tpu(x, gamma, silu), (x, gamma)


def _vae_rms_silu_bwd(silu, res, g):
    x, gamma = res
    _, vjp = jax.vjp(
        lambda x_, g_: _vae_rms_silu_reference(x_, g_, silu), x, gamma)
    return vjp(g)


_vae_rms_silu_tpu.defvjp(_vae_rms_silu_fwd, _vae_rms_silu_bwd)


def vae_rms_silu(x, gamma, silu: bool = True):
    """Fused channel-RMS norm (F.normalize·sqrt(C)·gamma, the Wan VAE form,
    wan_video_vae.py:55-70) + optional SiLU in one HBM pass.  x (..., C);
    bit-identical XLA fallback off-TPU."""
    c = x.shape[-1]
    rows = x.size // c
    if _on_tpu() and c % 128 == 0 and rows >= 512:
        return _vae_rms_silu_tpu(x, gamma, silu)
    return _vae_rms_silu_reference(x, gamma, silu)


def affine_rows(weight, bias, batch: int):
    """Affine LayerNorm (y*w + b) as modulation rows: scale = w - 1,
    shift = b, duplicated so both segments match."""
    sc = jnp.broadcast_to((weight - 1.0)[None, None], (batch, 2, weight.shape[0]))
    sh = jnp.broadcast_to(bias[None, None], (batch, 2, bias.shape[0]))
    return sh, sc
