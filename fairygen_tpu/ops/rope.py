"""3D rotary position embedding for video DiTs.

The reference precomputes complex64 tables in fp64 and multiplies in
complex128 (``wan_video_dit.py:74-96``).  TPUs have no fp64 fast path, so
we carry (cos, sin) fp32 tables and do the complex multiply as 2-wide real
ops in fp32 — validated to ≲1e-6 against the fp64 reference at video
sequence lengths (positions ≤ 1024, angles ≤ ~1e3).

Head-dim split across (frame, height, width): d/2 complex pairs split as
[d/2 − 2·(d/6 pairs)] f + (d//3)/2 h + (d//3)/2 w, matching
``precompute_freqs_cis_3d`` (wan_video_dit.py:74-79).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _freqs_1d(dim: int, end: int = 1024, theta: float = 10000.0) -> np.ndarray:
    """Angle table (end, dim//2) in fp64 — host-side precompute."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    return np.outer(np.arange(end, dtype=np.float64), freqs)


def precompute_freqs_3d(
    head_dim: int, end: int = 1024, theta: float = 10000.0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-axis angle tables: (end, df/2), (end, dh/2), (end, dw/2)."""
    d_f = head_dim - 2 * (head_dim // 3)
    d_hw = head_dim // 3
    return (
        _freqs_1d(d_f, end, theta),
        _freqs_1d(d_hw, end, theta),
        _freqs_1d(d_hw, end, theta),
    )


def build_freqs_grid(freqs_3d, f: int, h: int, w: int) -> jnp.ndarray:
    """Flattened (f·h·w, d/2) angle grid in fp32, (cos, sin) stacked later.

    Matches the concat order of model_fn_wan_video (wan_video.py:1271-1275):
    [f-part expanded, h-part expanded, w-part expanded] along the pair axis.
    """
    ff, fh, fw = freqs_3d
    gf = np.broadcast_to(ff[:f][:, None, None, :], (f, h, w, ff.shape[1]))
    gh = np.broadcast_to(fh[:h][None, :, None, :], (f, h, w, fh.shape[1]))
    gw = np.broadcast_to(fw[:w][None, None, :, :], (f, h, w, fw.shape[1]))
    grid = np.concatenate([gf, gh, gw], axis=-1).reshape(f * h * w, -1)
    cos = np.cos(grid).astype(np.float32)
    sin = np.sin(grid).astype(np.float32)
    return jnp.asarray(np.stack([cos, sin]))  # (2, S, d/2)


def rope_apply(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotate q/k by the (cos, sin) table.

    x:     (B, S, N, D) — heads split, D = head_dim
    freqs: (2, S, D/2)  — from build_freqs_grid

    Equivalent to the reference complex multiply (wan_video_dit.py:91-96)
    with adjacent-pair layout: out[2i] = x[2i]·cos − x[2i+1]·sin,
    out[2i+1] = x[2i]·sin + x[2i+1]·cos.
    """
    b, s, n, d = x.shape
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, s, n, d // 2, 2)
    cos = freqs[0][None, :, None, :]  # (1, S, 1, d/2)
    sin = freqs[1][None, :, None, :]
    x0, x1 = xf[..., 0], xf[..., 1]
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    return jnp.stack([o0, o1], axis=-1).reshape(b, s, n, d).astype(dtype)


def apply_interleaved_rope(x, cos, sin):
    """Interleaved-pair RoPE used by every image-DiT family (FLUX.1/2,
    Qwen-Image, Z-Image): x (B, L, N, D) with (even, odd) pairs; cos/sin
    (L, D/2) fp32 per-pair tables.  fp32 rotation, cast back."""
    import jax.numpy as jnp

    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out_e = c * xf[..., 0] - s * xf[..., 1]
    out_o = s * xf[..., 0] + c * xf[..., 1]
    return jnp.stack([out_e, out_o], -1).reshape(x.shape).astype(x.dtype)
