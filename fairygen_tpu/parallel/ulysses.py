"""Ulysses sequence parallelism (Unified Sequence Parallel) over ICI.

Replaces the reference's xfuser integration
(``animation/diffsynth/utils/xfuser/xdit_context_parallel.py``): instead of
monkey-patched forwards + torch.distributed all-to-all, the flattened
(f·h·w) token axis is sharded over the mesh's ``seq`` axis and self-
attention runs under ``shard_map``:

    all_to_all (scatter heads, gather seq) -> local dense attention
    -> all_to_all back (scatter seq, gather heads)

Cross-attention needs no communication (text kv is replicated; each token
shard attends independently), matching xfuser's design where only
``self_attn`` is patched (reference wan_video.py:84-95).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.meshes import AXES


def pad_to_multiple(x, axis: int, multiple: int):
    """Zero-pad ``axis`` up to a multiple; returns (padded, original_size).

    The reference pads per-rank chunks the same way
    (xdit_context_parallel.py:95-99, wan_video.py:1310-1315)."""
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


def make_ulysses_attention(mesh: Mesh, seq_axis: str = AXES.seq,
                           prescaled: bool = False,
                           kv_len: int = None) -> Callable:
    """Returns attention(q, k, v) for (B, S, N, D) arrays whose S axis is
    sharded over ``seq_axis``. N must be divisible by the axis size.
    ``prescaled``: q already carries scale·log2e (see ops.attention).
    ``kv_len``: true (unpadded) token count — after the all-to-all every
    shard holds the FULL padded sequence as kv, so the padding columns are
    masked exactly (the reference lets them attend,
    xdit_context_parallel.py:95-99)."""
    n_shards = mesh.shape[seq_axis]

    from ..ops.attention import attention as dense_attention

    if n_shards == 1:
        return functools.partial(dense_attention, prescaled=prescaled,
                                 kv_len=kv_len)

    spec = P(AXES.data, seq_axis, None, None)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    def ulysses(q, k, v):
        # local: (b, S/n, N, D) -> (b, S, N/n, D)
        q = lax.all_to_all(q, seq_axis, split_axis=2, concat_axis=1, tiled=True)
        k = lax.all_to_all(k, seq_axis, split_axis=2, concat_axis=1, tiled=True)
        v = lax.all_to_all(v, seq_axis, split_axis=2, concat_axis=1, tiled=True)
        o = dense_attention(q, k, v, prescaled=prescaled, kv_len=kv_len)
        # back: (b, S, N/n, D) -> (b, S/n, N, D)
        return lax.all_to_all(o, seq_axis, split_axis=1, concat_axis=2, tiled=True)

    return ulysses
