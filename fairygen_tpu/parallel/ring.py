"""Ring (context-parallel) attention over the ICI torus.

The reference plumbs ring attention through xfuser but permanently pins it
off (``ring_degree=1`` hard-coded, reference
``animation/diffsynth/utils/xfuser/xdit_context_parallel.py:21``); only
Ulysses runs.  On TPU the ring schedule is a natural fit for the ICI
torus, so this module implements it for real:

  - Every device keeps its resident Q shard; K/V shards rotate
    neighbor-to-neighbor via ``lax.ppermute`` (strictly nearest-neighbor
    ICI traffic, vs Ulysses' all-to-all).
  - Each rotation step computes a partial flash attention of the local Q
    against the visiting K/V chunk, returning (out_i, lse_i); partials are
    merged with the online-softmax rule in float32, so the result is
    EXACT (not an approximation).
  - XLA overlaps the ppermute with the chunk matmuls (the permute for
    step t+1 is independent of step t's attention).

When to prefer ring over Ulysses:
  - Ulysses requires ``num_heads % n_shards == 0`` (it scatters heads);
    ring has no head constraint, so the token axis can outgrow the head
    count (e.g. 16- or 32-way sequence sharding on a 24-head DiT).
  - Ring moves K+V once around the loop (2·S·D bytes per hop) while
    Ulysses moves Q,K,V + O through all-to-alls; on meshes where
    all-to-all crosses slow links, the ring's neighbor-only pattern wins.

Padding is handled EXACTLY: each visiting chunk knows which global kv
columns it covers (the source shard index is ``(my_index - step) % n``),
so padded columns are masked per chunk — the same guarantee as the
Ulysses path's ``kv_len`` masking (ulysses.py), which the reference does
not give (its padding attends, xdit_context_parallel.py:95-99).

Differentiability: partial merges and ppermute are differentiable; the
per-chunk attention dispatches to the Pallas LSE kernel on TPU
(forward-only) or the XLA path (differentiable) — see
``ops.attention.attention_with_lse``.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.meshes import AXES


def _merge_partials(o, lse, o_i, lse_i):
    """Online-softmax merge of two normalized partials (f32 accum).

    o/(o_i): (B,S,N,D) normalized partial outputs; lse/(lse_i): (B,S,N)
    base-2 logsumexp of the corresponding score chunks."""
    m = jnp.maximum(lse, lse_i)
    wa = jnp.exp2(lse - m)[..., None]
    wb = jnp.exp2(lse_i - m)[..., None]
    o = (o.astype(jnp.float32) * wa + o_i.astype(jnp.float32) * wb) / (wa + wb)
    lse = m + jnp.log2(wa[..., 0] + wb[..., 0])
    return o, lse


def make_ring_attention(mesh: Mesh, seq_axis: str = AXES.seq,
                        prescaled: bool = False,
                        kv_len: Optional[int] = None) -> Callable:
    """Returns attention(q, k, v) for (B, S, N, D) arrays whose S axis is
    sharded over ``seq_axis`` — same contract as
    :func:`..parallel.ulysses.make_ulysses_attention`, but with no
    ``num_heads % n_shards`` requirement.

    ``prescaled``: q already carries scale·log2e (see ops.attention).
    ``kv_len``: true (unpadded) global token count — padded kv columns are
    masked exactly, per visiting chunk."""
    n_shards = mesh.shape[seq_axis]

    from ..ops.attention import attention, attention_with_lse

    if n_shards == 1:
        return functools.partial(attention, prescaled=prescaled,
                                 kv_len=kv_len)

    spec = P(AXES.data, seq_axis, None, None)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )
    def ring(q, k, v):
        s_loc = k.shape[1]
        total = n_shards * s_loc
        ragged = kv_len is not None and kv_len != total
        idx = lax.axis_index(seq_axis)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

        def partial_attn(k_c, v_c, step):
            if not ragged:
                return attention_with_lse(q, k_c, v_c, prescaled=prescaled)
            # The chunk arriving at step t originated on shard
            # (idx - t) mod n — a traced, device-dependent index.  Its
            # VALID column count, however, only depends on the source
            # index, and the set of possible counts is tiny (full for
            # interior chunks, one partial count at the padding boundary,
            # zero past it).  lax.switch over those STATIC counts keeps
            # every branch on the flash kernel's static kv_len mask —
            # no materialized fp32 logits, unlike a dynamic column mask.
            src = (idx - step) % n_shards
            counts = sorted({min(max(kv_len - j * s_loc, 0), s_loc)
                             for j in range(n_shards)})

            def branch(c):
                def fn(_):
                    if c == s_loc:
                        return attention_with_lse(q, k_c, v_c,
                                                  prescaled=prescaled)
                    if c == 0:
                        # fully padded chunk: neutral partial (weight 0)
                        o = jnp.zeros(q.shape, q.dtype)
                        lse = jnp.full(q.shape[:3], -1e30, jnp.float32)
                        return o, lse
                    return attention_with_lse(q, k_c, v_c,
                                              prescaled=prescaled, kv_len=c)
                return fn

            src_count = jnp.clip(kv_len - src * s_loc, 0, s_loc)
            which = sum(jnp.int32(src_count > c) for c in counts[:-1]) \
                if len(counts) > 1 else jnp.int32(0)
            # `which` indexes into `counts` (ascending): src_count equals
            # counts[which] because src_count is always one of them
            return jax.lax.switch(which, [branch(c) for c in counts], None)

        o, lse = partial_attn(k, v, 0)
        k_c, v_c = k, v
        # static unroll: n_shards is a mesh constant (<= a few dozen); each
        # ppermute is independent of the previous step's attention, so XLA
        # overlaps communication with compute
        for step in range(1, n_shards):
            k_c = lax.ppermute(k_c, seq_axis, perm)
            v_c = lax.ppermute(v_c, seq_axis, perm)
            o_i, lse_i = partial_attn(k_c, v_c, step)
            o, lse = _merge_partials(o, lse, o_i, lse_i)
        return o.astype(q.dtype)

    return ring
