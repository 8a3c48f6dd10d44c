"""GPipe-style pipeline parallelism over the DiT block stack.

The reference has NO pipeline parallelism anywhere (SURVEY.md §2.5: "PP,
TP, EP — absent"); its training scale-out is DDP only
(``animation/train.py:126-129``).  This module is a beyond-parity
capability aimed at the TPU multi-slice shape: ``pipe`` is the OUTERMOST
mesh axis (slowest-varying → maps across hosts/slices), so the only
cross-slice traffic is one (microbatch, S, D) activation hop per tick over
DCN, while dp/sp/tp collectives stay on ICI within a slice.

Design — a circular "shift register" schedule compiled as one program:

  - The stacked block params (L, ...) are sharded over ``pipe`` on the
    leading axis: stage ``s`` holds blocks [s·L/P, (s+1)·L/P).
  - The batch is split into M microbatches.  A ``lax.scan`` runs
    T = M + P - 1 ticks; at tick t, stage s runs its local blocks on
    microbatch (t - s) (garbage warm-up/drain ticks are computed and
    discarded — the usual GPipe bubble, fraction (P-1)/T).
  - Activations move stage→stage+1 with ``lax.ppermute`` (stage 0 feeds
    from the input buffer; the last stage writes the output buffer, which
    is broadcast once at the end with a masked ``psum``).

Everything is differentiable (ppermute/psum/gather transposes), so the
same function serves the pjit training step; ``remat`` rematerializes each
block body on the backward pass exactly like the dense scan path.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.meshes import AXES


def stage_count(mesh: Mesh, axis: str = "pipe") -> int:
    return mesh.shape[axis] if axis in mesh.axis_names else 1


def pipeline_blocks_forward(
    stacked,
    x,  # (B, S, D) flattened tokens
    ctx,  # (B, Lk, D) embedded text context
    t_mod,  # (B, S', 6, D), S' ∈ {1, 2, S}
    freqs,  # (S, hd/2, 2) rope table — shared across batch
    cfg,
    mesh: Mesh,
    *,
    num_microbatches: Optional[int] = None,
    axis: str = "pipe",
    data_axis: Optional[str] = AXES.data,
    remat: bool = False,
    seg=None,
    fused_norms: bool = True,
    freqs_full=None,
):
    """Run the block stack pipeline-parallel over ``axis``.

    Composes with data parallelism (microbatch batch dim sharded over
    ``data_axis``); sequence/tensor parallelism inside a stage is not
    composed here (use Ulysses/TP for that regime — PP targets the
    weight-capacity/multi-slice regime instead).
    """
    from ..models.wan.dit import blocks_forward

    n_stages = mesh.shape[axis]
    L = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    B = x.shape[0]
    M = int(num_microbatches) if num_microbatches else B
    if L % n_stages:
        raise ValueError(f"num_layers {L} not divisible by pipe={n_stages}")
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    mb = B // M
    if data_axis is not None and data_axis in mesh.axis_names:
        if mb % mesh.shape[data_axis]:
            raise ValueError(
                f"microbatch size {mb} not divisible by data axis "
                f"{mesh.shape[data_axis]}")
    else:
        data_axis = None

    x_mb = x.reshape(M, mb, *x.shape[1:])
    ctx_mb = ctx.reshape(M, mb, *ctx.shape[1:])
    t_mb = t_mod.reshape(M, mb, *t_mod.shape[1:])

    mb_spec = P(None, data_axis)  # (M, mb, ...) arrays
    n_ticks = M + n_stages - 1
    last = n_stages - 1

    def run(local_blocks, x_mb, ctx_mb, t_mb, freqs):
        sidx = lax.axis_index(axis)

        def tick(carry, t):
            state, outbuf = carry
            m_idx = jnp.clip(t - sidx, 0, M - 1)
            inp = jnp.where(
                sidx == 0,
                lax.dynamic_index_in_dim(x_mb, m_idx, 0, keepdims=False),
                state,
            )
            ctx_t = lax.dynamic_index_in_dim(ctx_mb, m_idx, 0, keepdims=False)
            tm_t = lax.dynamic_index_in_dim(t_mb, m_idx, 0, keepdims=False)
            y = blocks_forward(
                local_blocks, inp, ctx_t, tm_t, freqs, cfg, remat=remat,
                seg=seg, fused_norms=fused_norms, freqs_full=freqs_full,
            )
            w = t - last
            upd = lax.dynamic_update_index_in_dim(
                outbuf, y, jnp.clip(w, 0, M - 1), 0)
            outbuf = jnp.where((sidx == last) & (w >= 0), upd, outbuf)
            state = lax.ppermute(
                y, axis, [(i, i + 1) for i in range(n_stages - 1)])
            return (state, outbuf), None

        init = (jnp.zeros_like(x_mb[0]), jnp.zeros_like(x_mb))
        (_, outbuf), _ = lax.scan(tick, init, jnp.arange(n_ticks))
        # only the last stage holds real outputs — one broadcast at the end
        return lax.psum(
            jnp.where(sidx == last, outbuf, jnp.zeros_like(outbuf)), axis)

    blocks_spec = jax.tree.map(lambda _: P(axis), stacked)
    out = shard_map(
        run,
        mesh=mesh,
        in_specs=(blocks_spec, mb_spec, mb_spec, mb_spec, P()),
        out_specs=mb_spec,
        check_vma=False,
    )(stacked, x_mb, ctx_mb, t_mb, freqs)
    return out.reshape(B, *x.shape[1:])


def shard_blocks_over_pipe(params: Any, mesh: Mesh, axis: str = "pipe"):
    """Place the stacked ``blocks`` subtree stage-sharded over ``axis``
    (leading layer dim) and everything else replicated — the at-rest layout
    matching ``pipeline_blocks_forward``'s in_specs, so pjit does not
    reshard per step."""
    from jax.sharding import NamedSharding

    def place(path, a):
        is_block = any(
            getattr(k, "key", None) == "blocks" for k in path)
        spec = P(axis) if is_block else P()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
