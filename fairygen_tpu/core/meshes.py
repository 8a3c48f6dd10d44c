"""Device-mesh construction and canonical axis names.

Replaces the reference's process-group plumbing
(``torch.distributed.init_process_group`` +
``animation/diffsynth/utils/xfuser/xdit_context_parallel.py:12-23``) with a
single SPMD mesh.  Collectives are compiler-scheduled by XLA over ICI/DCN —
there is no NCCL/HCCL backend selection to manage.

Axes:
  data  — data parallel (batch). Gradients psum over this axis.
  seq   — Ulysses sequence parallel over the flattened (f·h·w) token axis.
  tensor— reserved for tensor parallelism of the FFN/attention projections.
  pipe  — (optional, outermost) pipeline-parallel stage axis; slowest-
          varying so it maps across hosts/slices (DCN) — see
          parallel/pipeline.py. Only present when requested (pipe>1).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class AxisNames:
    data: str = "data"
    seq: str = "seq"
    tensor: str = "tensor"
    pipe: str = "pipe"


AXES = AxisNames()


def make_mesh(
    data: int = -1,
    seq: int = 1,
    tensor: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, seq, tensor) mesh — plus an outermost ``pipe`` axis
    when pipe>1.  data=-1 consumes remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (seq * tensor * pipe) == 0, (n, seq, tensor, pipe)
        data = n // (seq * tensor * pipe)
    assert data * seq * tensor * pipe == n, (data, seq, tensor, pipe, n)
    if pipe > 1:
        # pipe outermost: contiguous (host-major) device blocks per stage,
        # so stage hops ride DCN and everything else stays on ICI
        arr = np.array(devices).reshape(pipe, data, seq, tensor)
        return Mesh(arr, (AXES.pipe, AXES.data, AXES.seq, AXES.tensor))
    arr = np.array(devices).reshape(data, seq, tensor)
    return Mesh(arr, (AXES.data, AXES.seq, AXES.tensor))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXES.data))


def shard_tokens(mesh: Mesh, batch_axis_first: bool = True) -> NamedSharding:
    """(B, S, D) activations: batch over data axis, tokens over seq axis."""
    return NamedSharding(mesh, P(AXES.data, AXES.seq))


def shard_batch_over_data(x, mesh: Mesh):
    """Pad the leading axis to a multiple of the data-axis size and place
    the array batch-sharded.  Returns (sharded, n_pad) — callers drop the
    last n_pad rows of the result (used to spread independent work items,
    e.g. VAE decode tiles, across chips)."""
    import jax

    n_data = mesh.shape[AXES.data]
    n_pad = (-x.shape[0]) % n_data
    if n_pad:
        import jax.numpy as jnp

        x = jnp.concatenate([x, jnp.repeat(x[-1:], n_pad, axis=0)], axis=0)
    return jax.device_put(x, shard_batch(mesh)), n_pad
