"""Multi-host (DCN) meshes: data parallelism across hosts, ICI within.

The reference scales across processes with accelerate/torchrun + NCCL
(``stage1_id.sh`` launches DDP); the TPU answer is one global mesh whose
leading ``data`` axis spans hosts over DCN while ``seq``/``tensor`` stay
inside a host's ICI domain — gradient psum is the only collective that
crosses DCN, exactly the traffic DCN is provisioned for (the
"How to Scale Your Model" recipe).

Usage on each host of a pod slice / multi-slice job:

    from fairygen_tpu.parallel.multihost import (
        initialize_multihost, make_multihost_mesh)
    initialize_multihost()          # env-driven; no-op on single host
    mesh = make_multihost_mesh(seq=4)   # data spans all hosts
    # train steps / pipelines take this mesh unchanged
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..core.meshes import AXES


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or env; returns True if a
    multi-process runtime was started.

    On Cloud TPU pods ``jax.distributed.initialize()`` autodetects
    everything; elsewhere set FAIRYGEN_COORDINATOR / FAIRYGEN_NUM_PROCESSES
    / FAIRYGEN_PROCESS_ID (or pass explicitly).  Single-host runs return
    False and touch nothing.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "FAIRYGEN_COORDINATOR")
    if num_processes is None and os.environ.get("FAIRYGEN_NUM_PROCESSES"):
        num_processes = int(os.environ["FAIRYGEN_NUM_PROCESSES"])
    if process_id is None and os.environ.get("FAIRYGEN_PROCESS_ID"):
        process_id = int(os.environ["FAIRYGEN_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        # TPU pod autodetection path: initialize() works with no args when
        # the TPU runtime provides topology env; harmless to skip on 1 host
        from jax._src import xla_bridge

        if (os.environ.get("TPU_WORKER_HOSTNAMES")
                and not xla_bridge.backends_are_initialized()):
            jax.distributed.initialize()
            return jax.process_count() > 1
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def make_multihost_mesh(
    data: int = -1,
    seq: int = 1,
    tensor: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Global (data, seq, tensor) mesh with hosts laid along ``data``.

    ``seq``/``tensor`` must fit inside one host's devices so their
    collectives (all-to-all, all-reduce) ride ICI; the DCN-crossing slice
    of the ``data`` axis only carries the gradient psum.  ``data=-1``
    consumes the remaining global devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_local = max(
        sum(1 for d in devices
            if getattr(d, "process_index", 0) == jax.process_index()), 1)
    if seq * tensor > n_local:
        raise ValueError(
            f"seq*tensor={seq * tensor} exceeds the {n_local} devices of "
            f"one host — those collectives would cross DCN")
    if n_local % (seq * tensor) != 0:
        raise ValueError(
            f"seq*tensor={seq * tensor} must divide the per-host device "
            f"count {n_local}")
    if data == -1:
        data = n // (seq * tensor)
    if data * seq * tensor != n:
        raise ValueError(f"{data}x{seq}x{tensor} != {n} devices")

    num_hosts = max(n // n_local, 1)
    if num_hosts > 1:
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (data // num_hosts, seq, tensor),
                (num_hosts, 1, 1),
                devices=devices,
            )
        except ValueError:
            # simulated multi-process runtimes (CPU jax.distributed) have
            # no slice_index topology; group by process so the data axis
            # spans hosts and seq/tensor stay within one host's devices
            ordered = sorted(devices,
                             key=lambda d: (d.process_index, d.id))
            arr = np.array(ordered).reshape(data, seq, tensor)
    else:
        arr = np.array(devices).reshape(data, seq, tensor)
    return Mesh(arr, (AXES.data, AXES.seq, AXES.tensor))
