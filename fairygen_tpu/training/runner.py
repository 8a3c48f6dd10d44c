"""Training runner + checkpoint logger.

Replaces the reference accelerate loop
(``animation/diffsynth/diffusion/runner.py:8-71``) and ``ModelLogger``
(``diffusion/logger.py``): the jitted SPMD train step does the gradient
all-reduce (no DDP wrapper), and checkpoints are trainable-params-only
safetensors in the reference key layout — including the explicit ``lora_B2``
inclusion (logger.py:35-53) — so stage-1/stage-2/merged adapters round-trip
between the two frameworks.  Full train-state checkpointing (params +
optimizer + step) goes through orbax for resume.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.io import save_safetensors


def wan_lora_state_dict(params, *, include_b2: bool = True,
                        prefix: str = "") -> Dict[str, np.ndarray]:
    """Extract adapter weights into the reference (peft) key layout:
    '<prefix>blocks.N.<module>.lora_{A,B}.default.weight' (+ lora_B2.weight).

    Inverse of models/adapters.py naming; torch layout (out, in)."""
    out = {}
    blocks = params["blocks"]
    name_map = {
        ("self_attn", "q"): "self_attn.q", ("self_attn", "k"): "self_attn.k",
        ("self_attn", "v"): "self_attn.v", ("self_attn", "o"): "self_attn.o",
        ("cross_attn", "q"): "cross_attn.q", ("cross_attn", "k"): "cross_attn.k",
        ("cross_attn", "v"): "cross_attn.v", ("cross_attn", "o"): "cross_attn.o",
        ("ffn", "fc1"): "ffn.0", ("ffn", "fc2"): "ffn.2",
    }
    for (sub, proj), refname in name_map.items():
        layer = blocks.get(sub, {}).get(proj, {})
        if "lora" not in layer:
            continue
        ap = layer["lora"]
        A = np.asarray(ap["A"], np.float32)  # (L, in, r)
        B = np.asarray(ap["B"], np.float32)  # (L, r, out)
        L = A.shape[0]
        for i in range(L):
            base = f"{prefix}blocks.{i}.{refname}"
            out[f"{base}.lora_A.default.weight"] = A[i].T
            out[f"{base}.lora_B.default.weight"] = B[i].T
            if include_b2 and "B2" in ap:
                out[f"{base}.lora_B2.weight"] = np.asarray(ap["B2"][i], np.float32).T
    return out


class ModelLogger:
    """Step/epoch checkpointing of trainable-only state (logger.py:13-53).

    ``async_save=True`` decouples checkpoint writes from the step loop:
    the params are snapshotted to host on the calling thread (one
    device_get — the unavoidable sync), then key-mapping + the safetensors
    write run on a single background thread, so a multi-GB checkpoint no
    longer stalls training for the disk write.  Writes stay ordered (one
    worker); a failed write re-raises at the next save or at ``flush()``.
    """

    def __init__(self, output_path: str, remove_prefix_in_ckpt: Optional[str] = None,
                 state_dict_fn: Optional[Callable] = None,
                 async_save: bool = False):
        self.output_path = output_path
        self.remove_prefix = remove_prefix_in_ckpt
        self.state_dict_fn = state_dict_fn or wan_lora_state_dict
        self.async_save = async_save
        self._pool = None
        self._pending = []
        os.makedirs(output_path, exist_ok=True)

    def _write(self, params, name: str):
        sd = self.state_dict_fn(params)
        if self.remove_prefix:
            sd = {
                (k[len(self.remove_prefix):] if k.startswith(self.remove_prefix) else k): v
                for k, v in sd.items()
            }
        path = os.path.join(self.output_path, name)
        save_safetensors(path, sd)
        return path

    def save(self, params, name: str):
        if not self.async_save:
            return self._write(params, name)
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="fairygen-ckpt")
        self.flush(wait=False)  # surface an earlier failed write
        host_params = jax.device_get(params)
        self._pending.append(self._pool.submit(self._write, host_params, name))
        return os.path.join(self.output_path, name)

    def flush(self, wait: bool = True):
        """Join (or, with wait=False, reap finished) pending async writes,
        re-raising the first failure."""
        still = []
        for f in self._pending:
            if wait or f.done():
                f.result()
            else:
                still.append(f)
        self._pending = still

    def on_step_end(self, state, step: int, save_steps: Optional[int]):
        if save_steps is not None and step % save_steps == 0:
            return self.save(state.params, f"step-{step}.safetensors")

    def on_epoch_end(self, state, epoch: int):
        return self.save(state.params, f"epoch-{epoch}.safetensors")


def save_train_state(path: str, state):
    """Full-state checkpoint via orbax (params + opt state + step)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state)


def restore_train_state(path: str, abstract_state):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), abstract_state)


class PreemptionGuard:
    """Preemption-safe training (TPU VMs get SIGTERM'd): on SIGTERM/SIGINT
    set a flag; the training loop checkpoints the FULL train state at the
    next step boundary and exits cleanly, so `--resume` continues exactly
    where the preempted run stopped.  The reference has no analogue (its
    recovery is periodic step checkpoints only — SURVEY §5)."""

    def __init__(self, checkpoint_path: str):
        self.checkpoint_path = checkpoint_path
        self.triggered = False
        self._previous = {}

    def __enter__(self):
        import signal

        def handler(signum, frame):
            self.triggered = True
            print(f"[preemption] caught signal {signum}; will checkpoint at "
                  "the next step boundary", flush=True)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._previous[sig] = signal.signal(sig, handler)
            except ValueError:  # not the main thread
                pass
        return self

    def __exit__(self, *exc):
        import signal

        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        return False

    def checkpoint(self, state):
        save_train_state(self.checkpoint_path, state)
        print(f"[preemption] train state saved to {self.checkpoint_path}",
              flush=True)


def launch_training_task(
    state,
    train_step: Callable,
    dataset: Iterable,
    collate_fn: Callable,
    *,
    num_epochs: int = 1,
    save_steps: Optional[int] = None,
    logger: Optional[ModelLogger] = None,
    rng=None,
    log_every: int = 10,
    mesh=None,
    metrics_logger=None,  # utils.train_logging.MetricsLogger
    preemption_checkpoint: Optional[str] = None,
    shuffle: bool = False,
    num_workers: int = 1,
    prefetch: int = 2,
    global_batch_size: Optional[int] = None,
):
    """Reference launch_training_task (runner.py:8-47) as a plain loop:
    per-sample batches (collate = identity on element 0), AdamW/schedule
    live inside train_step, loss printed every ``log_every`` (and streamed
    to JSONL/TensorBoard via ``metrics_logger``).

    ``shuffle``/``num_workers``/``prefetch`` mirror the reference's
    ``DataLoader(shuffle=True, num_workers=N)`` (runner.py:29): indexable
    datasets go through data.PrefetchLoader so host-side decode/collate of
    the next samples overlaps the device step; plain iterables fall back
    to the synchronous loop.

    ``global_batch_size``: samples stacked (leading axis concat) into one
    train-step batch — the SPMD equivalent of DDP's one-sample-per-rank
    (reference collate=x[0] under N ranks).  Defaults to the mesh's data
    axis size so data parallelism actually gets distinct samples; the
    trailing partial group is dropped (DataLoader drop_last semantics —
    a ragged batch would recompile and shard unevenly).

    ``preemption_checkpoint``: path for SIGTERM-triggered full-state saves
    (see PreemptionGuard); the loop exits cleanly after saving."""
    rng = rng if rng is not None else jax.random.key(0)
    # resume-aware: a restored TrainState carries its global step — naming
    # checkpoints from 0 again would overwrite the earlier run's artifacts
    # with mislabeled later state
    step = int(jax.device_get(state.step)) if hasattr(state, "step") else 0
    import contextlib

    ctx = mesh if mesh is not None else contextlib.nullcontext()
    guard = (PreemptionGuard(preemption_checkpoint)
             if preemption_checkpoint else contextlib.nullcontext())
    if global_batch_size is None:
        try:
            from ..core.meshes import AXES

            global_batch_size = (int(mesh.shape[AXES.data])
                                 if mesh is not None
                                 and AXES.data in mesh.axis_names else 1)
        except ImportError:
            global_batch_size = 1
    # multi-process (DCN) data feeding: every process walks the SAME
    # seeded epoch permutation but loads only its contiguous block of
    # each global group, then contributes it as its addressable shard of
    # the global batch array (mesh data axis = host-major, multihost.py)
    procs = jax.process_count()
    local_batch = global_batch_size
    if procs > 1:
        if global_batch_size % procs:
            raise ValueError(
                f"global_batch_size {global_batch_size} not divisible by "
                f"{procs} processes")
        local_batch = global_batch_size // procs

    if hasattr(dataset, "__getitem__") and hasattr(dataset, "__len__"):
        from ..data.loader import PrefetchLoader

        loader = PrefetchLoader(dataset, collate_fn, shuffle=shuffle,
                                num_workers=num_workers, prefetch=prefetch,
                                num_shards=procs,
                                shard_index=jax.process_index(),
                                shard_block=local_batch)

        def epoch_batches():  # each __iter__ = one (re-shuffled) epoch
            return loader
    else:  # plain iterable: synchronous, order-preserving
        if procs > 1:
            raise ValueError("multi-process training needs an indexable "
                             "dataset (position sharding)")

        def epoch_batches():
            return (collate_fn(s) for s in dataset)

    if local_batch > 1 or procs > 1:
        inner = epoch_batches

        def _stack(bufs):
            return jax.tree.map(
                lambda *xs: jnp.concatenate(
                    [jnp.asarray(x) for x in xs], axis=0), *bufs)

        def _globalize(local):
            if procs == 1:
                return local
            from jax.sharding import NamedSharding, PartitionSpec

            from ..core.meshes import AXES

            def to_global(x):
                x = np.asarray(x)
                return jax.make_array_from_process_local_data(
                    NamedSharding(mesh, PartitionSpec(AXES.data)),
                    x, (global_batch_size,) + x.shape[1:])

            return jax.tree.map(to_global, local)

        def epoch_batches():  # noqa: F811 — stack k samples per step
            buf = []
            for b in inner():
                buf.append(b)
                if len(buf) == local_batch:
                    yield _globalize(_stack(buf))
                    buf = []

    import time

    last_sync = [time.perf_counter(), step]
    with ctx, guard:
        for epoch in range(num_epochs):
            for batch in epoch_batches():
                rng, sub = jax.random.split(rng)
                state, loss = train_step(state, batch, sub)
                step += 1
                if step % log_every == 0:
                    loss = float(loss)  # forces device sync
                    now = time.perf_counter()
                    sps = (step - last_sync[1]) / max(now - last_sync[0], 1e-9)
                    last_sync = [now, step]
                    print(f"epoch {epoch} step {step} loss {loss:.5f} "
                          f"({sps:.2f} steps/s)", flush=True)
                    if metrics_logger is not None:
                        metrics_logger.log(step, loss=loss, epoch=epoch,
                                           steps_per_sec=sps)
                if logger is not None:
                    logger.on_step_end(state, step, save_steps)
                if preemption_checkpoint and guard.triggered:
                    jax.block_until_ready(state.params)
                    guard.checkpoint(state)
                    if logger is not None and hasattr(logger, "flush"):
                        logger.flush()
                    return state
            if logger is not None:
                logger.on_epoch_end(state, epoch)
    if logger is not None and hasattr(logger, "flush"):
        logger.flush()
    return state
