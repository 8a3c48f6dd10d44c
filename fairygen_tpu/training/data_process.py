"""Two-phase training: the data_process stage.

Port of ``launch_data_process_task`` (reference diffusion/runner.py:50-71)
and the unit-graph split (base_pipeline.py:316-408): run the frozen
preprocessing models (VAE encode + text encoder) over the dataset once and
cache per-sample ``.npz`` files; the train stage then consumes the cache
with ``UnifiedDataset(base_path=cache_dir)`` and never loads the frozen
models at all.
"""
from __future__ import annotations

import os
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def launch_data_process_task(
    dataset: Iterable,
    preprocess_fn: Callable,  # sample -> dict of arrays (latents, context, ...)
    output_path: str,
    *,
    process_index: int = 0,
    num_processes: int = 1,
    log_every: int = 10,
):
    """Cache preprocessed tensors, sharded across hosts like the reference's
    per-rank loop (runner.py:57-68)."""
    os.makedirs(output_path, exist_ok=True)
    n = 0
    for data_id in range(len(dataset)):
        if data_id % num_processes != process_index:
            continue
        sample = dataset[data_id]
        batch = preprocess_fn(sample)
        # cast only floating-point arrays (bf16 has no npz dtype); integer
        # features (token ids, masks) must keep their dtype
        def to_np(v):
            arr = np.asarray(
                v.astype(jnp.float32) if hasattr(v, "dtype")
                and jnp.issubdtype(v.dtype, jnp.floating) else v)
            return arr

        arrays = {k: to_np(v) for k, v in batch.items()}
        path = os.path.join(output_path, f"{process_index}-{data_id}.npz")
        np.savez_compressed(path, **arrays)
        n += 1
        if n % log_every == 0:
            print(f"[data_process] rank {process_index}: {n} samples cached", flush=True)
    print(f"[data_process] rank {process_index}: done, {n} files in {output_path}")
    return n
