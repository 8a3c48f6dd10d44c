"""Seeded noise generation.

The reference seeds a ``torch.Generator`` per call
(``base_pipeline.py:171-176``).  Natively we use JAX's counter-based PRNG —
reproducible across hosts and shardable.  For golden-parity runs against
reference outputs, ``torch_compat=True`` reproduces torch CPU
``randn(seed)`` bit-exactly via the (CPU) torch package.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def generate_noise(shape, seed=0, dtype=jnp.float32, torch_compat=False):
    if torch_compat:
        import torch

        g = torch.Generator("cpu").manual_seed(int(seed))
        return jnp.asarray(
            torch.randn(shape, generator=g, dtype=torch.float32).numpy(), dtype=dtype
        )
    key = seed if isinstance(seed, jax.Array) and seed.dtype == jax.dtypes.prng_key(
        "threefry2x32"
    ) else jax.random.key(int(seed))
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)
