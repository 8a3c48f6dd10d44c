"""Host-RAM staging for models larger than one chip's HBM.

The TPU-native equivalent of the reference's VRAM management
(``animation/diffsynth/core/vram/layers.py``: offload/onload state
machine + FP8 linears).  Instead of wrapping modules, we exploit JAX's
two-backend setup: params materialize on the host CPU backend
(``host_load_context``), get quantized there if requested
(ops/quant.py — the FP8-linear counterpart), and only the tensors a
stage actually needs are ``device_put`` to the accelerator
(``to_accelerator``).  Dropping the device reference frees the HBM —
the "offload" direction needs no copy because the host tree is kept.

Enables e.g. Qwen-Image on ONE 16 GB v5e: the 20B DiT quantizes to
~10.4 GB int8 at load, and the 8B text encoder is onloaded per
``encode_prompt`` call and freed before the denoise loop.
"""
from __future__ import annotations

import contextlib

import jax


def host_load_context(enabled: bool = True):
    """Context manager: uncommitted arrays (checkpoint conversion,
    jnp.asarray) land on the host CPU backend instead of the default
    accelerator.  No-op when ``enabled`` is False."""
    if not enabled:
        return contextlib.nullcontext()
    return jax.default_device(jax.devices("cpu")[0])


def to_accelerator(tree, device=None):
    """device_put a (possibly None) pytree to the default accelerator.
    Returns None for None so optional model slots pass through."""
    if tree is None:
        return None
    if device is None:
        device = jax.devices()[0]
    return jax.device_put(tree, device)


class StagedParams:
    """Host-resident params onloaded to HBM only inside ``use()``.

    >>> staged = StagedParams(te_params)
    >>> with staged.use() as p:
    ...     emb = encode(p, ids)          # p lives in HBM here
    >>> # HBM freed as soon as the block exits (reference onload/offload
    >>> # per pipeline unit, base_pipeline.py:146-168)
    """

    def __init__(self, host_tree):
        self.host_tree = host_tree

    @contextlib.contextmanager
    def use(self, device=None):
        dev = to_accelerator(self.host_tree, device)
        try:
            yield dev
        finally:
            del dev
