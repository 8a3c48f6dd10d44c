"""Optimizer factory for the trainers.

The reference uses AdamW on the animation side
(``animation/diffsynth/diffusion/runner.py:27``) and 8-bit Adam on the
stylization side (``stylization/dora_training/train.sh:29``
``--use_8bit_adam``, bitsandbytes) to cut optimizer-state memory.  There
is no bitsandbytes on TPU; the TPU-native stand-in for the same memory
budget is **Adafactor** (factored second moments: optimizer state drops
from 2x params to ~1x + row/col factors).
"""
from typing import Optional

import optax

OPTIMIZERS = ("adamw", "adafactor", "sgd")


def make_optimizer(name: str = "adamw", learning_rate: float = 1e-4,
                   weight_decay: float = 0.01,
                   grad_clip_norm: Optional[float] = None):
    """Build the optax transform the train steps consume."""
    if name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    elif name == "adafactor":
        tx = optax.adafactor(
            learning_rate,
            weight_decay_rate=weight_decay if weight_decay else None)
    elif name == "sgd":
        tx = optax.sgd(learning_rate)
    else:
        raise ValueError(
            f"optimizer must be one of {OPTIMIZERS}, got {name!r}")
    if grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx
