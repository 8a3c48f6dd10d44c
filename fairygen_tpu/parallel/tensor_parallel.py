"""Tensor (Megatron-style) parallelism for the Wan DiT FFN.

The reference scales only by data parallelism + Ulysses sequence
parallelism (``xdit_context_parallel.py``); on TPU the mesh carries a third
``tensor`` axis (core/meshes.py) that this module puts to work: the FFN —
the largest single cost in a DiT block (~45% of block FLOPs at 5B scale) —
is column/row-split across it.

TPU-native design: no communication code at all.  ``fc1`` weights are
placed column-sharded (P(None, None, "tensor")) and ``fc2`` row-sharded
(P(None, "tensor", None)); XLA's SPMD partitioner propagates the sharding
through the gelu and inserts exactly one reduce-scatter/all-reduce after
``fc2`` — the same schedule Megatron hand-writes with NCCL.

Attention stays on the data/seq axes on purpose: the flash-attention
kernel runs inside a ``shard_map`` over ``seq`` (parallel/ulysses.py), and
head-sharding its inputs over ``tensor`` would conflict with the
all-to-all layout.  dp x sp x tp compose: see
``tests/test_parallel.py::test_ffn_tensor_parallel_*``.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.meshes import AXES


def wan_dit_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree for DiT params: FFN split over ``tensor``,
    everything else replicated (data/seq parallelism shard activations,
    not weights)."""
    tensor = AXES.tensor
    rep = NamedSharding(mesh, P())
    col_w = NamedSharding(mesh, P(None, None, tensor))  # (L, D, F)
    col_b = NamedSharding(mesh, P(None, tensor))        # (L, F)
    row_w = NamedSharding(mesh, P(None, tensor, None))  # (L, F, D)

    def fn(path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if "ffn" in keys:
            if "fc1" in keys:
                return col_w if leaf.ndim == 3 else col_b
            if "fc2" in keys:
                return row_w if leaf.ndim == 3 else rep
        return rep

    return jax.tree_util.tree_map_with_path(fn, params)


def shard_wan_dit_params(params: Any, mesh: Mesh, ffn_dim: int = None):
    """Place DiT params on the mesh with FFN tensor sharding.

    ``device_put`` is a no-op for leaves already resident with the right
    sharding, so calling this repeatedly (e.g. per pipeline call) is free.
    """
    tp = mesh.shape[AXES.tensor]
    if ffn_dim is not None and ffn_dim % tp != 0:
        raise ValueError(
            f"ffn_dim={ffn_dim} not divisible by tensor axis size {tp}")
    shardings = wan_dit_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def flux_dit_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding tree for the FLUX DiT: Megatron col/row splits over
    ``tensor`` for every projection whose split avoids mid-block
    collectives — double-block qkv (by heads) + out-proj + both FFNs, and
    the single blocks' fused qkv+mlp / joint output projection (their 3D/4D
    column groups each split evenly when tp | num_heads).  AdaLN
    modulations and norms stay replicated (their outputs feed token-wide
    layer norms — sharding them buys little memory for an extra gather).

    At 12B bf16 this drops the per-chip DiT weight share to roughly
    30% + 70%/tp — the fit path for FLUX.1 on 16 GB v5e chips.  No
    communication code: XLA's SPMD partitioner inserts the single
    reduce per row-split projection, exactly the Megatron schedule."""
    tensor = AXES.tensor
    rep = NamedSharding(mesh, P())
    col_w = NamedSharding(mesh, P(None, None, tensor))
    col_b = NamedSharding(mesh, P(None, tensor))
    row_w = NamedSharding(mesh, P(None, tensor, None))

    COL = {"a_qkv", "b_qkv", "fc1", "to_qkv_mlp"}
    ROW = {"a_out", "b_out", "fc2", "proj_out"}

    def fn(path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if "double_blocks" in keys or "single_blocks" in keys:
            if "norm" in keys or "norm1_a" in keys or "norm1_b" in keys:
                return rep
            if any(k in COL for k in keys):
                return col_w if leaf.ndim == 3 else col_b
            if any(k in ROW for k in keys):
                return row_w if leaf.ndim == 3 else rep
        return rep

    return jax.tree_util.tree_map_with_path(fn, params)


def shard_flux_dit_params(params: Any, mesh: Mesh, num_heads: int = None):
    """Place FLUX DiT params on the mesh (idempotent like the wan
    variant)."""
    tp = mesh.shape[AXES.tensor]
    if num_heads is not None and num_heads % tp != 0:
        raise ValueError(
            f"num_heads={num_heads} not divisible by tensor axis {tp}")
    return jax.tree.map(jax.device_put, params,
                        flux_dit_param_shardings(params, mesh))


def _block_tp_shardings(params: Any, mesh: Mesh, block_keys, col, row):
    """Generic Megatron col/row sharding tree over stacked-block params:
    leaves under ``block_keys`` whose path hits ``col`` split their last
    dim over ``tensor``, ``row`` their middle dim; everything else (norms,
    modulations, embedders) replicated."""
    tensor = AXES.tensor
    rep = NamedSharding(mesh, P())
    col_w = NamedSharding(mesh, P(None, None, tensor))
    col_b = NamedSharding(mesh, P(None, tensor))
    row_w = NamedSharding(mesh, P(None, tensor, None))

    def fn(path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        if any(b in keys for b in block_keys):
            if any(k in col for k in keys):
                return col_w if leaf.ndim == 3 else (
                    col_b if leaf.ndim == 2 and leaf.shape[-1] %
                    mesh.shape[tensor] == 0 else rep)
            if any(k in row for k in keys):
                return row_w if leaf.ndim == 3 else rep
        return rep

    return jax.tree_util.tree_map_with_path(fn, params)


def shard_qwen_image_dit_params(params: Any, mesh: Mesh,
                                num_heads: int = None):
    """Qwen-Image DiT (20B) tensor sharding: separate q/k/v (+text adds)
    column-split by heads, output projections row-split, both MLPs
    Megatron col/row; modulations replicated.  The fit path for 20B bf16
    on 16 GB v5e chips."""
    tp = mesh.shape[AXES.tensor]
    if num_heads is not None and num_heads % tp != 0:
        raise ValueError(f"num_heads={num_heads} % tensor={tp} != 0")
    sh = _block_tp_shardings(
        params, mesh, ("blocks",),
        col={"to_q", "to_k", "to_v", "add_q", "add_k", "add_v", "fc1"},
        row={"to_out", "to_add_out", "fc2"})
    return jax.tree.map(jax.device_put, params, sh)


def shard_flux2_dit_params(params: Any, mesh: Mesh, num_heads: int = None):
    """FLUX.2 DiT (32B) tensor sharding: q/k/v (+context adds) by heads,
    output projections row-split, SwiGLU linear_in/linear_out and the
    parallel single-block fused projections col/row-split."""
    tp = mesh.shape[AXES.tensor]
    if num_heads is not None and num_heads % tp != 0:
        raise ValueError(f"num_heads={num_heads} % tensor={tp} != 0")
    sh = _block_tp_shardings(
        params, mesh, ("double_blocks", "single_blocks"),
        col={"to_q", "to_k", "to_v", "add_q", "add_k", "add_v",
             "linear_in", "to_qkv_mlp"},
        row={"to_out", "to_add_out", "linear_out"})
    return jax.tree.map(jax.device_put, params, sh)


def shard_vl_text_params(params: Any, mesh: Mesh, num_heads: int,
                         num_kv_heads: int):
    """Tensor sharding for the shared Qwen2.5-VL/Qwen3/Mistral text stack
    (``models/qwen/text_encoder.py`` layout: per-layer dicts under
    ``layers``): q/gate/up column-split, o/down row-split, k/v
    column-split when the kv heads divide the tensor axis (GQA kv counts
    are small — 4 on Qwen2.5-VL-7B — so they stay replicated on wider
    meshes), embedding split over the hidden dim.  The FLUX.2 Mistral
    encoder is 24B — bigger than any single v5e chip."""
    tensor = AXES.tensor
    tp = mesh.shape[tensor]
    if num_heads % tp != 0:
        raise ValueError(f"num_heads={num_heads} % tensor={tp} != 0")
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, tensor))
    colv = NamedSharding(mesh, P(tensor))
    row = NamedSharding(mesh, P(tensor, None))
    kv_ok = num_kv_heads % tp == 0

    def place(p, sh):
        return jax.tree.map(
            lambda l, s: jax.device_put(l, s), p,
            {k: (sh if k == "w" else
                 (colv if sh is col else rep)) for k in p})

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new = dict(layer)
        for k in ("q", "gate", "up"):
            new[k] = place(layer[k], col)
        for k in ("o", "down"):
            new[k] = place(layer[k], row)
        for k in ("k", "v"):
            new[k] = place(layer[k], col if kv_ok else rep)
        out["layers"].append(new)
    if "embed" in out:
        out["embed"] = jax.device_put(out["embed"],
                                      NamedSharding(mesh, P(None, tensor)))
    return out


def wan_dit_fsdp_shardings(params: Any, mesh: Mesh, min_size: int = 2 ** 16):
    """ZeRO-3 / FSDP-style sharding tree: every large stacked-block weight
    is split over the ``data`` axis along its widest trailing dim.

    The reference has no analogue (torch FSDP is never wired in); on TPU
    this is, again, pure shardings: inside the ``lax.scan`` over blocks
    XLA all-gathers one block's weights per step and the gather overlaps
    the previous block's compute.  Optimizer state built from these params
    (``optimizer.init``) inherits the same layout, so optimizer memory
    shards too — the usual enabler for training the 14B experts on
    16 GB chips.

    Leaves smaller than ``min_size`` elements stay replicated (sharding
    tiny norms/biases costs more in collective latency than it saves).
    """
    data = AXES.data
    rep = NamedSharding(mesh, P())
    n_data = mesh.shape[data]

    def fn(leaf):
        if leaf.ndim < 2 or leaf.size < min_size:
            return rep
        # widest trailing axis divisible by the data-axis size
        for ax in range(leaf.ndim - 1, 0, -1):
            if leaf.shape[ax] % n_data == 0:
                spec = [None] * leaf.ndim
                spec[ax] = data
                return NamedSharding(mesh, P(*spec))
        return rep

    return jax.tree.map(fn, params)


def fsdp_shard_params(params: Any, mesh: Mesh, min_size: int = 2 ** 16):
    """Place params with :func:`wan_dit_fsdp_shardings`."""
    return jax.tree.map(jax.device_put, params,
                        wan_dit_fsdp_shardings(params, mesh, min_size))
