"""HLO collective-structure assertions (VERDICT round-2 item 4).

The multi-chip path is validated numerically (mesh == single-device tests)
and by the driver dryrun, but performance on a real v5e-8 depends on the
COLLECTIVE STRUCTURE the partitioner emits: Ulysses must cost exactly one
all-to-all pair per block, ring must stay on nearest-neighbor
collective-permutes, and tensor parallelism must never all-gather full
weight matrices.  These tests compile the sharded programs on the 8-device
CPU mesh and assert those properties on the optimized HLO, so a partitioner
regression (accidental full-weight all-gather, resharding churn) fails CI
instead of silently costing ICI bandwidth on hardware.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairygen_tpu.core.meshes import make_mesh
from fairygen_tpu.models.wan.dit import (
    WanDiTConfig,
    init_dit_params,
    wan_dit_forward,
)

requires_8dev = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

CFG = WanDiTConfig(
    dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
    patch_size=(1, 2, 2), num_heads=8, num_layers=2,
    seperated_timestep=True, require_clip_embedding=False,
    require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
)


def _compiled_hlo(fn, *args, mesh=None):
    with mesh:
        return jax.jit(fn).lower(*args).compile().as_text()


def _inputs(batch=1):
    lat = jax.random.normal(jax.random.key(2), (batch, 4, 4, 8, 8))
    ts = jnp.full((batch,), 500.0)
    ctx = jax.random.normal(jax.random.key(3), (batch, 12, 32))
    return lat, ts, ctx


def _op_shapes(hlo: str, op: str):
    """All result shapes of `op` instructions in the HLO text."""
    return re.findall(rf"(\S+?)\s+{op}(?:-start)?\(", hlo)


def _count_prims(jaxpr, names, scope="all"):
    """Recursively count primitive occurrences in a (closed) jaxpr.

    scope="scan_body" restricts to the bodies of scan/while primitives —
    i.e. the per-block cost, independent of boundary collectives."""
    counts = {n: 0 for n in names}

    from jax._src import core as jcore

    def subjaxprs(v):
        if isinstance(v, jcore.ClosedJaxpr):
            yield v.jaxpr
        elif isinstance(v, jcore.Jaxpr):
            yield v
        elif isinstance(v, (list, tuple)):
            for item in v:
                yield from subjaxprs(item)

    def walk(jx, in_loop):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in counts and (scope == "all" or in_loop):
                counts[name] += 1
            child_loop = in_loop or name in ("scan", "while")
            for v in eqn.params.values():
                for sub in subjaxprs(v):
                    walk(sub, child_loop)

    walk(jaxpr.jaxpr, scope == "all")
    return counts


@requires_8dev
def test_ulysses_emits_one_all_to_all_pair_per_block():
    mesh = make_mesh(data=1, seq=8)
    params = init_dit_params(jax.random.key(1), CFG)
    lat, ts, ctx = _inputs()

    jaxpr = jax.make_jaxpr(
        lambda p, l, t, c: wan_dit_forward(
            p, CFG, l, t, c, fuse_vae_embedding_in_latents=True, mesh=mesh)
    )(params, lat, ts, ctx)

    # blocks run under lax.scan -> the all-to-all pairs appear ONCE in the
    # loop body: heads-scatter/seq-gather + reverse for SELF attention and
    # the same pair for CROSS attention = exactly 4 (xfuser pays the same
    # per block, xdit_context_parallel.py:140-146); any more means the
    # partitioner started resharding activations per block
    loop = _count_prims(jaxpr, ("all_to_all", "ppermute"), scope="scan_body")
    assert loop["all_to_all"] == 4, loop
    assert loop["ppermute"] == 0, loop
    total = _count_prims(jaxpr, ("all_to_all",))
    # boundary ops stay O(1), not O(blocks)
    assert total["all_to_all"] <= 8, total


@requires_8dev
def test_ring_emits_collective_permute_chain_not_all_to_all():
    mesh = make_mesh(data=1, seq=8)
    params = init_dit_params(jax.random.key(1), CFG)
    lat, ts, ctx = _inputs()

    jaxpr = jax.make_jaxpr(
        lambda p, l, t, c: wan_dit_forward(
            p, CFG, l, t, c, fuse_vae_embedding_in_latents=True, mesh=mesh,
            sp_strategy="ring")
    )(params, lat, ts, ctx)

    counts = _count_prims(jaxpr, ("all_to_all", "ppermute"))
    # kv shards rotate via nearest-neighbor permutes (parallel/ring.py);
    # no head-scatter all-to-alls anywhere in the ring program
    assert counts["all_to_all"] == 0, counts
    assert counts["ppermute"] >= 1, counts


@requires_8dev
def test_tensor_parallel_never_all_gathers_full_weights():
    """Megatron col/row FFN split: the partitioner must emit activation
    all-reduces (psum of the row-split fc2 product), never re-materialize
    the full fc1/fc2 weights via all-gather."""
    from fairygen_tpu.parallel.tensor_parallel import shard_wan_dit_params

    mesh = make_mesh(data=1, seq=1, tensor=8)
    params = init_dit_params(jax.random.key(1), CFG)
    sharded = shard_wan_dit_params(params, mesh, ffn_dim=CFG.ffn_dim)
    lat, ts, ctx = _inputs()

    hlo = _compiled_hlo(
        lambda p, l, t, c: wan_dit_forward(
            p, CFG, l, t, c, fuse_vae_embedding_in_latents=True),
        sharded, lat, ts, ctx, mesh=mesh)

    # any all-gather reconstructing a (dim, ffn_dim) or (ffn_dim, dim)
    # weight would carry ffn_dim in its result shape
    for shape in _op_shapes(hlo, "all-gather"):
        dims = [int(d) for d in re.findall(r"\d+", shape)]
        assert not (CFG.ffn_dim in dims and CFG.dim in dims), (
            f"full FFN weight all-gather found: {shape}")
    assert " all-reduce" in hlo, "row-split fc2 must psum its partial sums"


@requires_8dev
def test_flux_tensor_parallel_no_weight_gather():
    """FLUX 12B fit path: qkv/FFN col+row splits must stay weight-stationary
    (weights never all-gathered), with activation all-reduces only."""
    from fairygen_tpu.models.flux.dit import (
        FluxDiTConfig,
        flux_dit_forward,
        init_flux_dit_params,
    )
    from fairygen_tpu.parallel.tensor_parallel import shard_flux_dit_params

    cfg = FluxDiTConfig(
        dim=128, num_heads=8, num_double_blocks=1, num_single_blocks=1,
        context_dim=32, pooled_dim=16, in_dim=64, guidance_embed=False,
        axes_dim=(4, 6, 6))
    params = init_flux_dit_params(jax.random.key(0), cfg)
    mesh = make_mesh(data=1, seq=1, tensor=8)
    sharded = shard_flux_dit_params(params, mesh, num_heads=cfg.num_heads)

    lat = jax.random.normal(jax.random.key(1), (1, 16, 8, 8))
    t = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.key(2), (1, 12, 32))
    pooled = jax.random.normal(jax.random.key(3), (1, 16))

    def fn(p, l, tt, c, pl):
        return flux_dit_forward(p, cfg, l, tt, c, pl)

    hlo = _compiled_hlo(fn, sharded, lat, t, ctx, pooled, mesh=mesh)
    ffn = cfg.dim * 4
    for shape in _op_shapes(hlo, "all-gather"):
        dims = [int(d) for d in re.findall(r"\d+", shape)]
        assert not (ffn in dims and cfg.dim in dims), (
            f"full weight all-gather found: {shape}")


@requires_8dev
def test_data_parallel_train_step_single_gradient_allreduce_family():
    """DP training: gradients sync via all-reduce (psum); the step must not
    all-to-all or permute anything."""
    import optax

    from fairygen_tpu.training.train_step import make_wan_sft_train_step

    mesh = make_mesh(data=8, seq=1)
    params = init_dit_params(jax.random.key(1), CFG)
    init_state, train_step = make_wan_sft_train_step(
        CFG, optax.adam(1e-4), mesh=mesh, remat=False)
    state = init_state(params)
    batch = {
        "latents": jax.random.normal(jax.random.key(2), (8, 4, 4, 8, 8)),
        "context": jax.random.normal(jax.random.key(3), (8, 12, 32)),
    }
    with mesh:
        hlo = jax.jit(train_step).lower(
            state, batch, jax.random.key(0)).compile().as_text()
    assert " all-reduce" in hlo
    assert " all-to-all" not in hlo
    assert " collective-permute" not in hlo
