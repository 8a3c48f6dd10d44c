"""GPipe pipeline parallelism over the DiT block stack (parallel/pipeline.py).

Beyond-reference capability: the reference has NO pipeline parallelism
(SURVEY.md §2.5 — its scale-out is DDP only, animation/train.py:126-129).
These tests assert the PP schedule is bit-exact vs the dense block scan,
in forward, remat-forward, and gradients, and that the HLO actually
contains the stage-hop collective.
"""
import jax
import jax.numpy as jnp
import pytest

from fairygen_tpu.core.meshes import make_mesh
from fairygen_tpu.models.wan.dit import (
    WanDiTConfig, init_dit_params, wan_dit_forward)
from fairygen_tpu.parallel.pipeline import shard_blocks_over_pipe


@pytest.fixture(scope="module")
def tiny():
    cfg = WanDiTConfig(
        dim=96, in_dim=4, ffn_dim=192, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=4,
        seperated_timestep=True, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
    )
    params = init_dit_params(jax.random.key(0), cfg)
    B = 4
    lat = jax.random.normal(jax.random.key(1), (B, 4, 4, 8, 16))
    ctx = jax.random.normal(jax.random.key(2), (B, 12, 32))
    ts = jnp.full((B,), 500.0)
    dense = jax.jit(lambda p, l, c: wan_dit_forward(
        p, cfg, l, ts, c, fuse_vae_embedding_in_latents=True))(
            params, lat, ctx)
    return cfg, params, lat, ctx, ts, dense


def test_pp_forward_matches_dense(tiny):
    cfg, params, lat, ctx, ts, dense = tiny
    mesh = make_mesh(data=2, pipe=4)
    params = shard_blocks_over_pipe(params, mesh)
    pp = jax.jit(lambda p, l, c: wan_dit_forward(
        p, cfg, l, ts, c, fuse_vae_embedding_in_latents=True,
        pp_mesh=mesh, pp_microbatches=2))(params, lat, ctx)
    assert float(jnp.abs(pp - dense).max()) < 1e-5


def test_pp_remat_matches_dense(tiny):
    cfg, params, lat, ctx, ts, dense = tiny
    mesh = make_mesh(data=2, pipe=4)
    pp = jax.jit(lambda p, l, c: wan_dit_forward(
        p, cfg, l, ts, c, fuse_vae_embedding_in_latents=True,
        pp_mesh=mesh, pp_microbatches=2, remat=True))(params, lat, ctx)
    assert float(jnp.abs(pp - dense).max()) < 1e-5


def test_pp_microbatch_count_invariance(tiny):
    cfg, params, lat, ctx, ts, dense = tiny
    mesh = make_mesh(data=1, pipe=4, devices=jax.devices()[:4])
    for m in (1, 4):
        pp = jax.jit(lambda p, l, c, m=m: wan_dit_forward(
            p, cfg, l, ts, c, fuse_vae_embedding_in_latents=True,
            pp_mesh=mesh, pp_microbatches=m))(params, lat, ctx)
        assert float(jnp.abs(pp - dense).max()) < 1e-5, m


def test_pp_gradients_match_dense(tiny):
    cfg, params, lat, ctx, ts, _ = tiny
    mesh = make_mesh(data=2, pipe=4)

    def loss(p, pp):
        o = wan_dit_forward(
            p, cfg, lat, ts, ctx, fuse_vae_embedding_in_latents=True,
            remat=True,
            **({"pp_mesh": mesh, "pp_microbatches": 2} if pp else {}))
        return (o.astype(jnp.float32) ** 2).mean()

    g_pp = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    g_d = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    errs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_pp, g_d)
    assert max(jax.tree_util.tree_leaves(errs)) < 1e-4


def test_pp_hlo_has_stage_hop(tiny):
    cfg, params, lat, ctx, ts, _ = tiny
    mesh = make_mesh(data=2, pipe=4)
    txt = jax.jit(lambda p, l, c: wan_dit_forward(
        p, cfg, l, ts, c, fuse_vae_embedding_in_latents=True,
        pp_mesh=mesh, pp_microbatches=2)).lower(
            params, lat, ctx).compile().as_text()
    # stage→stage+1 activation hop (ppermute lowers to collective-permute)
    assert "collective-permute" in txt


def test_pp_rejects_bad_split(tiny):
    cfg, params, lat, ctx, ts, _ = tiny
    mesh = make_mesh(data=1, pipe=8)  # 4 layers % 8 stages != 0
    with pytest.raises(ValueError, match="num_layers"):
        wan_dit_forward(
            params, cfg, lat, ts, ctx, fuse_vae_embedding_in_latents=True,
            pp_mesh=mesh, pp_microbatches=2)
