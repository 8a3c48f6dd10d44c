"""Multi-device SPMD tests on a virtual 8-device CPU mesh.

The reference has no multi-device harness at all (SURVEY.md §4); this is
the TPU-native answer — shardings validated without a cluster.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from fairygen_tpu.core.meshes import make_mesh
from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params, wan_dit_forward
from fairygen_tpu.ops.attention import xla_attention
from fairygen_tpu.parallel.ulysses import make_ulysses_attention
from fairygen_tpu.training.train_step import make_wan_sft_train_step

requires_8dev = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

CFG = WanDiTConfig(
    dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
    patch_size=(1, 2, 2), num_heads=8, num_layers=2,
    seperated_timestep=True, require_clip_embedding=False,
    require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
)


@requires_8dev
@pytest.mark.slow
def test_ulysses_matches_dense():
    mesh = make_mesh(data=1, seq=8)
    key = jax.random.key(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (2, 32, 8, 16))
    k = jax.random.normal(ks[1], (2, 32, 8, 16))
    v = jax.random.normal(ks[2], (2, 32, 8, 16))
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        out = jax.jit(make_ulysses_attention(mesh))(q, k, v)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@requires_8dev
@pytest.mark.slow
def test_dit_forward_seq_parallel_matches_single():
    mesh = make_mesh(data=1, seq=8)
    params = init_dit_params(jax.random.key(1), CFG)
    lat = jax.random.normal(jax.random.key(2), (1, 4, 4, 8, 8))
    ts = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.key(3), (1, 12, 32))

    ref = wan_dit_forward(params, CFG, lat, ts, ctx, fuse_vae_embedding_in_latents=True)
    with mesh:
        out = jax.jit(
            lambda p, l, t, c: wan_dit_forward(
                p, CFG, l, t, c, fuse_vae_embedding_in_latents=True, mesh=mesh
            )
        )(params, lat, ts, ctx)
    # token count 4*4*4=64 divides 8 -> no padding, exact match expected
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@requires_8dev
@pytest.mark.slow
def test_data_parallel_train_step():
    mesh = make_mesh(data=8, seq=1)
    init_state, train_step = make_wan_sft_train_step(
        CFG, optax.adamw(1e-4), mesh=mesh, remat=True
    )
    params = init_dit_params(jax.random.key(0), CFG)
    state = init_state(params)
    batch = {
        "latents": jax.random.normal(jax.random.key(1), (8, 4, 4, 8, 8)),
        "context": jax.random.normal(jax.random.key(2), (8, 12, 32)),
    }
    with mesh:
        state, loss = train_step(state, batch, jax.random.key(3))
        state, loss2 = train_step(state, batch, jax.random.key(4))
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert int(state.step) == 2


@requires_8dev
@pytest.mark.slow
def test_dp_sp_combined_train_step():
    mesh = make_mesh(data=2, seq=4)
    init_state, train_step = make_wan_sft_train_step(
        CFG, optax.adamw(1e-4), mesh=mesh, remat=False
    )
    params = init_dit_params(jax.random.key(0), CFG)
    state = init_state(params)
    batch = {
        "latents": jax.random.normal(jax.random.key(1), (2, 4, 4, 8, 8)),
        "context": jax.random.normal(jax.random.key(2), (2, 12, 32)),
    }
    with mesh:
        state, loss = train_step(state, batch, jax.random.key(3))
    assert np.isfinite(float(loss))


@requires_8dev
@pytest.mark.slow
def test_dit_seq_parallel_ragged_padding():
    """Token count NOT divisible by the seq axis -> pad/mask path.

    Unlike the reference (which pads per-rank chunks with zeros and lets
    padded kv tokens attend, xdit_context_parallel.py:95-99), the padded kv
    columns are masked EXACTLY via kv_len, so the sharded run must match
    the dense run to float tolerance."""
    mesh = make_mesh(data=1, seq=8)
    cfg = WanDiTConfig(
        dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=8, num_layers=2,
        seperated_timestep=True, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
    )
    params = init_dit_params(jax.random.key(1), cfg)
    # 3*5*4 = 60 tokens -> pads to 64 over 8 shards
    lat = jax.random.normal(jax.random.key(2), (1, 4, 3, 10, 8)) * 0.3
    ts = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.key(3), (1, 12, 32))

    ref = wan_dit_forward(params, cfg, lat, ts, ctx, fuse_vae_embedding_in_latents=True)
    with mesh:
        out = jax.jit(
            lambda p, l, t, c: wan_dit_forward(
                p, cfg, l, t, c, fuse_vae_embedding_in_latents=True, mesh=mesh
            )
        )(params, lat, ts, ctx)
    err = float(jnp.abs(out - ref).max())
    scale = float(jnp.abs(ref).max())
    # exact kv-padding mask: only float reassociation noise remains
    assert err / scale < 1e-3, (err, scale)


@requires_8dev
@pytest.mark.slow
def test_ring_attention_matches_dense():
    from fairygen_tpu.parallel.ring import make_ring_attention

    mesh = make_mesh(data=1, seq=8)
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (2, 32, 8, 16))
    k = jax.random.normal(ks[1], (2, 32, 8, 16))
    v = jax.random.normal(ks[2], (2, 32, 8, 16))
    with mesh:
        out = jax.jit(make_ring_attention(mesh))(q, k, v)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@requires_8dev
@pytest.mark.slow
def test_ring_attention_odd_heads():
    """Ring has no num_heads % n_shards constraint (Ulysses does): 6 heads
    over an 8-way seq axis."""
    from fairygen_tpu.parallel.ring import make_ring_attention

    mesh = make_mesh(data=1, seq=8)
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (1, 64, 6, 16))
    k = jax.random.normal(ks[1], (1, 64, 6, 16))
    v = jax.random.normal(ks[2], (1, 64, 6, 16))
    with mesh:
        out = jax.jit(make_ring_attention(mesh))(q, k, v)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@requires_8dev
@pytest.mark.slow
def test_ring_attention_ragged_kv_exact():
    """kv padding columns are masked per visiting chunk: pad 60 -> 64
    tokens, ring result must equal dense attention on the REAL 60."""
    from fairygen_tpu.parallel.ring import make_ring_attention

    mesh = make_mesh(data=1, seq=8)
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], (1, 60, 8, 16))
    k = jax.random.normal(ks[1], (1, 60, 8, 16))
    v = jax.random.normal(ks[2], (1, 60, 8, 16))
    pad = [(0, 0), (0, 4), (0, 0), (0, 0)]
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    with mesh:
        out = jax.jit(make_ring_attention(mesh, kv_len=60))(qp, kp, vp)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out)[:, :60], np.asarray(ref),
                               atol=1e-5)


@requires_8dev
@pytest.mark.slow
def test_dit_forward_ring_matches_single():
    mesh = make_mesh(data=1, seq=8)
    params = init_dit_params(jax.random.key(1), CFG)
    lat = jax.random.normal(jax.random.key(2), (1, 4, 3, 10, 8)) * 0.3
    ts = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.key(3), (1, 12, 32))

    ref = wan_dit_forward(params, CFG, lat, ts, ctx,
                          fuse_vae_embedding_in_latents=True)
    with mesh:
        out = jax.jit(
            lambda p, l, t, c: wan_dit_forward(
                p, CFG, l, t, c, fuse_vae_embedding_in_latents=True,
                mesh=mesh, sp_strategy="ring",
            )
        )(params, lat, ts, ctx)
    err = float(jnp.abs(out - ref).max())
    scale = float(jnp.abs(ref).max())
    assert err / scale < 1e-3, (err, scale)


@requires_8dev
@pytest.mark.slow
def test_ffn_tensor_parallel_matches_single():
    """FFN weights split over the tensor axis (Megatron column/row split
    via shardings only) — forward matches the unsharded program."""
    from fairygen_tpu.parallel.tensor_parallel import shard_wan_dit_params

    mesh = make_mesh(data=1, seq=1, tensor=8)
    params = init_dit_params(jax.random.key(1), CFG)
    lat = jax.random.normal(jax.random.key(2), (1, 4, 4, 8, 8))
    ts = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.key(3), (1, 12, 32))

    ref = wan_dit_forward(params, CFG, lat, ts, ctx,
                          fuse_vae_embedding_in_latents=True)
    sharded = shard_wan_dit_params(params, mesh, ffn_dim=CFG.ffn_dim)
    # fc1 columns really live split across devices
    fc1 = sharded["blocks"]["ffn"]["fc1"]["w"]
    assert len({s.device for s in fc1.addressable_shards}) == 8
    assert fc1.addressable_shards[0].data.shape[-1] == CFG.ffn_dim // 8
    out = jax.jit(
        lambda p, l, t, c: wan_dit_forward(
            p, CFG, l, t, c, fuse_vae_embedding_in_latents=True)
    )(sharded, lat, ts, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@requires_8dev
@pytest.mark.slow
def test_dp_sp_tp_combined_forward():
    """All three mesh axes at once: batch over data, tokens over seq
    (Ulysses), FFN over tensor."""
    from fairygen_tpu.parallel.tensor_parallel import shard_wan_dit_params

    mesh = make_mesh(data=2, seq=2, tensor=2)
    params = init_dit_params(jax.random.key(1), CFG)
    lat = jax.random.normal(jax.random.key(2), (2, 4, 4, 8, 8))
    ts = jnp.asarray([500.0, 500.0])
    ctx = jax.random.normal(jax.random.key(3), (2, 12, 32))

    ref = wan_dit_forward(params, CFG, lat, ts, ctx,
                          fuse_vae_embedding_in_latents=True)
    sharded = shard_wan_dit_params(params, mesh, ffn_dim=CFG.ffn_dim)
    with mesh:
        out = jax.jit(
            lambda p, l, t, c: wan_dit_forward(
                p, CFG, l, t, c, fuse_vae_embedding_in_latents=True,
                mesh=mesh)
        )(sharded, lat, ts, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@requires_8dev
@pytest.mark.slow
def test_fsdp_train_step_matches_replicated():
    """ZeRO-3 weight sharding over the data axis: same loss/updates as the
    replicated run, with block weights actually split across devices."""
    from fairygen_tpu.parallel.tensor_parallel import fsdp_shard_params

    mesh = make_mesh(data=4, seq=2)
    init_state, train_step = make_wan_sft_train_step(
        CFG, optax.adamw(1e-3), mesh=mesh, remat=False)
    params = init_dit_params(jax.random.key(1), CFG)
    batch = {
        "latents": jax.random.normal(jax.random.key(2), (4, 4, 4, 8, 8)),
        "context": jax.random.normal(jax.random.key(3), (4, 12, 32)),
    }
    with mesh:
        state = init_state(params)
        _, loss_ref = train_step(state, batch, jax.random.key(4))

        sharded = fsdp_shard_params(params, mesh, min_size=1024)
        fc1 = sharded["blocks"]["ffn"]["fc1"]["w"]
        assert fc1.addressable_shards[0].data.shape != fc1.shape  # really split
        state2 = init_state(sharded)
        new_state, loss = train_step(state2, batch, jax.random.key(4))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)
    # optimizer state inherited the sharded layout (memory actually saved)
    mu = new_state.opt_state[0].mu["blocks"]["ffn"]["fc1"]["w"]
    assert mu.addressable_shards[0].data.shape != mu.shape


@requires_8dev
@pytest.mark.slow
def test_flux_fsdp_forward_matches_dense():
    """FLUX params FSDP-sharded over the data axis (the route that fits the
    12B model on multi-chip): jit gathers blocks on demand inside the scan;
    output matches the dense run."""
    from fairygen_tpu.models.flux.dit import (
        FluxDiTConfig,
        flux_dit_forward,
        init_flux_dit_params,
    )
    from fairygen_tpu.parallel.tensor_parallel import fsdp_shard_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = FluxDiTConfig.tiny()
    mesh = make_mesh(data=8, seq=1)
    params = init_flux_dit_params(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (8, 4, 8, 8)) * 0.3
    ts = jnp.full((8,), 400.0)
    ctx = jax.random.normal(jax.random.key(2), (8, 6, cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(3), (8, cfg.pooled_dim))
    guid = jnp.full((8,), 3.5)

    ref = flux_dit_forward(params, cfg, lat, ts, ctx, pooled, guid)

    sharded = fsdp_shard_params(params, mesh, min_size=2 ** 10)
    batch_sh = NamedSharding(mesh, P("data"))
    lat_s = jax.device_put(lat, batch_sh)
    with mesh:
        out = jax.jit(
            lambda p, l, c, pl: flux_dit_forward(p, cfg, l, ts, c, pl, guid)
        )(sharded, lat_s, jax.device_put(ctx, batch_sh),
          jax.device_put(pooled, batch_sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_multihost_mesh_single_host():
    """make_multihost_mesh degenerates to the plain mesh on one host and
    rejects seq/tensor that would cross DCN."""
    from fairygen_tpu.parallel.multihost import (
        initialize_multihost, make_multihost_mesh,
    )

    assert initialize_multihost() is False  # single process: no-op
    mesh = make_multihost_mesh(seq=2, tensor=2)
    assert dict(mesh.shape) == {"data": 2, "seq": 2, "tensor": 2}
    with pytest.raises(ValueError):
        make_multihost_mesh(seq=16)  # exceeds one host's devices
    with pytest.raises(ValueError):
        make_multihost_mesh(data=3, seq=2)  # 3*2 != 8


def test_multihost_mesh_runs_train_step():
    from fairygen_tpu.parallel.multihost import make_multihost_mesh

    mesh = make_multihost_mesh(seq=2)
    init_state, train_step = make_wan_sft_train_step(
        CFG, optax.adamw(1e-3), mesh=mesh, remat=False)
    params = init_dit_params(jax.random.key(1), CFG)
    batch = {
        "latents": jax.random.normal(jax.random.key(2), (4, 4, 4, 8, 8)),
        "context": jax.random.normal(jax.random.key(3), (4, 12, 32)),
    }
    with mesh:
        state = init_state(params)
        _, loss = train_step(state, batch, jax.random.key(4))
    assert np.isfinite(float(loss))


@requires_8dev
@pytest.mark.slow
def test_flux_tensor_parallel_matches_single():
    """FLUX DiT weights sharded over the tensor axis (head-aligned qkv +
    Megatron FFN splits, parallel/tensor_parallel.py) — forward matches
    the unsharded program; the fit path for 12B FLUX on v5e chips."""
    from fairygen_tpu.models.flux.dit import (
        FluxDiTConfig,
        flux_dit_forward,
        init_flux_dit_params,
    )
    from fairygen_tpu.parallel.tensor_parallel import shard_flux_dit_params

    cfg = FluxDiTConfig.tiny()
    mesh = make_mesh(data=2, seq=1, tensor=4)
    params = init_flux_dit_params(jax.random.key(5), cfg)
    lat = jax.random.normal(jax.random.key(6), (1, 4, 8, 12))
    ts = jnp.asarray([500.0])
    pe = jax.random.normal(jax.random.key(7), (1, 6, cfg.context_dim))
    pl = jax.random.normal(jax.random.key(8), (1, cfg.pooled_dim))
    gd = jnp.asarray([3.5])

    ref = flux_dit_forward(params, cfg, lat, ts, pe, pl, gd)
    sharded = shard_flux_dit_params(params, mesh, num_heads=cfg.num_heads)
    fc1 = sharded["double_blocks"]["ff_a"]["fc1"]["w"]
    assert fc1.addressable_shards[0].data.shape[-1] == 4 * cfg.dim // 4
    qkv = sharded["double_blocks"]["attn"]["a_qkv"]["w"]
    assert qkv.addressable_shards[0].data.shape[-1] == 3 * cfg.dim // 4
    out = jax.jit(lambda p, l, t, c, po, g: flux_dit_forward(
        p, cfg, l, t, c, po, g))(sharded, lat, ts, pe, pl, gd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@requires_8dev
@pytest.mark.slow
def test_qwen_flux2_tensor_parallel_match_single():
    """Qwen-Image (20B) and FLUX.2 (32B) DiT weight shardings — sharded
    forwards exactly equal the unsharded programs."""
    from fairygen_tpu.models.flux2.dit import (
        Flux2DiTConfig,
        flux2_dit_forward,
        init_flux2_dit_params,
    )
    from fairygen_tpu.models.qwen.dit import (
        QwenImageDiTConfig,
        init_qwen_image_dit_params,
        qwen_image_dit_forward,
    )
    from fairygen_tpu.parallel.tensor_parallel import (
        shard_flux2_dit_params,
        shard_qwen_image_dit_params,
    )

    mesh = make_mesh(data=2, seq=1, tensor=4)

    qcfg = QwenImageDiTConfig.tiny()
    qp = init_qwen_image_dit_params(jax.random.key(11), qcfg)
    lat = jax.random.normal(jax.random.key(12), (1, 4, 8, 12))
    ts = jnp.asarray([500.0])
    pe = jax.random.normal(jax.random.key(13), (1, 6, qcfg.txt_dim))
    ref = qwen_image_dit_forward(qp, qcfg, lat, ts, pe)
    qps = shard_qwen_image_dit_params(qp, mesh, num_heads=qcfg.num_heads)
    assert qps["blocks"]["attn"]["to_q"]["w"].addressable_shards[0].data \
        .shape[-1] == qcfg.dim // 4
    out = jax.jit(lambda p, l, t, c: qwen_image_dit_forward(
        p, qcfg, l, t, c))(qps, lat, ts, pe)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    from fairygen_tpu.models.flux2.dit import prepare_image_ids as pii2

    fcfg = Flux2DiTConfig.tiny()
    fp = init_flux2_dit_params(jax.random.key(14), fcfg)
    lat2 = jax.random.normal(jax.random.key(15), (1, 24, fcfg.in_channels))
    ctx = jax.random.normal(jax.random.key(16),
                            (1, 6, fcfg.joint_attention_dim))
    ids = pii2(4, 6)
    ref2 = flux2_dit_forward(fp, fcfg, lat2, ts / 1000.0, ctx,
                             jnp.asarray([3.5]), img_ids=ids)
    fps = shard_flux2_dit_params(fp, mesh, num_heads=fcfg.num_heads)
    out2 = jax.jit(lambda p, l, t, c, g: flux2_dit_forward(
        p, fcfg, l, t, c, g, img_ids=ids))(
        fps, lat2, ts / 1000.0, ctx, jnp.asarray([3.5]))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-5)


@requires_8dev
@pytest.mark.slow
def test_vl_text_tensor_parallel_matches_single():
    """The shared VL text stack sharded over tensor (q/gate/up col, o/down
    row, GQA kv col when divisible) — encode matches unsharded."""
    from fairygen_tpu.models.qwen.text_encoder import (
        QwenVLTextConfig,
        qwen_vl_text_encode,
    )
    from fairygen_tpu.parallel.tensor_parallel import shard_vl_text_params

    cfg = QwenVLTextConfig.tiny()
    mesh = make_mesh(data=2, seq=1, tensor=4)
    key = jax.random.key(21)

    def dense(k, i, o):
        return {"w": jax.random.normal(k, (i, o)) * 0.05,
                "b": jnp.zeros((o,))}

    d, m = cfg.dim, cfg.ffn_dim
    nh, nk, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    layers = []
    for i in range(cfg.num_layers):
        kk = jax.random.fold_in(key, i)
        ks = jax.random.split(kk, 7)
        layers.append({
            "ln1": jnp.ones((d,)), "ln2": jnp.ones((d,)),
            "q": dense(ks[0], d, nh * hd), "k": dense(ks[1], d, nk * hd),
            "v": dense(ks[2], d, nk * hd), "o": dense(ks[3], nh * hd, d),
            "gate": dense(ks[4], d, m), "up": dense(ks[5], d, m),
            "down": dense(ks[6], m, d),
        })
    params = {"embed": jax.random.normal(key, (cfg.vocab, d)) * 0.05,
              "layers": layers, "norm": jnp.ones((d,))}
    ids = jnp.asarray([[3, 5, 7, 11, 13, 2]])
    ref = qwen_vl_text_encode(params, cfg, ids)
    sharded = shard_vl_text_params(params, mesh, nh, nk)
    out = jax.jit(lambda p: qwen_vl_text_encode(p, cfg, ids))(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
