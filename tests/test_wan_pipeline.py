"""End-to-end TI2V pipeline parity vs a reference-composed denoise loop."""
import numpy as np
import pytest
import jax.numpy as jnp

from fairygen_tpu.models.wan.dit import WanDiTConfig, convert_dit_state_dict
from fairygen_tpu.models.wan.vae import WanVAEConfig, convert_vae38_state_dict
from fairygen_tpu.pipelines.wan_video import WanVideoPipeline

DIT_CFG = WanDiTConfig(
    dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
    patch_size=(1, 2, 2), num_heads=4, num_layers=2,
    seperated_timestep=True, require_clip_embedding=False,
    require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
)
VAE_CFG = WanVAEConfig.tiny()


def _pipe(g):
    dit_sd = {k[5:]: g[k] for k in g.files if k.startswith("dit::")}
    vae_sd = {k[5:]: g[k] for k in g.files if k.startswith("vae::")}
    return WanVideoPipeline(
        dit_params=convert_dit_state_dict(dit_sd, DIT_CFG),
        dit_cfg=DIT_CFG,
        vae_params=convert_vae38_state_dict(vae_sd, VAE_CFG),
        vae_cfg=VAE_CFG,
        dtype=jnp.float32,
    )


@pytest.mark.slow
def test_ti2v_end_to_end(goldens):
    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    video = pipe(
        context=jnp.asarray(g["ctx_p"]),
        negative_context=jnp.asarray(g["ctx_n"]),
        input_image=g["img_uint8"],
        seed=42,
        height=32, width=32, num_frames=9,
        cfg_scale=5.0, cfg_merge=False,
        num_inference_steps=4, sigma_shift=5.0,
        output_type="floatpoint",
        torch_compat_noise=True,
    )
    np.testing.assert_allclose(np.asarray(video), g["video"], atol=2e-3, rtol=1e-2)


@pytest.mark.slow
def test_vae_frames_per_chunk_end_to_end(goldens):
    """vae_frames_per_chunk only changes decode batching, not the output
    (same causal math; fp-reassociation drift only)."""
    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    kwargs = dict(
        context=jnp.asarray(g["ctx_p"]),
        negative_context=jnp.asarray(g["ctx_n"]),
        input_image=g["img_uint8"],
        seed=42, height=32, width=32, num_frames=9,
        cfg_scale=5.0, cfg_merge=False,
        num_inference_steps=2, sigma_shift=5.0,
        output_type="floatpoint", torch_compat_noise=True,
        streaming_vae=True,
    )
    base = pipe(**kwargs)
    chunked = pipe(vae_frames_per_chunk=2, **kwargs)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(base),
                               atol=1e-5)


def test_cfg_merge_matches_separate(goldens):
    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    kwargs = dict(
        context=jnp.asarray(g["ctx_p"]),
        negative_context=jnp.asarray(g["ctx_n"]),
        input_image=g["img_uint8"],
        seed=42, height=32, width=32, num_frames=9,
        cfg_scale=5.0, num_inference_steps=4, sigma_shift=5.0,
        output_type="latents", torch_compat_noise=True,
    )
    a = pipe(cfg_merge=False, **kwargs)
    b = pipe(cfg_merge=True, **kwargs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_t2v_shapes(goldens):
    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    video = pipe(
        context=jnp.asarray(g["ctx_p"]),
        cfg_scale=1.0,
        seed=0, height=32, width=32, num_frames=5,
        num_inference_steps=2, output_type="floatpoint",
    )
    assert video.shape == (1, 3, 5, 32, 32)


@pytest.mark.slow
def test_i2v_conditioning_mask_layout(goldens):
    """encode_i2v_conditioning: mask packing matches the reference math
    (wan_video.py:457-474) and y channels follow."""
    import numpy as np
    from fairygen_tpu.models.wan.vae import WanVAEConfig, convert_vae_v1_state_dict

    g = np.load("tests/goldens/wan_vae_v1.npz")
    vcfg = WanVAEConfig.tiny_v1()
    vae_params = convert_vae_v1_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("sd::")}, vcfg)
    pipe = WanVideoPipeline(
        dit_params=None, dit_cfg=DIT_CFG, vae_params=vae_params, vae_cfg=vcfg,
        dtype=jnp.float32,
    )
    H = W = 32
    F = 9
    rs = np.random.RandomState(3)
    img = rs.randint(0, 255, (H, W, 3), np.uint8)
    y = pipe.encode_i2v_conditioning(img, H, W, F)
    # mask channels (4) + z channels (4 in tiny), latent T = (F-1)/4+1 = 3
    assert y.shape == (1, 8, 3, H // 8, W // 8)
    m = np.asarray(y[0, :4])
    # first latent frame covers the 4-fold repeated frame-0 mask -> all ones
    np.testing.assert_allclose(m[:, 0], np.ones_like(m[:, 0]))
    # later latent frames all zero mask
    np.testing.assert_allclose(m[:, 1:], np.zeros_like(m[:, 1:]))


def _full_kwargs(g, **over):
    kwargs = dict(
        context=jnp.asarray(g["ctx_p"]),
        negative_context=jnp.asarray(g["ctx_n"]),
        input_image=g["img_uint8"],
        seed=42, height=32, width=32, num_frames=9,
        cfg_scale=5.0, num_inference_steps=4, sigma_shift=5.0,
        output_type="latents", torch_compat_noise=True,
    )
    kwargs.update(over)
    return kwargs


def test_no_retrace_across_prompts(goldens):
    """The denoise program must be cached across calls: new prompts/seeds
    reuse the compiled chunk (round-1 rebuilt a fresh jit closure per call,
    baking the context in as a constant — ADVICE.md item 2)."""
    from fairygen_tpu.pipelines.wan_video import _denoise_chunk

    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    pipe(**_full_kwargs(g))
    size0 = _denoise_chunk._cache_size()
    assert size0 > 0
    pipe(**_full_kwargs(
        g,
        context=jnp.asarray(g["ctx_p"]) + 0.5,
        negative_context=jnp.asarray(g["ctx_n"]) * 2.0,
        seed=7,
    ))
    assert _denoise_chunk._cache_size() == size0


@pytest.mark.slow
def test_pipeline_mesh_matches_single_device(goldens):
    """Ulysses SP through pipe(__call__) — VERDICT round-1 gap 2: the mesh
    must reach wan_dit_forward inside the denoise loop.  64x64 -> 12 tokens,
    exactly divisible by seq=4 (no ragged padding), so outputs match the
    single-device run."""
    from fairygen_tpu.core.meshes import make_mesh
    import jax

    g = goldens("wan_pipeline")
    kwargs = _full_kwargs(g, height=64, width=64)
    ref = np.asarray(_pipe(g)(**kwargs))

    mesh = make_mesh(data=1, seq=4, devices=jax.devices()[:4])
    out = np.asarray(_pipe(g).use_mesh(mesh)(**kwargs))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_pipeline_mesh_ring_matches_single_device(goldens):
    """Ring (context-parallel) SP through pipe(__call__): sp_strategy='ring'
    rotates kv shards via ppermute (parallel/ring.py) — same result as the
    single-device run, including ragged token counts (ring masks padded kv
    per visiting chunk)."""
    from fairygen_tpu.core.meshes import make_mesh
    import jax

    g = goldens("wan_pipeline")
    kwargs = _full_kwargs(g, height=64, width=64)
    ref = np.asarray(_pipe(g)(**kwargs))

    mesh = make_mesh(data=1, seq=4, devices=jax.devices()[:4])
    out = np.asarray(_pipe(g).use_mesh(mesh, sp_strategy="ring")(**kwargs))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_pipeline_mesh_cfg_merge_data_parallel(goldens):
    """cfg_merge makes the DiT batch 2 — shardable over data=2 on top of
    seq=2 (posi/nega branches run on disjoint device rows)."""
    from fairygen_tpu.core.meshes import make_mesh
    import jax

    g = goldens("wan_pipeline")
    kwargs = _full_kwargs(g, height=64, width=64, cfg_merge=True)
    ref = np.asarray(_pipe(g)(**kwargs))
    mesh = make_mesh(data=2, seq=2, devices=jax.devices()[:4])
    out = np.asarray(_pipe(g).use_mesh(mesh)(**kwargs))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_tea_cache_always_calc_matches_baseline(goldens):
    """A -inf threshold forces recompute every step (the rescaled-drift
    polynomial can be negative, so 0.0 does NOT mean always-calc) ->
    equal to the un-cached pipeline (gate wiring is a no-op)."""
    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    ref = np.asarray(pipe(**_full_kwargs(g)))
    out = np.asarray(pipe(**_full_kwargs(g, tea_cache_l1_thresh=-1e30,
                                         tea_cache_model_id="Wan2.1-T2V-1.3B")))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_tea_cache_skips_engage(goldens):
    """A huge threshold forces residual reuse on non-edge steps — output
    differs from baseline but stays finite (reference wan_video.py:1037)."""
    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    ref = np.asarray(pipe(**_full_kwargs(g)))
    out = np.asarray(pipe(**_full_kwargs(g, tea_cache_l1_thresh=1e9,
                                         tea_cache_model_id="Wan2.1-T2V-1.3B")))
    assert np.isfinite(out).all()
    assert not np.allclose(out, ref, atol=1e-4)


@pytest.mark.slow
def test_sliding_window_full_cover_matches_dense(goldens):
    """A window covering the whole clip (size=stride=T) must equal the
    non-windowed path (single window, unity blend mask)."""
    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    ref = np.asarray(pipe(**_full_kwargs(g)))
    out = np.asarray(pipe(**_full_kwargs(g, sliding_window_size=3,
                                         sliding_window_stride=3)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sliding_window_overlap_shapes(goldens):
    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    out = pipe(**_full_kwargs(g, sliding_window_size=2,
                              sliding_window_stride=1))
    assert out.shape == (1, 4, 3, 2, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_tiled_vae_decode_through_call(goldens):
    """tiled=True routes the decode through vae38_tiled_decode; a tile
    covering the full latent equals the plain decode."""
    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    kwargs = _full_kwargs(g, output_type="floatpoint")
    ref = np.asarray(pipe(**kwargs))
    out = np.asarray(pipe(**kwargs, tiled=True, tile_size=(2, 2),
                          tile_stride=(2, 2)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_i2v_y_conditioning_reaches_dit(goldens):
    """ADVICE item 1: with a require_vae_embedding config, input_image must
    produce the mask+y conditioning and change the DiT output (round-1
    silently degraded to T2V)."""
    import jax
    from fairygen_tpu.models.wan.dit import init_dit_params
    from fairygen_tpu.models.wan.vae import convert_vae_v1_state_dict

    g = np.load("tests/goldens/wan_vae_v1.npz")
    vcfg = WanVAEConfig.tiny_v1()
    vae_params = convert_vae_v1_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("sd::")}, vcfg)
    dcfg = WanDiTConfig(
        dim=96, in_dim=12, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=False, require_clip_embedding=False,
        require_vae_embedding=True, fuse_vae_embedding_in_latents=False,
    )
    pipe = WanVideoPipeline(
        dit_params=init_dit_params(jax.random.key(0), dcfg),
        dit_cfg=dcfg, vae_params=vae_params, vae_cfg=vcfg, dtype=jnp.float32,
    )
    rs = np.random.RandomState(3)
    img = rs.randint(0, 255, (32, 32, 3), np.uint8)
    ctx = jnp.asarray(rs.randn(1, 6, 32), jnp.float32)
    kwargs = dict(context=ctx, seed=1, height=32, width=32, num_frames=9,
                  cfg_scale=1.0, num_inference_steps=2,
                  output_type="latents", torch_compat_noise=True)
    img2 = rs.randint(0, 255, (32, 32, 3), np.uint8)
    with_img = np.asarray(pipe(input_image=img, **kwargs))
    with_img2 = np.asarray(pipe(input_image=img2, **kwargs))
    assert with_img.shape == (1, 4, 3, 4, 4)
    assert np.isfinite(with_img).all()
    # the conditioning actually reaches the DiT: different images -> outputs
    assert not np.allclose(with_img, with_img2, atol=1e-5)


def test_unsupported_image_config_raises(goldens):
    """ADVICE item 1 (second half): a config with NO image path must refuse
    input_image instead of silently running T2V."""
    import pytest

    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    pipe.dit_cfg = dataclasses.replace(
        pipe.dit_cfg, fuse_vae_embedding_in_latents=False,
        require_vae_embedding=False)
    with pytest.raises(NotImplementedError):
        pipe(**_full_kwargs(g))


import dataclasses  # noqa: E402  (used by test_unsupported_image_config_raises)


def _tiny_vace_params(key, vcfg):
    """Random-init VACE params in our layout (converter-layout-free)."""
    import jax
    from fairygen_tpu.models.wan.dit import init_dit_params

    dcfg = vcfg.dit_cfg()
    base = init_dit_params(key, dcfg)
    blocks = []
    ks = jax.random.split(key, len(vcfg.vace_layers) + 1)
    for n in range(len(vcfg.vace_layers)):
        blk = jax.tree.map(lambda a: a[n], base["blocks"])
        blk["after_proj"] = {
            "w": jax.random.normal(ks[n], (vcfg.dim, vcfg.dim)) * 0.02,
            "b": jnp.zeros((vcfg.dim,)),
        }
        if n == 0:
            blk["before_proj"] = {
                "w": jax.random.normal(ks[-1], (vcfg.dim, vcfg.dim)) * 0.02,
                "b": jnp.zeros((vcfg.dim,)),
            }
        blocks.append(blk)
    pe_in = vcfg.vace_in_dim * vcfg.patch_size[0] * vcfg.patch_size[1] * vcfg.patch_size[2]
    return {
        "patch_embedding": {
            "w": jax.random.normal(ks[0], (pe_in, vcfg.dim)) * 0.02,
            "b": jnp.zeros((vcfg.dim,)),
        },
        "blocks": blocks,
    }


@pytest.mark.slow
def test_vace_pipeline_e2e():
    """VACE through pipe(__call__): control video + mask + reference image
    (VERDICT round-1 gap 5 — variant generation paths)."""
    import jax
    from fairygen_tpu.models.wan.aux_models import VaceConfig
    from fairygen_tpu.models.wan.dit import init_dit_params
    from fairygen_tpu.models.wan.vae import convert_vae_v1_state_dict

    g = np.load("tests/goldens/wan_vae_v1.npz")
    vcfg_vae = WanVAEConfig.tiny_v1()
    vae_params = convert_vae_v1_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("sd::")}, vcfg_vae)
    dcfg = WanDiTConfig(
        dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=False, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=False,
    )
    # vace_in_dim = 2*z + 64 mask channels = 72 (tiny z=4)
    vace_cfg = VaceConfig(vace_layers=(0,), vace_in_dim=72, dim=96,
                          num_heads=4, ffn_dim=128)
    pipe = WanVideoPipeline(
        dit_params=init_dit_params(jax.random.key(0), dcfg), dit_cfg=dcfg,
        vae_params=vae_params, vae_cfg=vcfg_vae,
        vace_params=_tiny_vace_params(jax.random.key(1), vace_cfg),
        vace_cfg=vace_cfg, dtype=jnp.float32,
    )
    rs = np.random.RandomState(0)
    H = W = 32
    F = 9
    ctx = jnp.asarray(rs.randn(1, 6, 32), jnp.float32)
    vid = [rs.randint(0, 255, (H, W, 3), np.uint8) for _ in range(F)]
    msk = [np.full((H, W, 3), 255, np.uint8) for _ in range(F)]
    kwargs = dict(context=ctx, cfg_scale=1.0, seed=3, height=H, width=W,
                  num_frames=F, num_inference_steps=2, output_type="latents",
                  torch_compat_noise=True)
    plain = np.asarray(pipe(**kwargs))
    vace = np.asarray(pipe(vace_video=vid, vace_video_mask=msk,
                           vace_scale=0.7, **kwargs))
    assert vace.shape == plain.shape
    assert np.isfinite(vace).all()
    assert not np.allclose(vace, plain, atol=1e-5)  # hints reached the DiT

    # reference image: +1 latent frame during denoise, stripped before return
    ref = rs.randint(0, 255, (H, W, 3), np.uint8)
    with_ref = np.asarray(pipe(vace_video=vid, vace_reference_image=ref,
                               **kwargs))
    assert with_ref.shape == plain.shape
    assert np.isfinite(with_ref).all()


@pytest.mark.slow
def test_s2v_pipeline_e2e():
    """S2V through pipe(__call__): audio conditioning with zero-audio CFG
    negative branch (VERDICT round-1 gap 5 — variant generation paths).
    The S2V model itself is golden-tested (test_wan_s2v); this exercises
    the pipeline wiring with the same golden checkpoint."""
    from fairygen_tpu.models.wan.s2v import S2VConfig, convert_s2v_state_dict

    g = np.load("tests/goldens/wan_s2v.npz")
    s2v_cfg = S2VConfig(
        dim=96, in_dim=16, ffn_dim=128, out_dim=16, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        cond_dim=16, audio_dim=8, num_audio_token=2, enable_adain=True,
        audio_inject_layers=(0, 1),
    )
    s2v_params = convert_s2v_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("sd::")}, s2v_cfg)
    pipe = WanVideoPipeline(
        dit_params=None, dit_cfg=WanDiTConfig.tiny(),
        vae_cfg=WanVAEConfig.wan21_16(),  # shape metadata only (f=8, z=16)
        s2v_params=s2v_params, s2v_cfg=s2v_cfg, dtype=jnp.float32,
    )
    rs = np.random.RandomState(0)
    ctx_p = jnp.asarray(rs.randn(1, 7, 32), jnp.float32)
    ctx_n = jnp.asarray(rs.randn(1, 7, 32), jnp.float32)
    audio = rs.randn(*g["audio"].shape).astype(np.float32)
    kwargs = dict(context=ctx_p, negative_context=ctx_n,
                  seed=5, height=64, width=64, num_frames=13,
                  cfg_scale=4.5, num_inference_steps=2,
                  s2v_pose_latents=jnp.asarray(rs.randn(1, 16, 3, 8, 8), jnp.float32),
                  output_type="latents", torch_compat_noise=True)
    out = np.asarray(pipe(audio_embeds=audio, **kwargs))
    # (num_frames-1)//4+1 = 4 latent frames at f=8 -> 8x8 spatial
    assert out.shape == (1, 16, 4, 8, 8)
    assert np.isfinite(out).all()
    # audio actually conditions the result
    out2 = np.asarray(pipe(audio_embeds=audio * 2.0, **kwargs))
    assert not np.allclose(out, out2, atol=1e-5)


@pytest.mark.slow
def test_camera_control_pipeline_e2e():
    """Fun camera control through pipe(__call__): plücker -> SimpleAdapter
    tokens + first-frame y conditioning (VERDICT round-1 gap 5)."""
    import jax
    from fairygen_tpu.models.wan.camera import SimpleAdapterConfig
    from fairygen_tpu.models.wan.dit import init_dit_params
    from fairygen_tpu.models.wan.vae import convert_vae_v1_state_dict

    g = np.load("tests/goldens/wan_vae_v1.npz")
    vcfg = WanVAEConfig.tiny_v1()
    vae_params = convert_vae_v1_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("sd::")}, vcfg)
    dcfg = WanDiTConfig(
        dim=96, in_dim=8, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=False, require_clip_embedding=False,
        require_vae_embedding=True, fuse_vae_embedding_in_latents=False,
    )
    ccfg = SimpleAdapterConfig(in_dim=24, out_dim=96)
    ks = jax.random.split(jax.random.key(7), 4)
    cam_params = {
        "conv": {"w": jax.random.normal(ks[0], (2, 2, 24 * 64, 96)) * 0.01,
                 "b": jnp.zeros((96,))},
        "blocks": [{
            "conv1": {"w": jax.random.normal(ks[1], (3, 3, 96, 96)) * 0.01,
                      "b": jnp.zeros((96,))},
            "conv2": {"w": jax.random.normal(ks[2], (3, 3, 96, 96)) * 0.01,
                      "b": jnp.zeros((96,))},
        }],
    }
    pipe = WanVideoPipeline(
        dit_params=init_dit_params(jax.random.key(0), dcfg), dit_cfg=dcfg,
        vae_params=vae_params, vae_cfg=vcfg,
        camera_params=cam_params, camera_cfg=ccfg, dtype=jnp.float32,
    )
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (32, 32, 3), np.uint8)
    ctx = jnp.asarray(rs.randn(1, 6, 32), jnp.float32)
    kwargs = dict(context=ctx, input_image=img, cfg_scale=1.0, seed=2,
                  height=32, width=32, num_frames=9, num_inference_steps=2,
                  output_type="latents", torch_compat_noise=True)
    left = np.asarray(pipe(camera_control_direction="Left", **kwargs))
    up = np.asarray(pipe(camera_control_direction="Up", **kwargs))
    assert left.shape == (1, 4, 3, 4, 4)
    assert np.isfinite(left).all()
    # direction actually conditions the result
    assert not np.allclose(left, up, atol=1e-5)


@pytest.mark.slow
def test_animate_pipeline_e2e():
    """Wan-Animate through pipe(__call__): pose latents + face motion
    adapter + inpaint y (VERDICT round-1 gap 5)."""
    import jax
    from tests.test_wan_animate import CFG as ANIMATE_CFG, _params
    from fairygen_tpu.models.wan.dit import init_dit_params
    from fairygen_tpu.models.wan.vae import convert_vae_v1_state_dict

    g = np.load("tests/goldens/wan_animate.npz")
    animate_params = _params(g)
    rs = np.random.RandomState(0)
    # tiny VAE is z=4: swap in a 4-channel pose patch embedding
    animate_params["pose_patch_embedding"] = {
        "w": jnp.asarray(rs.randn(4 * 1 * 2 * 2, 96) * 0.05, jnp.float32),
        "b": jnp.zeros((96,), jnp.float32),
    }

    gv = np.load("tests/goldens/wan_vae_v1.npz")
    vcfg = WanVAEConfig.tiny_v1()
    vae_params = convert_vae_v1_state_dict(
        {k[4:]: gv[k] for k in gv.files if k.startswith("sd::")}, vcfg)
    dcfg = WanDiTConfig(
        dim=96, in_dim=12, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=False, require_clip_embedding=False,
        require_vae_embedding=True, fuse_vae_embedding_in_latents=False,
    )
    pipe = WanVideoPipeline(
        dit_params=init_dit_params(jax.random.key(0), dcfg), dit_cfg=dcfg,
        vae_params=vae_params, vae_cfg=vcfg,
        animate_params=animate_params, animate_cfg=ANIMATE_CFG,
        dtype=jnp.float32,
    )
    H = W = 32
    F = 9  # latent frames f=3; pose/face/inpaint videos are F-4=5 frames
    ctx = jnp.asarray(rs.randn(1, 6, 32), jnp.float32)
    img = rs.randint(0, 255, (H, W, 3), np.uint8)
    pose = [rs.randint(0, 255, (H, W, 3), np.uint8) for _ in range(5)]
    face = [rs.randint(0, 255, (8, 8, 3), np.uint8) for _ in range(5)]
    inpaint = [rs.randint(0, 255, (H, W, 3), np.uint8) for _ in range(5)]
    mask = [np.full((H, W, 3), 255, np.uint8) for _ in range(5)]
    kwargs = dict(context=ctx, input_image=img, cfg_scale=1.0, seed=4,
                  height=H, width=W, num_frames=F, num_inference_steps=2,
                  output_type="latents", torch_compat_noise=True)
    out = np.asarray(pipe(
        animate_pose_video=pose, animate_face_video=face,
        animate_inpaint_video=inpaint, animate_mask_video=mask, **kwargs))
    # f=3 latent frames, animate strips the reference-y frame -> 2
    assert out.shape == (1, 4, 2, 4, 4)
    assert np.isfinite(out).all()
    face2 = [rs.randint(0, 255, (8, 8, 3), np.uint8) for _ in range(5)]
    out2 = np.asarray(pipe(
        animate_pose_video=pose, animate_face_video=face2,
        animate_inpaint_video=inpaint, animate_mask_video=mask, **kwargs))
    assert not np.allclose(out, out2, atol=1e-6)  # face motion conditions


def test_fun_reference_pipeline_e2e():
    """Fun-Reference image through pipe(__call__): ref_conv tokens
    prepended as an extra frame (reference wan_video.py:527-546,1264-1269)."""
    import jax
    from fairygen_tpu.models.wan.dit import init_dit_params
    from fairygen_tpu.models.wan.vae import convert_vae_v1_state_dict

    gv = np.load("tests/goldens/wan_vae_v1.npz")
    vcfg = WanVAEConfig.tiny_v1()
    vae_params = convert_vae_v1_state_dict(
        {k[4:]: gv[k] for k in gv.files if k.startswith("sd::")}, vcfg)
    dcfg = WanDiTConfig(
        dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2, has_ref_conv=True,
        seperated_timestep=False, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=False,
    )
    import jax.random as jr

    params = init_dit_params(jr.key(0), dcfg)
    # tiny VAE z=4 -> ref_conv consumes 4·2·2 channels (init defaults to 16)
    params["ref_conv"] = {
        "w": jr.normal(jr.key(1), (4 * 2 * 2, 96)) * 0.05,
        "b": jnp.zeros((96,)),
    }
    pipe = WanVideoPipeline(dit_params=params, dit_cfg=dcfg,
                            vae_params=vae_params, vae_cfg=vcfg,
                            dtype=jnp.float32)
    rs = np.random.RandomState(1)
    ctx = jnp.asarray(rs.randn(1, 6, 32), jnp.float32)
    ref = rs.randint(0, 255, (32, 32, 3), np.uint8)
    ref2 = rs.randint(0, 255, (32, 32, 3), np.uint8)
    kwargs = dict(context=ctx, cfg_scale=1.0, seed=6, height=32, width=32,
                  num_frames=9, num_inference_steps=2,
                  output_type="latents", torch_compat_noise=True)
    a = np.asarray(pipe(reference_image=ref, **kwargs))
    b = np.asarray(pipe(reference_image=ref2, **kwargs))
    assert a.shape == (1, 4, 3, 4, 4)
    assert np.isfinite(a).all()
    assert not np.allclose(a, b, atol=1e-6)

    # sliding-window long-video mode must carry the Fun-Reference latent
    # into every window (the reference's temporal tiler forwards it
    # unsliced, wan_video.py:1168)
    win = dict(kwargs, sliding_window_size=2, sliding_window_stride=1)
    wa = np.asarray(pipe(reference_image=ref, **win))
    wb = np.asarray(pipe(reference_image=ref2, **win))
    assert np.isfinite(wa).all()
    assert not np.allclose(wa, wb, atol=1e-6), \
        "reference image ignored in the sliding-window path"


@pytest.mark.slow
def test_vap_pipeline_e2e():
    """VAP (video-as-prompt / MoT) through pipe(__call__): reference video
    rides the frozen side branch (VERDICT round-1 gap 5)."""
    import jax
    from fairygen_tpu.models.wan.mot import MotConfig
    from fairygen_tpu.models.wan.dit import init_dit_params
    from fairygen_tpu.models.wan.vae import convert_vae_v1_state_dict

    gv = np.load("tests/goldens/wan_vae_v1.npz")
    vcfg = WanVAEConfig.tiny_v1()
    vae_params = convert_vae_v1_state_dict(
        {k[4:]: gv[k] for k in gv.files if k.startswith("sd::")}, vcfg)
    dcfg = WanDiTConfig(
        dim=96, in_dim=12, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=False, require_clip_embedding=False,
        require_vae_embedding=True, fuse_vae_embedding_in_latents=False,
        has_image_input=False,
    )
    mot_cfg = MotConfig(
        mot_layers=(0,), has_image_input=False, dim=96, num_heads=4,
        ffn_dim=128, freq_dim=32, text_dim=32, in_dim=12,
    )
    mot_params = init_dit_params(jax.random.key(1), mot_cfg.dit_cfg())
    mot_params["patch_embedding"] = mot_params.pop("patch_embed")
    mot_params["blocks"] = [
        jax.tree.map(lambda a: a[i], mot_params["blocks"])
        for i in range(len(mot_cfg.mot_layers))
    ]
    pipe = WanVideoPipeline(
        dit_params=init_dit_params(jax.random.key(0), dcfg), dit_cfg=dcfg,
        vae_params=vae_params, vae_cfg=vcfg,
        vap_params=mot_params, vap_cfg=mot_cfg, dtype=jnp.float32,
    )
    rs = np.random.RandomState(0)
    H = W = 32
    F = 9
    ctx = jnp.asarray(rs.randn(1, 6, 32), jnp.float32)
    ctx_vap = jnp.asarray(rs.randn(1, 6, 32), jnp.float32)
    img = rs.randint(0, 255, (H, W, 3), np.uint8)
    vap_vid = [rs.randint(0, 255, (H, W, 3), np.uint8) for _ in range(F)]
    vap_vid2 = [rs.randint(0, 255, (H, W, 3), np.uint8) for _ in range(F)]
    kwargs = dict(context=ctx, context_vap=ctx_vap, input_image=img,
                  cfg_scale=1.0, seed=8, height=H, width=W, num_frames=F,
                  num_inference_steps=2, output_type="latents",
                  torch_compat_noise=True)
    a = np.asarray(pipe(vap_video=vap_vid, **kwargs))
    b = np.asarray(pipe(vap_video=vap_vid2, **kwargs))
    assert a.shape == (1, 4, 3, 4, 4)
    assert np.isfinite(a).all()
    assert not np.allclose(a, b, atol=1e-6)  # the vap video conditions


@pytest.mark.slow
def test_pipeline_mesh_tensor_parallel(goldens):
    """FFN tensor parallelism through pipe(__call__): use_mesh on a mesh
    with a tensor axis Megatron-splits the DiT FFN weights."""
    from fairygen_tpu.core.meshes import make_mesh
    import jax

    g = goldens("wan_pipeline")
    kwargs = _full_kwargs(g, height=64, width=64)
    ref = np.asarray(_pipe(g)(**kwargs))

    mesh = make_mesh(data=1, seq=2, tensor=2, devices=jax.devices()[:4])
    pipe = _pipe(g).use_mesh(mesh)
    fc1 = pipe.dit_params["blocks"]["ffn"]["fc1"]["w"]
    assert fc1.addressable_shards[0].data.shape[-1] == fc1.shape[-1] // 2
    out = np.asarray(pipe(**kwargs))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-4)


def test_seed_none_defaults_to_zero(goldens):
    """seed=None is valid (same contract as the t2i pipelines)."""
    g = goldens("wan_pipeline")
    pipe = _pipe(g)
    kwargs = dict(context=jnp.asarray(g["ctx_p"]), cfg_scale=1.0,
                  height=32, width=32, num_frames=5,
                  num_inference_steps=1, output_type="latents")
    out_none = np.asarray(pipe(seed=None, **kwargs))
    out_zero = np.asarray(pipe(seed=0, **kwargs))
    np.testing.assert_array_equal(out_none, out_zero)


def _vace_pipe():
    import jax
    from fairygen_tpu.models.wan.aux_models import VaceConfig
    from fairygen_tpu.models.wan.dit import init_dit_params
    from fairygen_tpu.models.wan.vae import convert_vae_v1_state_dict

    g = np.load("tests/goldens/wan_vae_v1.npz")
    vcfg_vae = WanVAEConfig.tiny_v1()
    vae_params = convert_vae_v1_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("sd::")}, vcfg_vae)
    dcfg = WanDiTConfig(
        dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=False, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=False,
    )
    vace_cfg = VaceConfig(vace_layers=(0,), vace_in_dim=72, dim=96,
                          num_heads=4, ffn_dim=128)
    return WanVideoPipeline(
        dit_params=init_dit_params(jax.random.key(0), dcfg), dit_cfg=dcfg,
        vae_params=vae_params, vae_cfg=vcfg_vae,
        vace_params=_tiny_vace_params(jax.random.key(1), vace_cfg),
        vace_cfg=vace_cfg, dtype=jnp.float32,
    )


def test_sliding_window_rejects_vace():
    """VACE (and animate/camera) conditioning has no defined per-window
    semantics - must fail loudly, not silently drop the control."""
    pipe = _vace_pipe()
    ctx = jnp.zeros((1, 6, 32), jnp.float32)
    vace_video = [np.zeros((32, 32, 3), np.uint8)] * 9
    with pytest.raises(ValueError, match="sliding-window"):
        pipe(context=ctx, cfg_scale=1.0, seed=1,
             height=32, width=32, num_frames=9, num_inference_steps=1,
             sliding_window_size=3, sliding_window_stride=2,
             vace_video=vace_video, output_type="latents")


def test_vace_tiled_encode_matches_untiled():
    """encode_vace_context honors the pipeline tiling kwargs (reference
    VACE unit, wan_video.py:645-646); full-cover tiles == dense encode."""
    pipe = _vace_pipe()
    vace_video = [(np.random.default_rng(i).random((32, 32, 3)) * 255)
                  .astype(np.uint8) for i in range(9)]
    dense, n0 = pipe.encode_vace_context(
        vace_video, None, None, 32, 32, 9, tiled=False)
    tiled, n1 = pipe.encode_vace_context(
        vace_video, None, None, 32, 32, 9, tiled=True,
        tile_size=(34, 34), tile_stride=(18, 16))
    assert n0 == n1 == 0
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(dense),
                               atol=2e-5, rtol=2e-5)
