"""End-to-end TI2V pipeline parity vs a reference-composed denoise loop."""
import numpy as np
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
