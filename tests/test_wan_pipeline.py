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
