"""End-to-end SDXL+BrushNet pipeline parity vs the reference pipeline."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.sdxl.unet2d import UNet2DConfig, convert_unet2d_state_dict
from fairygen_tpu.models.sdxl.vae import (
    AutoencoderKLConfig,
    convert_autoencoder_kl_state_dict,
)
from fairygen_tpu.pipelines.sdxl_brushnet import SDXLBrushNetPipeline

UNET_CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    transformer_layers_per_block=(1, 2),
    num_attention_heads=(2, 4),
    cross_attention_dim=32,
    norm_num_groups=16,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=80,
)
BN_CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    mid_block_type="UNetMidBlock2D",
    transformer_layers_per_block=(0, 0),
    num_attention_heads=(2, 4),
    attention_head_dim=8,
    cross_attention_dim=32,
    norm_num_groups=16,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=80,
    conditioning_channels=5,
)
VAE_CFG = AutoencoderKLConfig.tiny()


def _sd(g, prefix):
    n = len(prefix) + 2
    return {k[n:]: g[k] for k in g.files if k.startswith(prefix + "::")}


@pytest.mark.slow
def test_brushnet_sdxl_pipeline_end_to_end(goldens):
    g = goldens("brushnet_pipeline")
    pipe = SDXLBrushNetPipeline(
        unet_params=convert_unet2d_state_dict(_sd(g, "unet"), UNET_CFG),
        unet_cfg=UNET_CFG,
        vae_params=convert_autoencoder_kl_state_dict(_sd(g, "vae"), VAE_CFG),
        vae_cfg=VAE_CFG,
        brushnet_params=convert_unet2d_state_dict(_sd(g, "bn"), BN_CFG),
        brushnet_cfg=BN_CFG,
    )
    frames = pipe(
        prompt_embeds=jnp.asarray(g["pe"]),
        pooled_embeds=jnp.asarray(g["ppe"]),
        negative_prompt_embeds=jnp.asarray(g["npe"]),
        negative_pooled_embeds=jnp.asarray(g["nppe"]),
        image=g["masked_u8"].astype(np.float32) / 255.0,
        mask=g["mask_u8"].astype(np.float32) / 255.0,
        height=64, width=64, num_inference_steps=6,
        guidance_scale=7.5, brushnet_conditioning_scale=0.7,
        seed=77, torch_compat_noise=True,
    )
    ours = frames[0].astype(np.float32)
    ref = (g["img_out"] * 255.0).astype(np.float32) if g["img_out"].dtype != np.uint8 \
        else g["img_out"].astype(np.float32)
    # uint8 rounding: allow ±2 levels
    assert ours.shape == ref.shape
    diff = np.abs(ours - ref)
    assert diff.max() <= 3, f"max pixel diff {diff.max()}"
    mse = np.mean((ours - ref) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
    assert psnr > 45, f"PSNR {psnr:.1f} dB"


@pytest.mark.slow
def test_plain_sdxl_text2image_shapes(goldens):
    g = goldens("brushnet_pipeline")
    pipe = SDXLBrushNetPipeline(
        unet_params=convert_unet2d_state_dict(_sd(g, "unet"), UNET_CFG),
        unet_cfg=UNET_CFG,
        vae_params=convert_autoencoder_kl_state_dict(_sd(g, "vae"), VAE_CFG),
        vae_cfg=VAE_CFG,
    )
    frames = pipe(
        prompt_embeds=jnp.asarray(g["pe"]),
        pooled_embeds=jnp.asarray(g["ppe"]),
        negative_prompt_embeds=jnp.asarray(g["npe"]),
        negative_pooled_embeds=jnp.asarray(g["nppe"]),
        height=64, width=64, num_inference_steps=3, guidance_scale=5.0, seed=1,
    )
    assert frames[0].shape == (64, 64, 3)


@pytest.mark.slow
def test_batched_generation_matches_single(goldens):
    """A batch of 2 prompts equals two single-sample calls (same seeds)."""
    g = goldens("brushnet_pipeline")
    pipe = SDXLBrushNetPipeline(
        unet_params=convert_unet2d_state_dict(_sd(g, "unet"), UNET_CFG),
        unet_cfg=UNET_CFG,
        vae_params=convert_autoencoder_kl_state_dict(_sd(g, "vae"), VAE_CFG),
        vae_cfg=VAE_CFG,
    )
    pe = jnp.asarray(g["pe"])
    ppe = jnp.asarray(g["ppe"])
    pe2 = jnp.concatenate([pe, pe * 0.5], axis=0)
    ppe2 = jnp.concatenate([ppe, ppe * 0.5], axis=0)
    kw = dict(
        negative_prompt_embeds=jnp.asarray(g["npe"]),
        negative_pooled_embeds=jnp.asarray(g["nppe"]),
        height=64, width=64, num_inference_steps=3, guidance_scale=5.0,
        output_type="np_pm1",
    )
    batched = pipe(prompt_embeds=pe2, pooled_embeds=ppe2, seed=7, **kw)
    single0 = pipe(prompt_embeds=pe, pooled_embeds=ppe, seed=7, **kw)
    single1 = pipe(prompt_embeds=pe * 0.5, pooled_embeds=ppe * 0.5, seed=8,
                   **kw)
    assert batched.shape[0] == 2
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single0[0]),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single1[0]),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_batched_generation_data_parallel_mesh(goldens):
    """Batched generation over a data-parallel mesh matches no-mesh."""
    from fairygen_tpu.core.meshes import make_mesh

    import jax

    g = goldens("brushnet_pipeline")
    mesh = make_mesh(data=2, seq=1, devices=jax.devices()[:2])
    kw = dict(
        unet_params=convert_unet2d_state_dict(_sd(g, "unet"), UNET_CFG),
        unet_cfg=UNET_CFG,
        vae_params=convert_autoencoder_kl_state_dict(_sd(g, "vae"), VAE_CFG),
        vae_cfg=VAE_CFG,
    )
    pe = jnp.asarray(g["pe"])
    ppe = jnp.asarray(g["ppe"])
    pe2 = jnp.concatenate([pe, pe * 0.5], axis=0)
    ppe2 = jnp.concatenate([ppe, ppe * 0.5], axis=0)
    call_kw = dict(
        prompt_embeds=pe2, pooled_embeds=ppe2,
        negative_prompt_embeds=jnp.asarray(g["npe"]),
        negative_pooled_embeds=jnp.asarray(g["nppe"]),
        height=64, width=64, num_inference_steps=3, guidance_scale=5.0,
        seed=3, output_type="np_pm1",
    )
    ref = SDXLBrushNetPipeline(**kw)(**call_kw)
    got = SDXLBrushNetPipeline(mesh=mesh, **kw)(**call_kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_lcm_few_step_path(goldens):
    """scheduler='lcm' runs the 4-step LCM rollout; matches a manual
    composition of unet2d_forward + the golden-tested LCM step."""
    import jax

    from fairygen_tpu.core.noise import generate_noise
    from fairygen_tpu.diffusion.lcm import LCMScheduler
    from fairygen_tpu.models.sdxl.unet2d import unet2d_forward

    g = goldens("brushnet_pipeline")
    pipe = SDXLBrushNetPipeline(
        unet_params=convert_unet2d_state_dict(_sd(g, "unet"), UNET_CFG),
        unet_cfg=UNET_CFG,
        vae_params=convert_autoencoder_kl_state_dict(_sd(g, "vae"), VAE_CFG),
        vae_cfg=VAE_CFG,
    )
    pe, ppe = jnp.asarray(g["pe"]), jnp.asarray(g["ppe"])
    out = pipe(prompt_embeds=pe, pooled_embeds=ppe, height=64, width=64,
               num_inference_steps=4, guidance_scale=1.0, seed=11,
               scheduler="lcm", output_type="latent")

    # manual composition
    sched = LCMScheduler().set_timesteps(4)
    tables = sched.tables()
    f = VAE_CFG.downscale_factor
    lat_shape = (1, VAE_CFG.latent_channels, 64 // f, 64 // f)
    lat = generate_noise(lat_shape, seed=11, dtype=jnp.float32)
    time_ids = jnp.asarray([[64, 64, 0, 0, 64, 64]], jnp.float32)
    for i in range(4):
        eps = unet2d_forward(
            pipe.unet_params, UNET_CFG, lat.astype(jnp.float32),
            tables["timesteps"][i], pe.astype(jnp.float32),
            text_embeds=ppe, time_ids=time_ids,
        ).astype(jnp.float32)
        noise = generate_noise(lat_shape, seed=11 + 100003 + i,
                               dtype=jnp.float32)
        lat, _ = sched.step_from_tables(tables, eps, i, lat, noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lat),
                               atol=2e-4, rtol=1e-3)
