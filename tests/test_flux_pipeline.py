"""FluxImagePipeline e2e golden parity (tools/gen_goldens_flux_pipeline.py):
the jitted denoise loop + fp32 decode must match the reference semantics
(FlowMatchScheduler FLUX.1 + model_fn per step + FluxVAEDecoder)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.dit import (
    FluxDiTConfig,
    convert_flux_dit_state_dict,
)
from fairygen_tpu.models.flux.vae import (
    AutoencoderKLConfig,
    convert_flux_vae_state_dict,
)
from fairygen_tpu.pipelines.flux_image import FluxImagePipeline

DIT_CFG = FluxDiTConfig.tiny()
VAE_CFG = AutoencoderKLConfig(latent_channels=4,
                              block_out_channels=(8, 16, 32, 32),
                              norm_num_groups=4, scaling_factor=0.3611,
                              shift_factor=0.1159, use_quant_conv=False)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux_pipeline.npz")


class _DecoderOnly(dict):
    pass


@pytest.fixture(scope="module")
def pipe(g):
    dit_params = convert_flux_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, DIT_CFG)
    # decoder-only VAE state (encode is tested in test_flux_vae)
    vae_sd = {k[4:]: g[k] for k in g.files if k.startswith("vae.")}
    dummy_enc = np.load("tests/goldens/flux_vae.npz")
    vae_sd.update({k[3:]: dummy_enc[k] for k in dummy_enc.files
                   if k.startswith("sd.encoder.")})
    vae_params = convert_flux_vae_state_dict(vae_sd, VAE_CFG)
    return FluxImagePipeline(
        dit_params=dit_params, dit_cfg=DIT_CFG,
        vae_params=vae_params, vae_cfg=VAE_CFG, dtype=jnp.float32,
    )


@pytest.mark.slow
def test_flux_pipeline_no_cfg(g, pipe):
    lat = pipe(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        pooled_prompt_emb=jnp.asarray(g["pooled"]),
        latents=g["lat0"], height=64, width=96,
        num_inference_steps=4, embedded_guidance=3.5,
        output_type="latent",
    )
    np.testing.assert_allclose(np.asarray(lat), g["lat_nocfg"], atol=2e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_flux_pipeline_decode_matches(g, pipe):
    arr = pipe(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        pooled_prompt_emb=jnp.asarray(g["pooled"]),
        latents=g["lat0"], height=64, width=96,
        num_inference_steps=4, embedded_guidance=3.5,
        output_type="np",
    )
    from fairygen_tpu.core.imaging import postprocess_image

    ref = postprocess_image(g["img_nocfg"][0])
    assert arr.shape == ref.shape
    # uint8 quantization: allow 1 step of rounding difference
    assert np.abs(arr.astype(np.int32) - ref.astype(np.int32)).max() <= 1


@pytest.mark.slow
def test_flux_tea_cache_always_calc_matches_baseline(g, pipe):
    """thresh=-inf forces recompute every step -> identical to no-cache
    (the FLUX gate polynomial can be negative, so 0 is NOT always-calc)."""
    kw = dict(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        pooled_prompt_emb=jnp.asarray(g["pooled"]),
        latents=g["lat0"], height=64, width=96,
        num_inference_steps=4, embedded_guidance=3.5,
        output_type="latent",
    )
    base = pipe(**kw)
    out = pipe(tea_cache_l1_thresh=-1e9, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


@pytest.mark.slow
def test_flux_tea_cache_skips(g, pipe):
    """A huge threshold makes the middle steps reuse the cached residual —
    output differs from baseline but stays finite."""
    kw = dict(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        pooled_prompt_emb=jnp.asarray(g["pooled"]),
        latents=g["lat0"], height=64, width=96,
        num_inference_steps=4, embedded_guidance=3.5,
        output_type="latent",
    )
    base = np.asarray(pipe(**kw))
    out = np.asarray(pipe(tea_cache_l1_thresh=1e9, **kw))
    assert np.isfinite(out).all()
    assert np.abs(out - base).max() > 1e-6


@pytest.mark.slow
def test_flux_pipeline_cfg(g, pipe):
    lat = pipe(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        pooled_prompt_emb=jnp.asarray(g["pooled"]),
        negative_prompt_emb=jnp.asarray(g["neg_emb"]),
        negative_pooled_prompt_emb=jnp.asarray(g["neg_pooled"]),
        cfg_scale=2.5, latents=g["lat0"], height=64, width=96,
        num_inference_steps=4, embedded_guidance=3.5,
        output_type="latent",
    )
    np.testing.assert_allclose(np.asarray(lat), g["lat_cfg"], atol=5e-4,
                               rtol=1e-3)
