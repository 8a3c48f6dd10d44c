"""Flux2ImagePipeline e2e golden parity (tools/gen_goldens_flux2_pipeline.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux2.dit import (
    Flux2DiTConfig,
    convert_flux2_dit_state_dict,
)
from fairygen_tpu.models.flux2.vae import (
    AutoencoderKLConfig,
    convert_flux2_vae_state_dict,
)
from fairygen_tpu.pipelines.flux2_image import Flux2ImagePipeline

DIT_CFG = Flux2DiTConfig.tiny()
VAE_CFG = AutoencoderKLConfig(latent_channels=4,
                              block_out_channels=(8, 16, 32, 32),
                              layers_per_block=1, norm_num_groups=4,
                              scaling_factor=1.0)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux2_pipeline.npz")


@pytest.fixture(scope="module")
def pipe(g):
    dit_params = convert_flux2_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, DIT_CFG)
    vae_params = convert_flux2_vae_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("vae.")}, VAE_CFG)
    return Flux2ImagePipeline(dit_params=dit_params, dit_cfg=DIT_CFG,
                              vae_params=vae_params, vae_cfg=VAE_CFG,
                              dtype=jnp.float32)


@pytest.mark.slow
def test_flux2_pipeline_latents(g, pipe):
    lat = pipe(prompt_emb=jnp.asarray(g["prompt"]), embedded_guidance=4.0,
               latents=g["lat0"], height=64, width=96,
               num_inference_steps=4, output_type="latent")
    np.testing.assert_allclose(np.asarray(lat), g["lat_out"], atol=5e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_flux2_pipeline_decode(g, pipe):
    arr = pipe(prompt_emb=jnp.asarray(g["prompt"]), embedded_guidance=4.0,
               latents=g["lat0"], height=64, width=96,
               num_inference_steps=4, output_type="np")
    from fairygen_tpu.core.imaging import postprocess_image

    ref = postprocess_image(g["img"][0])
    assert arr.shape == ref.shape
    assert np.abs(arr.astype(np.int32) - ref.astype(np.int32)).max() <= 1
