"""ZImagePipeline e2e golden parity (tools/gen_goldens_z_image_pipeline.py):
jitted denoise loop (timestep inversion + output negation) + FLUX VAE
decode vs the reference loop."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.vae import (
    AutoencoderKLConfig,
    convert_flux_vae_state_dict,
)
from fairygen_tpu.models.z_image.dit import (
    ZImageDiTConfig,
    convert_z_image_dit_state_dict,
)
from fairygen_tpu.pipelines.z_image import ZImagePipeline

DIT_CFG = ZImageDiTConfig.tiny()
VAE_CFG = AutoencoderKLConfig(latent_channels=4,
                              block_out_channels=(8, 16, 32, 32),
                              norm_num_groups=4, scaling_factor=0.3611,
                              shift_factor=0.1159, use_quant_conv=False)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/z_image_pipeline.npz")


@pytest.fixture(scope="module")
def pipe(g):
    dit_params = convert_z_image_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, DIT_CFG)
    vae_sd = {k[4:]: g[k] for k in g.files if k.startswith("vae.")}
    enc = np.load("tests/goldens/flux_vae.npz")
    vae_sd.update({k[3:]: enc[k] for k in enc.files
                   if k.startswith("sd.encoder.")})
    vae_params = convert_flux_vae_state_dict(vae_sd, VAE_CFG)
    return ZImagePipeline(dit_params=dit_params, dit_cfg=DIT_CFG,
                          vae_params=vae_params, vae_cfg=VAE_CFG,
                          dtype=jnp.float32)


@pytest.mark.slow
def test_z_image_pipeline_cfg_latents(g, pipe):
    lat = pipe(prompt_emb=jnp.asarray(g["cap"]),
               negative_prompt_emb=jnp.asarray(g["neg"]),
               cfg_scale=2.0, latents=g["lat0"], height=128, width=192,
               num_inference_steps=4, output_type="latent")
    np.testing.assert_allclose(np.asarray(lat), g["lat_out"], atol=5e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_z_image_pipeline_decode(g, pipe):
    arr = pipe(prompt_emb=jnp.asarray(g["cap"]),
               negative_prompt_emb=jnp.asarray(g["neg"]),
               cfg_scale=2.0, latents=g["lat0"], height=128, width=192,
               num_inference_steps=4, output_type="np")
    from fairygen_tpu.core.imaging import postprocess_image

    ref = postprocess_image(g["img"][0])
    assert arr.shape == ref.shape
    assert np.abs(arr.astype(np.int32) - ref.astype(np.int32)).max() <= 1


@pytest.mark.slow
def test_z_image_pipeline_quantize_smoke(g, pipe):
    """pipe.quantize() end-to-end: int8 output close to the fp32 path."""
    import dataclasses

    kwargs = dict(prompt_emb=jnp.asarray(g["cap"]),
                  negative_prompt_emb=jnp.asarray(g["neg"]),
                  cfg_scale=2.0, latents=g["lat0"], height=128, width=192,
                  num_inference_steps=4, output_type="latent")
    ref = np.asarray(pipe(**kwargs))
    # quantize() consumes its input tree (donated buffers) — give the
    # quantized pipe its own copy so the shared fixture stays intact
    qpipe = dataclasses.replace(
        pipe, dit_params=jax.tree.map(jnp.array, pipe.dit_params))
    qpipe.quantize()
    out = np.asarray(qpipe(**kwargs))
    assert out.shape == ref.shape
    rel = float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6))
    assert rel < 0.25, rel  # int8 drift compounds over 4 steps
