"""QwenImagePipeline e2e golden parity (tools/gen_goldens_qwen_pipeline.py):
jitted denoise loop + dynamic-shift scheduler + VAE decode vs the
reference loop (model_fn_qwen_image + FlowMatchScheduler Qwen-Image)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.dit import (
    QwenImageDiTConfig,
    convert_qwen_image_dit_state_dict,
)
from fairygen_tpu.models.qwen.vae import (
    WanVAEConfig,
    convert_qwen_image_vae_state_dict,
)
from fairygen_tpu.pipelines.qwen_image import QwenImagePipeline

DIT_CFG = QwenImageDiTConfig.tiny()
VAE_CFG = WanVAEConfig.tiny_v1()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/qwen_pipeline.npz")


@pytest.fixture(scope="module")
def pipe(g):
    dit_params = convert_qwen_image_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, DIT_CFG)
    vae_params = convert_qwen_image_vae_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("vae.")}, VAE_CFG)
    return QwenImagePipeline(
        dit_params=dit_params, dit_cfg=DIT_CFG,
        vae_params=vae_params, vae_cfg=VAE_CFG, dtype=jnp.float32,
    )


@pytest.mark.slow
def test_qwen_pipeline_cfg_latents(g, pipe):
    lat = pipe(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        negative_prompt_emb=jnp.asarray(g["neg_emb"]),
        cfg_scale=4.0, latents=g["lat0"], height=64, width=96,
        num_inference_steps=4, output_type="latent",
    )
    np.testing.assert_allclose(np.asarray(lat), g["lat_out"], atol=5e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_qwen_pipeline_decode(g, pipe):
    arr = pipe(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        negative_prompt_emb=jnp.asarray(g["neg_emb"]),
        cfg_scale=4.0, latents=g["lat0"], height=64, width=96,
        num_inference_steps=4, output_type="np",
    )
    from fairygen_tpu.core.imaging import postprocess_image

    ref = postprocess_image(g["img"][0])
    assert arr.shape == ref.shape
    assert np.abs(arr.astype(np.int32) - ref.astype(np.int32)).max() <= 1
