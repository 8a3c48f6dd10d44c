"""FLUX IP-Adapter + SigLIP parity (tools/gen_goldens_flux_ipadapter.py,
tools/gen_goldens_siglip.py): image-proj tokens, per-block k/v adapters
with the pre-rope (double) / post-rope-all-tokens (single) query rule, and
the SigLIP pooled encoder feeding it."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.dit import (
    FluxDiTConfig,
    convert_flux_dit_state_dict,
    flux_dit_forward,
)
from fairygen_tpu.models.flux.ipadapter import (
    FluxIpAdapterConfig,
    convert_flux_ipadapter_state_dict,
    flux_ipadapter_project,
)
from fairygen_tpu.models.siglip import (
    SiglipVisionConfig,
    convert_siglip_vision_state_dict,
    siglip_vision_forward,
)

CFG = FluxDiTConfig.tiny()
IP_CFG = FluxIpAdapterConfig.tiny()


def test_ipadapter_matches_reference():
    g = np.load("tests/goldens/flux_ipadapter.npz")
    dit_p = convert_flux_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)
    ip_p = convert_flux_ipadapter_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("ip.")}, IP_CFG)
    tokens = flux_ipadapter_project(ip_p, IP_CFG,
                                    jnp.asarray(g["image_embeds"]))
    out = flux_dit_forward(
        dit_p, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]),
        ipadapter=(ip_p, tokens, 0.9))
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


def test_pipeline_with_ipadapter():
    """End-to-end smoke: SigLIP encode -> project -> per-block injection
    through FluxImagePipeline with CFG (zero-embed nega tokens)."""
    from PIL import Image

    g = np.load("tests/goldens/flux_ipadapter.npz")
    sg = np.load("tests/goldens/siglip.npz")
    dit_p = convert_flux_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)
    ip_cfg = FluxIpAdapterConfig.tiny(id_embeddings_dim=32)
    # graft fc1 to the tiny SigLIP's 32-wide pooled output
    ip_p = convert_flux_ipadapter_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("ip.")}, IP_CFG)
    rng = np.random.default_rng(0)
    ip_p["image_proj"]["fc1"] = {
        "w": jnp.asarray(rng.standard_normal((32, 32)) * 0.05, jnp.float32),
        "b": jnp.zeros((32,), jnp.float32)}
    enc_cfg = SiglipVisionConfig.tiny()
    enc_p = convert_siglip_vision_state_dict(
        {k[3:]: sg[k] for k in sg.files if k.startswith("sd.")}, enc_cfg)

    from fairygen_tpu.pipelines.flux_image import FluxImagePipeline

    pipe = FluxImagePipeline(
        dit_params=dit_p, dit_cfg=CFG, ipadapter=(ip_p, ip_cfg),
        ipadapter_image_encoder=(enc_p, enc_cfg), dtype=jnp.float32)
    img = Image.fromarray(
        (np.random.default_rng(3).random((64, 96, 3)) * 255).astype("uint8"))
    lat = pipe(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        pooled_prompt_emb=jnp.asarray(g["pooled"]),
        negative_prompt_emb=jnp.asarray(g["prompt_emb"]),
        negative_pooled_prompt_emb=jnp.asarray(g["pooled"]),
        cfg_scale=2.0, latents=g["latents"], height=64, width=96,
        num_inference_steps=2, ipadapter_images=img, ipadapter_scale=0.8,
        output_type="latent",
    )
    assert lat.shape == (1, 4, 8, 12)
    assert np.isfinite(np.asarray(lat)).all()


def test_siglip_matches_transformers():
    g = np.load("tests/goldens/siglip.npz")
    cfg = SiglipVisionConfig.tiny()
    params = convert_siglip_vision_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, cfg)
    pooled, tokens = siglip_vision_forward(params, cfg,
                                           jnp.asarray(g["pixels"]))
    np.testing.assert_allclose(np.asarray(tokens), g["tokens"], atol=2e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), g["pooler"], atol=2e-5,
                               rtol=1e-4)


def test_siglip_nondivisible_input_matches_transformers():
    """384/14-style inputs: transformers' valid-stride conv drops the
    trailing rows/cols; our crop must reproduce it exactly (the FLUX
    IP-Adapter pipeline feeds image_size=384 with patch 14)."""
    g = np.load("tests/goldens/siglip.npz")
    cfg = SiglipVisionConfig.tiny()
    params = convert_siglip_vision_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, cfg)
    pooled, tokens = siglip_vision_forward(params, cfg,
                                           jnp.asarray(g["pixels_odd"]))
    np.testing.assert_allclose(np.asarray(tokens), g["tokens_odd"],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), g["pooler_odd"],
                               atol=2e-5, rtol=1e-4)
