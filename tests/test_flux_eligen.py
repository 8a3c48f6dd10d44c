"""EliGen entity-control parity vs the reference
process_entity_masks/construct_mask driver path
(tools/gen_goldens_flux_eligen.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.dit import (
    FluxDiTConfig,
    convert_flux_dit_state_dict,
    eligen_attention_bias,
    flux_dit_forward,
)

CFG = FluxDiTConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux_eligen.npz")


def test_eligen_matches_reference(g):
    params = convert_flux_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)
    out = flux_dit_forward(
        params, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]),
        entity_prompt_emb=jnp.asarray(g["entity_prompt_emb"]),
        entity_masks=jnp.asarray(g["entity_masks"]))
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


def test_pipeline_with_eligen(g):
    """End-to-end smoke: precomputed entity embeds/masks through the
    pipeline with CFG and eligen_enable_on_negative."""
    from fairygen_tpu.pipelines.flux_image import FluxImagePipeline

    params = convert_flux_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)
    pipe = FluxImagePipeline(dit_params=params, dit_cfg=CFG,
                             dtype=jnp.float32)
    lat = pipe(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        pooled_prompt_emb=jnp.asarray(g["pooled"]),
        negative_prompt_emb=jnp.asarray(g["prompt_emb"]),
        negative_pooled_prompt_emb=jnp.asarray(g["pooled"]),
        cfg_scale=2.0, latents=g["latents"], height=64, width=96,
        num_inference_steps=2,
        eligen_entity_prompts=jnp.asarray(g["entity_prompt_emb"]),
        eligen_entity_masks=jnp.asarray(g["entity_masks"]),
        eligen_enable_on_negative=True,
        output_type="latent",
    )
    assert lat.shape == (1, 4, 8, 12)
    assert np.isfinite(np.asarray(lat)).all()


def test_bias_structure(g):
    """Entity prompts see only their region; prompts never cross-attend;
    the trailing global prompt and image-image stay dense."""
    bias = np.asarray(eligen_attention_bias(
        jnp.asarray(g["entity_masks"]), lt=6, n_img=24))[0, 0]
    n_txt = 3 * 6
    assert (bias[n_txt:, n_txt:] == 0).all()  # image-image dense
    assert (bias[:6, 6:12] < -1e29).all()  # prompt0 !-> prompt1
    assert (bias[12:18, n_txt:] == 0).all()  # global prompt -> all image
    # entity0 (left half-plane) must reach some but not all image tokens
    row0 = bias[0, n_txt:]
    assert (row0 == 0).any() and (row0 < -1e29).any()