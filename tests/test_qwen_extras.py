"""Qwen-Image extras parity vs the real model_fn_qwen_image
(tools/gen_goldens_qwen_extras.py): layered generation, zero_cond_t,
EliGen entity masks, edit rope interpolation."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.dit import (
    QwenImageDiTConfig,
    convert_qwen_image_dit_state_dict,
    qwen_image_dit_forward,
)

CFG = QwenImageDiTConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/qwen_extras.npz")


@pytest.fixture(scope="module")
def params(g):
    return convert_qwen_image_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)


def test_layered(params, g):
    out = qwen_image_dit_forward(
        params, CFG, jnp.asarray(g["layer_lat"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), layered=True)
    np.testing.assert_allclose(np.asarray(out), g["layer_out"], atol=2e-4,
                               rtol=1e-3)


def test_zero_cond_t(params, g):
    out = qwen_image_dit_forward(
        params, CFG, jnp.asarray(g["zc_lat"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]),
        edit_latents=[jnp.asarray(g["zc_edit"])], zero_cond_t=True)
    np.testing.assert_allclose(np.asarray(out), g["zc_out"], atol=2e-4,
                               rtol=1e-3)


def test_edit_rope_interpolation(params, g):
    out = qwen_image_dit_forward(
        params, CFG, jnp.asarray(g["zc_lat"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]),
        edit_latents=[jnp.asarray(g["zc_edit"])],
        edit_rope_interpolation=True)
    np.testing.assert_allclose(np.asarray(out), g["eri_out"], atol=2e-4,
                               rtol=1e-3)


def test_pipeline_layered_inpaint_eligen(params, g):
    """Pipeline-level smoke over the new kwargs: layered output list,
    inpaint blending, entity control with precomputed embeds."""
    from PIL import Image

    from fairygen_tpu.models.qwen.vae import (
        WanVAEConfig,
        convert_qwen_image_vae_state_dict,
    )
    from fairygen_tpu.pipelines.qwen_image import QwenImagePipeline

    pg = np.load("tests/goldens/qwen_pipeline.npz")
    vae_p = convert_qwen_image_vae_state_dict(
        {k[4:]: pg[k] for k in pg.files if k.startswith("vae.")},
        WanVAEConfig.tiny_v1())
    pipe = QwenImagePipeline(
        dit_params=params, dit_cfg=CFG, vae_params=vae_p,
        vae_cfg=WanVAEConfig.tiny_v1(), dtype=jnp.float32)
    pe = jnp.asarray(g["prompt_emb"])

    # layered: 2+1 layers -> list of images
    out = pipe(prompt_emb=pe, cfg_scale=1.0, height=64, width=96,
               num_inference_steps=2, seed=0, layer_num=2)
    assert isinstance(out, list) and len(out) == 3
    assert out[0].shape == (64, 96, 3)

    # inpaint: masked region blends back to the input image
    img = Image.fromarray((np.random.default_rng(5).random(
        (64, 96, 3)) * 255).astype("uint8"))
    mask = Image.fromarray(
        (np.r_[np.zeros((32, 96)), np.ones((32, 96))] * 255
         ).astype("uint8")).convert("RGB")
    lat = pipe(prompt_emb=pe, cfg_scale=1.0, height=64, width=96,
               num_inference_steps=2, seed=0, input_image=img,
               inpaint_mask=mask, output_type="latent")
    assert np.isfinite(np.asarray(lat)).all()

    # eligen precomputed embeds + zero_cond_t combined smoke
    lat = pipe(prompt_emb=pe, cfg_scale=1.0, height=64, width=96,
               num_inference_steps=2, seed=0,
               eligen_entity_prompts=[jnp.asarray(g["ent_e1"]),
                                      jnp.asarray(g["ent_e2"])],
               eligen_entity_masks=jnp.asarray(g["ent_masks"]),
               output_type="latent")
    assert np.isfinite(np.asarray(lat)).all()


def test_eligen(params, g):
    out = qwen_image_dit_forward(
        params, CFG, jnp.asarray(g["zc_lat"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]),
        entity_prompt_embs=[jnp.asarray(g["ent_e1"]),
                            jnp.asarray(g["ent_e2"])],
        entity_masks=jnp.asarray(g["ent_masks"]))
    np.testing.assert_allclose(np.asarray(out), g["ent_out"], atol=2e-4,
                               rtol=1e-3)
