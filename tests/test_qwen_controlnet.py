"""Qwen-Image blockwise-ControlNet parity vs the reference
QwenImageBlockwiseMultiControlNet → model_fn_qwen_image driver path
(tools/gen_goldens_qwen_controlnet.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.controlnet import (
    QwenImageBlockwiseControlNetConfig,
    convert_qwen_blockwise_controlnet_state_dict,
    detect_qwen_blockwise_controlnet_config,
    qwen_blockwise_cond_embed,
)
from fairygen_tpu.models.qwen.dit import (
    QwenImageDiTConfig,
    convert_qwen_image_dit_state_dict,
    patchify,
    qwen_image_dit_forward,
)

CFG = QwenImageDiTConfig.tiny()
CN_CFG = QwenImageBlockwiseControlNetConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/qwen_controlnet.npz")


def test_blockwise_controlnet_matches_reference(g):
    dit_p = convert_qwen_image_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)
    cn_p = convert_qwen_blockwise_controlnet_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("cn.")}, CN_CFG)
    cond_tokens = qwen_blockwise_cond_embed(
        cn_p, CN_CFG, patchify(jnp.asarray(g["cond"])))
    out = qwen_image_dit_forward(
        dit_p, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]),
        blockwise_controlnet=((cn_p["blocks"], cond_tokens, 0.7),))
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


def test_pipeline_with_blockwise_controlnet(g):
    """End-to-end smoke: VAE-encoded conditioning + mid-schedule gate
    transition through QwenImagePipeline."""
    from PIL import Image

    from fairygen_tpu.models.qwen.vae import (
        WanVAEConfig,
        convert_qwen_image_vae_state_dict,
    )
    from fairygen_tpu.pipelines.flux_image import ControlNetInput
    from fairygen_tpu.pipelines.qwen_image import QwenImagePipeline

    pg = np.load("tests/goldens/qwen_pipeline.npz")
    dit_p = convert_qwen_image_dit_state_dict(
        {k[4:]: pg[k] for k in pg.files if k.startswith("dit.")}, CFG)
    vae_p = convert_qwen_image_vae_state_dict(
        {k[4:]: pg[k] for k in pg.files if k.startswith("vae.")},
        WanVAEConfig.tiny_v1())
    cn_p = convert_qwen_blockwise_controlnet_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("cn.")}, CN_CFG)
    pipe = QwenImagePipeline(
        dit_params=dit_p, dit_cfg=CFG, vae_params=vae_p,
        vae_cfg=WanVAEConfig.tiny_v1(),
        blockwise_controlnets=[(cn_p, CN_CFG)], dtype=jnp.float32,
        steps_per_dispatch=4)
    img = Image.fromarray(
        (np.random.default_rng(1).random((64, 96, 3)) * 255).astype("uint8"))
    lat = pipe(
        prompt_emb=jnp.asarray(g["prompt_emb"]), cfg_scale=1.0,
        latents=np.random.default_rng(2).standard_normal(
            (1, 4, 8, 12)).astype("float32"),
        height=64, width=96, num_inference_steps=3,
        blockwise_controlnet_inputs=[
            ControlNetInput(image=img, scale=0.6, start=0.5)],
        output_type="latent",
    )
    assert lat.shape == (1, 4, 8, 12)
    assert np.isfinite(np.asarray(lat)).all()


def test_detect_config(g):
    sd = {k[3:]: g[k] for k in g.files if k.startswith("cn.")}
    cfg = detect_qwen_blockwise_controlnet_config(sd, base_in_dim=16)
    assert cfg.num_layers == 2 and cfg.in_dim == 16 and cfg.dim == 96
    assert cfg.additional_in_dim == 0


def test_interior_gate_window_matches_unchunked(g):
    """A blockwise-ControlNet start/end window fully INTERIOR to a
    dispatch chunk must still activate: chunked == step-at-a-time, and
    both differ from the no-controlnet run."""
    from PIL import Image

    from fairygen_tpu.models.qwen.vae import (
        WanVAEConfig,
        convert_qwen_image_vae_state_dict,
    )
    from fairygen_tpu.pipelines.flux_image import ControlNetInput
    from fairygen_tpu.pipelines.qwen_image import QwenImagePipeline

    pg = np.load("tests/goldens/qwen_pipeline.npz")
    dit_p = convert_qwen_image_dit_state_dict(
        {k[4:]: pg[k] for k in pg.files if k.startswith("dit.")}, CFG)
    vae_p = convert_qwen_image_vae_state_dict(
        {k[4:]: pg[k] for k in pg.files if k.startswith("vae.")},
        WanVAEConfig.tiny_v1())
    cn_p = convert_qwen_blockwise_controlnet_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("cn.")}, CN_CFG)
    img = Image.fromarray(
        (np.random.default_rng(1).random((64, 96, 3)) * 255).astype("uint8"))
    lat0 = np.random.default_rng(2).standard_normal(
        (1, 4, 8, 12)).astype("float32")

    def run(spd, cn):
        pipe = QwenImagePipeline(
            dit_params=dit_p, dit_cfg=CFG, vae_params=vae_p,
            vae_cfg=WanVAEConfig.tiny_v1(),
            blockwise_controlnets=[(cn_p, CN_CFG)], dtype=jnp.float32,
            steps_per_dispatch=spd)
        return np.asarray(pipe(
            prompt_emb=jnp.asarray(g["prompt_emb"]), cfg_scale=1.0,
            latents=lat0, height=64, width=96, num_inference_steps=6,
            blockwise_controlnet_inputs=(
                [ControlNetInput(image=img, scale=0.8, start=0.7, end=0.4)]
                if cn else None),
            output_type="latent"))

    chunked = run(6, cn=True)
    stepwise = run(1, cn=True)
    plain = run(6, cn=False)
    np.testing.assert_allclose(chunked, stepwise, atol=1e-5, rtol=1e-5)
    assert np.abs(chunked - plain).max() > 1e-6
