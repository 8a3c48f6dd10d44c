"""FLUX ControlNet parity vs the reference MultiControlNet →
model_fn_flux_image driver path (tools/gen_goldens_flux_controlnet.py):
union-mode embedding prepend, tap alignment, scale, progress gating, and
the main-DiT residual adds."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.controlnet import (
    FluxControlNetConfig,
    align_controlnet_res,
    convert_flux_controlnet_state_dict,
    detect_flux_controlnet_config,
    flux_controlnet_forward,
)
from fairygen_tpu.models.flux.dit import (
    FluxDiTConfig,
    convert_flux_dit_state_dict,
    flux_dit_forward,
)

CFG = FluxDiTConfig.tiny()
CN_CFG = FluxControlNetConfig.tiny(mode_dict=(("canny", 0), ("tile", 1)))


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux_controlnet.npz")


def _params(g):
    dit = convert_flux_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)
    cn = convert_flux_controlnet_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("cn.")}, CN_CFG)
    return dit, cn


def _run(g, scale):
    dit_p, cn_p = _params(g)
    args = (jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
            jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
            jnp.asarray(g["guidance"]))
    res, sres = flux_controlnet_forward(
        cn_p, CN_CFG, args[0], jnp.asarray(g["cn_cond"]), *args[1:],
        processor_id="canny")
    # the reference aligns onto the REAL FluxDiT's 19/38 blocks regardless
    # of the driven model's depth (flux_controlnet.py:160-161), then the
    # driver consumes the first len(dit.blocks) entries
    r = align_controlnet_res(res, 19)[: CFG.num_double_blocks] * scale
    sr = align_controlnet_res(sres, 38)[: CFG.num_single_blocks] * scale
    return flux_dit_forward(dit_p, CFG, *args, controlnet_res=r,
                            controlnet_single_res=sr)


def test_controlnet_matches_reference(g):
    out = _run(g, scale=0.8)
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


def test_gated_off_matches_plain_dit(g):
    """progress outside [end, start] -> the reference skips the controlnet
    entirely (flux_image.py:44-45); out_gated is the plain DiT forward."""
    dit_p, _ = _params(g)
    out = flux_dit_forward(
        dit_p, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]))
    np.testing.assert_allclose(np.asarray(out), g["out_gated"], atol=2e-4,
                               rtol=1e-3)


def test_pipeline_with_controlnet(g):
    """End-to-end: VAE-encoded conditioning, gate transition mid-schedule
    (start=0.5 -> the first dispatch runs without the controlnet), latent
    output stays finite."""
    from PIL import Image

    from fairygen_tpu.models.flux.vae import (
        AutoencoderKLConfig,
        convert_flux_vae_state_dict,
    )
    from fairygen_tpu.pipelines.flux_image import (
        ControlNetInput,
        FluxImagePipeline,
    )

    dit_p, cn_p = _params(g)
    vg = np.load("tests/goldens/flux_vae.npz")
    vae_cfg = AutoencoderKLConfig(
        latent_channels=4, block_out_channels=(8, 16, 32, 32),
        norm_num_groups=4, scaling_factor=0.3611, shift_factor=0.1159,
        use_quant_conv=False)
    vae_p = convert_flux_vae_state_dict(
        {k[3:]: vg[k] for k in vg.files if k.startswith("sd.")}, vae_cfg)
    pipe = FluxImagePipeline(
        dit_params=dit_p, dit_cfg=CFG, vae_params=vae_p, vae_cfg=vae_cfg,
        controlnets=[(cn_p, CN_CFG)], dtype=jnp.float32,
        steps_per_dispatch=4)
    img = Image.fromarray(
        (np.random.default_rng(0).random((64, 96, 3)) * 255).astype("uint8"))
    lat = pipe(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        pooled_prompt_emb=jnp.asarray(g["pooled"]),
        latents=g["latents"], height=64, width=96, num_inference_steps=3,
        controlnet_inputs=[
            ControlNetInput(image=img, scale=0.7, start=0.5,
                            processor_id="canny")],
        output_type="latent",
    )
    assert lat.shape == (1, 4, 8, 12)
    assert np.isfinite(np.asarray(lat)).all()


def test_detect_config_from_shapes(g):
    sd = {k[3:]: g[k] for k in g.files if k.startswith("cn.")}
    cfg = detect_flux_controlnet_config(sd, base=CFG)
    assert cfg.num_joint_blocks == 2 and cfg.num_single_blocks == 2
    assert cfg.guidance_embed and cfg.mode_dict and \
        cfg.additional_input_dim == 0


def test_interior_gate_window_matches_unchunked(g):
    """A start/end window fully INTERIOR to a dispatch chunk must still
    activate the controlnet: chunked (steps_per_dispatch=6) output must
    equal the step-at-a-time (steps_per_dispatch=1) output, and differ
    from a run without the controlnet."""
    from PIL import Image

    from fairygen_tpu.models.flux.vae import (
        AutoencoderKLConfig,
        convert_flux_vae_state_dict,
    )
    from fairygen_tpu.pipelines.flux_image import (
        ControlNetInput,
        FluxImagePipeline,
    )

    dit_p, cn_p = _params(g)
    vg = np.load("tests/goldens/flux_vae.npz")
    vae_cfg = AutoencoderKLConfig(
        latent_channels=4, block_out_channels=(8, 16, 32, 32),
        norm_num_groups=4, scaling_factor=0.3611, shift_factor=0.1159,
        use_quant_conv=False)
    vae_p = convert_flux_vae_state_dict(
        {k[3:]: vg[k] for k in vg.files if k.startswith("sd.")}, vae_cfg)
    img = Image.fromarray(
        (np.random.default_rng(1).random((64, 96, 3)) * 255).astype("uint8"))

    def run(spd, cn):
        pipe = FluxImagePipeline(
            dit_params=dit_p, dit_cfg=CFG, vae_params=vae_p, vae_cfg=vae_cfg,
            controlnets=[(cn_p, CN_CFG)], dtype=jnp.float32,
            steps_per_dispatch=spd)
        return np.asarray(pipe(
            prompt_emb=jnp.asarray(g["prompt_emb"]),
            pooled_prompt_emb=jnp.asarray(g["pooled"]),
            latents=g["latents"], height=64, width=96,
            num_inference_steps=6,
            controlnet_inputs=(
                [ControlNetInput(image=img, scale=0.9, start=0.7, end=0.4,
                                 processor_id="canny")] if cn else None),
            output_type="latent"))

    chunked = run(6, cn=True)
    stepwise = run(1, cn=True)
    plain = run(6, cn=False)
    np.testing.assert_allclose(chunked, stepwise, atol=1e-5, rtol=1e-5)
    assert np.abs(chunked - plain).max() > 1e-6, \
        "interior-window controlnet had no effect"
