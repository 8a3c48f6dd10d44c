"""Value-control + InfiniteYou parity (tools/gen_goldens_flux_extras.py):
SingleValueEncoder tokens, the Perceiver identity projector, and the
id_emb-driven controlnet path through the reference driver."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.controlnet import (
    FluxControlNetConfig,
    align_controlnet_res,
    convert_flux_controlnet_state_dict,
    flux_controlnet_forward,
)
from fairygen_tpu.models.flux.dit import (
    FluxDiTConfig,
    convert_flux_dit_state_dict,
    flux_dit_forward,
)
from fairygen_tpu.models.flux.infiniteyou import (
    convert_infiniteyou_state_dict,
    infiniteyou_project,
)
from fairygen_tpu.models.flux.value_control import (
    SingleValueEncoderConfig,
    convert_single_value_encoder_state_dict,
    single_value_encode,
)

CFG = FluxDiTConfig.tiny()
CN_CFG = FluxControlNetConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux_extras.npz")


def test_value_encoder_matches_reference(g):
    params, cfg = convert_single_value_encoder_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("ve.")})
    assert cfg.prefer_len == 4 and cfg.dim_out == 48
    emb = single_value_encode(params, cfg, 0.73)
    np.testing.assert_allclose(np.asarray(emb), g["value_emb"], atol=2e-5,
                               rtol=1e-4)


def test_infiniteyou_projector_matches_reference(g):
    from fairygen_tpu.models.flux.infiniteyou import (
        InfiniteYouProjectorConfig,
    )

    # heads/dim_head are not derivable from shapes -> explicit tiny cfg
    # (the published checkpoint matches the dataclass defaults)
    params, cfg = convert_infiniteyou_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("iy.")},
        cfg=InfiniteYouProjectorConfig.tiny())
    assert cfg.depth == 2 and cfg.num_queries == 2
    out = infiniteyou_project(params, cfg, jnp.asarray(g["id_raw"]))
    np.testing.assert_allclose(np.asarray(out), g["id_emb"], atol=2e-5,
                               rtol=1e-4)


def test_id_emb_controlnet_path(g):
    """The controlnet consumes the identity tokens as its prompt with its
    own guidance (model_fn_flux_image:1087-1090)."""
    dit_p = convert_flux_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)
    cn_p = convert_flux_controlnet_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("cn.")}, CN_CFG)
    args = (jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]))
    res, sres = flux_controlnet_forward(
        cn_p, CN_CFG, args[0], jnp.asarray(g["cn_cond"]), args[1],
        jnp.asarray(g["id_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray([1.0]))
    r = align_controlnet_res(res, 19)[: CFG.num_double_blocks]
    sr = align_controlnet_res(sres, 38)[: CFG.num_single_blocks]
    out = flux_dit_forward(
        dit_p, CFG, *args, jnp.asarray(g["prompt_emb"]),
        jnp.asarray(g["pooled"]), jnp.asarray(g["guidance"]),
        controlnet_res=r, controlnet_single_res=sr)
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)
