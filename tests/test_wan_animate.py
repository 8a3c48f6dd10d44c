"""Animate adapter component parity vs reference goldens."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.wan.animate import (
    AnimateConfig,
    animate_after_transformer_block,
    convert_animate_state_dict,
    face_block_forward,
    face_encoder_forward,
    get_motion,
)

CFG = AnimateConfig(
    hidden_dim=96, heads_num=4, num_adapter_layers=1, adapter_stride=5,
    face_in_dim=512, face_heads=2, face_inner=1024,
    motion_size=8, style_dim=64, motion_dim=8, pose_in_dim=16,
)


def _params(g):
    sd = {}
    for k in g.files:
        if k.startswith("gen::"):
            sd["motion_encoder." + k[5:]] = g[k].astype(np.float32)
        elif k.startswith("fe::"):
            sd["face_encoder." + k[4:]] = g[k].astype(np.float32)
        elif k.startswith("fb::"):
            sd["face_adapter.fuser_blocks.0." + k[4:]] = g[k].astype(np.float32)
    sd["pose_patch_embedding.weight"] = np.zeros((96, 16, 1, 2, 2), np.float32)
    sd["pose_patch_embedding.bias"] = np.zeros((96,), np.float32)
    return convert_animate_state_dict(sd, CFG)


@pytest.mark.slow
def test_motion_encoder(goldens):
    g = goldens("wan_animate")
    params = _params(g)
    motion = get_motion(params["motion_encoder"], jnp.asarray(g["gen_img"]))
    np.testing.assert_allclose(np.asarray(motion), g["gen_motion"], atol=2e-3, rtol=1e-2)


@pytest.mark.slow
def test_face_encoder(goldens):
    g = goldens("wan_animate")
    params = _params(g)
    enc = face_encoder_forward(params["face_encoder"], CFG, jnp.asarray(g["fe_in"]))
    np.testing.assert_allclose(np.asarray(enc), g["fe_out"], atol=2e-4, rtol=1e-3)


def test_face_block_and_injection(goldens):
    g = goldens("wan_animate")
    params = _params(g)
    res = face_block_forward(
        params["face_adapter"][0], CFG, jnp.asarray(g["fb_x"]), jnp.asarray(g["fb_mvec"])
    )
    np.testing.assert_allclose(np.asarray(res), g["fb_out"], atol=2e-4, rtol=1e-3)

    x = jnp.asarray(g["fb_x"])
    out = animate_after_transformer_block(params, CFG, 0, x, jnp.asarray(g["fb_mvec"]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) + g["fb_out"], atol=2e-4)
    # non-mapped layer: identity
    out2 = animate_after_transformer_block(params, CFG, 3, x, jnp.asarray(g["fb_mvec"]))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(x))
