"""MoT (VAP) joint forward parity vs reference goldens."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.wan.dit import WanDiTConfig, convert_dit_state_dict
from fairygen_tpu.models.wan.mot import (
    MotConfig, convert_mot_state_dict, wan_dit_forward_vap,
)

DIT_CFG = WanDiTConfig(
    dim=96, in_dim=16, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
    patch_size=(1, 2, 2), num_heads=4, num_layers=4, has_image_input=True,
)
MOT_CFG = MotConfig(
    mot_layers=(0, 2), has_image_input=True, dim=96, num_heads=4,
    ffn_dim=128, freq_dim=32, text_dim=32, in_dim=8,
)


@pytest.mark.slow
def test_vap_forward(goldens):
    g = goldens("wan_mot")
    dit = convert_dit_state_dict(
        {k[5:]: g[k] for k in g.files if k.startswith("dit::")}, DIT_CFG)
    mot = convert_mot_state_dict(
        {k[5:]: g[k] for k in g.files if k.startswith("mot::")}, MOT_CFG)
    out = wan_dit_forward_vap(
        dit, DIT_CFG, mot, MOT_CFG,
        jnp.asarray(g["lat"]), jnp.asarray(g["ts"]), jnp.asarray(g["ctx"]),
        clip_feature=jnp.asarray(g["clip"]), y=jnp.asarray(g["y"]),
        vap_hidden_state=jnp.asarray(g["vap_hidden"]),
        context_vap=jnp.asarray(g["ctx_vap"]),
        vap_clip_feature=jnp.asarray(g["vap_clip"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["o"], atol=5e-4, rtol=1e-3)
