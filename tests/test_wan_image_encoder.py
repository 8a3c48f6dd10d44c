"""Wan CLIP image encoder (ViT) parity vs reference goldens."""
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.wan.image_encoder import (
    ViTConfig, convert_vit_state_dict, vit_forward,
)


def test_vit_31_block_forward(goldens):
    g = goldens("wan_clip")
    cfg = ViTConfig.tiny()
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    params = convert_vit_state_dict(sd, cfg)
    out = vit_forward(params, cfg, jnp.asarray(g["x"]), use_31_block=True)
    np.testing.assert_allclose(np.asarray(out), g["o"], atol=2e-5, rtol=1e-4)
