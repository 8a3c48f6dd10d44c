"""SD1.5-style UNet (conv projections, no text_time) + BrushNet injection."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.sdxl.unet2d import (
    UNet2DConfig, brushnet_forward, convert_unet2d_state_dict, unet2d_forward,
)

UNET_CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(8, 8),
    cross_attention_dim=24,
    norm_num_groups=16,
    addition_embed_type=None,
)
BN_CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    mid_block_type="UNetMidBlock2D",
    transformer_layers_per_block=(0, 0),
    num_attention_heads=(8, 8),
    attention_head_dim=8,
    cross_attention_dim=24,
    norm_num_groups=16,
    addition_embed_type=None,
    conditioning_channels=5,
)


def _sd(g, prefix):
    n = len(prefix) + 2
    return {k[n:]: g[k] for k in g.files if k.startswith(prefix + "::")}


@pytest.mark.slow
def test_sd15_dual_branch(goldens):
    g = goldens("sd15_unet")
    unet = convert_unet2d_state_dict(_sd(g, "unet"), UNET_CFG)
    bn = convert_unet2d_state_dict(_sd(g, "bn"), BN_CFG)
    down, mid, up = brushnet_forward(
        bn, BN_CFG, jnp.asarray(g["sample"]), jnp.asarray(g["t"]),
        jnp.asarray(g["ehs"]), jnp.asarray(g["cond"]), conditioning_scale=1.0,
    )
    out = unet2d_forward(
        unet, UNET_CFG, jnp.asarray(g["sample"]), jnp.asarray(g["t"]),
        jnp.asarray(g["ehs"]),
        down_block_add_samples=list(down), mid_block_add_sample=mid,
        up_block_add_samples=list(up),
    )
    np.testing.assert_allclose(np.asarray(out), g["o"], atol=5e-4, rtol=1e-3)
