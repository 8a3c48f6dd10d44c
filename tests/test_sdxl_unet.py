"""SDXL UNet + BrushNet parity vs the vendored diffusers fork (goldens)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.sdxl.unet2d import (
    UNet2DConfig,
    brushnet_forward,
    convert_unet2d_state_dict,
    unet2d_forward,
)

UNET_CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    transformer_layers_per_block=(1, 2),
    num_attention_heads=(2, 4),
    cross_attention_dim=32,
    norm_num_groups=16,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=80,
)

BN_CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    mid_block_type="UNetMidBlock2D",
    transformer_layers_per_block=(0, 0),
    num_attention_heads=(2, 4),
    attention_head_dim=8,
    cross_attention_dim=32,
    norm_num_groups=16,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=80,
    conditioning_channels=5,
)


def _sd(g, prefix):
    n = len(prefix) + 2
    return {k[n:]: g[k] for k in g.files if k.startswith(prefix + "::")}


def _nhwc(a):
    return jnp.transpose(jnp.asarray(a), (0, 2, 3, 1))


def test_sdxl_unet_forward(goldens):
    g = goldens("sdxl_unet")
    params = convert_unet2d_state_dict(_sd(g, "unet"), UNET_CFG)
    out = unet2d_forward(
        params, UNET_CFG,
        jnp.asarray(g["sample"]), jnp.asarray(g["t"]), jnp.asarray(g["ehs"]),
        text_embeds=jnp.asarray(g["text_embeds"]), time_ids=jnp.asarray(g["time_ids"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["unet_out"], atol=2e-4, rtol=1e-3)


def test_brushnet_forward(goldens):
    g = goldens("sdxl_unet")
    params = convert_unet2d_state_dict(_sd(g, "bn"), BN_CFG)
    down, mid, up = brushnet_forward(
        params, BN_CFG,
        jnp.asarray(g["sample"]), jnp.asarray(g["t"]), jnp.asarray(g["ehs"]),
        jnp.asarray(g["cond"]),
        text_embeds=jnp.asarray(g["text_embeds"]), time_ids=jnp.asarray(g["time_ids"]),
        conditioning_scale=0.7,
    )
    assert len(down) == 6 and len(up) == 7
    for i, d in enumerate(down):
        np.testing.assert_allclose(
            np.asarray(d), np.asarray(_nhwc(g[f"bn_down_{i}"])), atol=2e-4, rtol=1e-3
        )
    np.testing.assert_allclose(np.asarray(mid), np.asarray(_nhwc(g["bn_mid"])), atol=2e-4, rtol=1e-3)
    for i, u in enumerate(up):
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(_nhwc(g[f"bn_up_{i}"])), atol=3e-4, rtol=1e-3
        )


def test_dual_branch_injection(goldens):
    g = goldens("sdxl_unet")
    unet_params = convert_unet2d_state_dict(_sd(g, "unet"), UNET_CFG)
    bn_params = convert_unet2d_state_dict(_sd(g, "bn"), BN_CFG)
    down, mid, up = brushnet_forward(
        bn_params, BN_CFG,
        jnp.asarray(g["sample"]), jnp.asarray(g["t"]), jnp.asarray(g["ehs"]),
        jnp.asarray(g["cond"]),
        text_embeds=jnp.asarray(g["text_embeds"]), time_ids=jnp.asarray(g["time_ids"]),
        conditioning_scale=0.7,
    )
    out = unet2d_forward(
        unet_params, UNET_CFG,
        jnp.asarray(g["sample"]), jnp.asarray(g["t"]), jnp.asarray(g["ehs"]),
        text_embeds=jnp.asarray(g["text_embeds"]), time_ids=jnp.asarray(g["time_ids"]),
        down_block_add_samples=list(down),
        mid_block_add_sample=mid,
        up_block_add_samples=list(up),
    )
    np.testing.assert_allclose(np.asarray(out), g["unet_injected_out"], atol=5e-4, rtol=1e-3)
