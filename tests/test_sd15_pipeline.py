"""End-to-end SD1.5+BrushNet pipeline parity vs the reference pipeline
(UniPC sampler — the test_brushnet.py configuration)."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.sdxl.unet2d import UNet2DConfig, convert_unet2d_state_dict
from fairygen_tpu.models.sdxl.vae import (
    AutoencoderKLConfig,
    convert_autoencoder_kl_state_dict,
)
from fairygen_tpu.pipelines.sd15_brushnet import SD15BrushNetPipeline

UNET_CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(4, 8),  # attention_head_dim=8 at (32, 64) channels
    cross_attention_dim=32,
    norm_num_groups=16,
    addition_embed_type=None,
)
BN_CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    mid_block_type="UNetMidBlock2D",
    transformer_layers_per_block=(0, 0),
    num_attention_heads=(4, 8),
    attention_head_dim=8,
    cross_attention_dim=32,
    norm_num_groups=16,
    addition_embed_type=None,
    conditioning_channels=5,
)
VAE_CFG = AutoencoderKLConfig.tiny(scaling_factor=0.18215)


def _sd(g, prefix):
    n = len(prefix) + 2
    return {k[n:]: g[k] for k in g.files if k.startswith(prefix + "::")}


@pytest.mark.slow
def test_brushnet_sd15_pipeline_end_to_end(goldens):
    g = goldens("sd15_pipeline")
    pipe = SD15BrushNetPipeline(
        unet_params=convert_unet2d_state_dict(_sd(g, "unet"), UNET_CFG),
        unet_cfg=UNET_CFG,
        vae_params=convert_autoencoder_kl_state_dict(_sd(g, "vae"), VAE_CFG),
        vae_cfg=VAE_CFG,
        brushnet_params=convert_unet2d_state_dict(_sd(g, "bn"), BN_CFG),
        brushnet_cfg=BN_CFG,
    )
    frames = pipe(
        prompt_embeds=jnp.asarray(g["pe"]),
        negative_prompt_embeds=jnp.asarray(g["npe"]),
        image=g["masked_u8"].astype(np.float32) / 255.0,
        mask=g["mask_u8"].astype(np.float32) / 255.0,
        height=64, width=64, num_inference_steps=6,
        guidance_scale=7.5, brushnet_conditioning_scale=1.0,
        seed=88, torch_compat_noise=True,
    )
    ours = frames[0].astype(np.float32)
    ref = (g["img_out"] * 255.0).astype(np.float32) if g["img_out"].dtype != np.uint8 \
        else g["img_out"].astype(np.float32)
    assert ours.shape == ref.shape
    diff = np.abs(ours - ref)
    assert diff.max() <= 3, f"max pixel diff {diff.max()}"
    mse = np.mean((ours - ref) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
    assert psnr > 45, f"PSNR {psnr:.1f} dB"


def test_blended_paste():
    """blended=True keeps original pixels outside the blurred mask
    (reference test_brushnet.py:55-67)."""
    from fairygen_tpu.pipelines.sd15_brushnet import blend_with_original

    rs = np.random.RandomState(0)
    gen = jnp.asarray(rs.rand(1, 3, 32, 32) * 2 - 1, jnp.float32)
    orig = rs.rand(32, 32, 3).astype(np.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[8:16, 8:16] = 1.0
    out = np.asarray(blend_with_original(gen, orig, mask))
    orig_pm1 = orig.transpose(2, 0, 1)[None] * 2 - 1
    # far outside the mask: original pixels survive exactly
    np.testing.assert_allclose(out[:, :, 28:, 28:], orig_pm1[:, :, 28:, 28:],
                               atol=1e-5)
    # inside the mask: generated pixels dominate
    assert np.abs(out[:, :, 10:14, 10:14] - np.asarray(gen)[:, :, 10:14, 10:14]).max() < 0.2


@pytest.mark.slow
def test_sd15_text_encode_shapes(goldens):
    """SD1.5 prompt embedding uses the FINAL layer norm states (768-dim),
    not SDXL's penultimate concat."""
    import jax
    from fairygen_tpu.models.sdxl.clip import CLIPTextConfig, clip_text_encode

    cfg = CLIPTextConfig(hidden_size=32, num_heads=4, num_layers=2,
                         intermediate_size=64, vocab_size=100)
    rs = np.random.RandomState(0)
    params = {
        "token_embedding": jnp.asarray(rs.randn(100, 32) * 0.02, jnp.float32),
        "position_embedding": jnp.asarray(rs.randn(77, 32) * 0.02, jnp.float32),
        "final_layer_norm": {"w": jnp.ones((32,)), "b": jnp.zeros((32,))},
        "layers": [
            {
                "ln1": {"w": jnp.ones((32,)), "b": jnp.zeros((32,))},
                "ln2": {"w": jnp.ones((32,)), "b": jnp.zeros((32,))},
                "attn": {
                    "q_proj": {"w": jnp.asarray(rs.randn(32, 32) * 0.05, jnp.float32), "b": jnp.zeros((32,))},
                    "k_proj": {"w": jnp.asarray(rs.randn(32, 32) * 0.05, jnp.float32), "b": jnp.zeros((32,))},
                    "v_proj": {"w": jnp.asarray(rs.randn(32, 32) * 0.05, jnp.float32), "b": jnp.zeros((32,))},
                    "out_proj": {"w": jnp.asarray(rs.randn(32, 32) * 0.05, jnp.float32), "b": jnp.zeros((32,))},
                },
                "fc1": {"w": jnp.asarray(rs.randn(32, 64) * 0.05, jnp.float32), "b": jnp.zeros((64,))},
                "fc2": {"w": jnp.asarray(rs.randn(64, 32) * 0.05, jnp.float32), "b": jnp.zeros((32,))},
            }
            for _ in range(2)
        ],
    }
    ids = jnp.asarray(rs.randint(0, 100, (1, 77)))
    out = clip_text_encode(params, cfg, ids)
    assert out["last_hidden_state"].shape == (1, 77, 32)
    assert np.isfinite(np.asarray(out["last_hidden_state"])).all()
