"""FLUX LoRA fusion: diffusers and civitai layouts onto the stacked
pytree, with q/k/v adapters landing on the fused-projection column
slices (reference FluxLoRALoader, utils/lora/flux.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fairygen_tpu.models.flux.dit import FluxDiTConfig, init_flux_dit_params
from fairygen_tpu.models.flux.lora import load_flux_lora

CFG = FluxDiTConfig.tiny()
D, R = CFG.dim, 3


def _ba(key):
    k1, k2 = jax.random.split(jax.random.key(key))
    A = np.asarray(jax.random.normal(k1, (R, D)))  # lora_A (r, in)
    B = np.asarray(jax.random.normal(k2, (D, R)))  # lora_B (out, r)
    return A, B


@pytest.mark.slow
def test_diffusers_layout_slices():
    params = init_flux_dit_params(jax.random.key(0), CFG)
    base = np.asarray(params["double_blocks"]["attn"]["a_qkv"]["w"]).copy()
    base_sgl = np.asarray(params["single_blocks"]["to_qkv_mlp"]["w"]).copy()
    A, B = _ba(1)
    A2, B2 = _ba(2)
    sd = {
        "transformer.transformer_blocks.1.attn.to_k.lora_A.weight": A,
        "transformer.transformer_blocks.1.attn.to_k.lora_B.weight": B,
        "transformer.single_transformer_blocks.0.proj_mlp.lora_A.weight": A2,
        "transformer.single_transformer_blocks.0.proj_mlp.lora_B.weight":
            np.concatenate([B2] * 4, axis=0),  # (4d, r) mlp width
    }
    params = load_flux_lora(params, CFG, sd, alpha=0.5)
    w = np.asarray(params["double_blocks"]["attn"]["a_qkv"]["w"])
    delta = 0.5 * (B @ A).T
    # to_k -> columns [d, 2d) of block 1's fused qkv
    np.testing.assert_allclose(w[1, :, D:2 * D], base[1, :, D:2 * D] + delta,
                               atol=1e-5)
    # untouched: other columns, other blocks
    np.testing.assert_array_equal(w[1, :, :D], base[1, :, :D])
    np.testing.assert_array_equal(w[0], base[0])
    # proj_mlp -> columns [3d, 7d) of single block 0
    ws = np.asarray(params["single_blocks"]["to_qkv_mlp"]["w"])
    delta2 = 0.5 * (np.concatenate([B2] * 4, axis=0) @ A2).T
    np.testing.assert_allclose(ws[0, :, 3 * D:], base_sgl[0, :, 3 * D:] + delta2,
                               atol=1e-5)
    np.testing.assert_array_equal(ws[0, :, :3 * D], base_sgl[0, :, :3 * D])


@pytest.mark.slow
def test_civitai_layout_fused_qkv():
    params = init_flux_dit_params(jax.random.key(3), CFG)
    base = np.asarray(params["double_blocks"]["attn"]["b_qkv"]["w"]).copy()
    A, _ = _ba(4)
    B3 = np.asarray(jax.random.normal(jax.random.key(5), (3 * D, R)))
    sd = {
        "lora_unet_double_blocks_0_txt_attn_qkv.lora_down.weight": A,
        "lora_unet_double_blocks_0_txt_attn_qkv.lora_up.weight": B3,
    }
    params = load_flux_lora(params, CFG, sd, alpha=1.0)
    w = np.asarray(params["double_blocks"]["attn"]["b_qkv"]["w"])
    np.testing.assert_allclose(w[0], base[0] + (B3 @ A).T, atol=1e-5)


@pytest.mark.slow
def test_forward_changes_after_lora():
    from fairygen_tpu.models.flux.dit import flux_dit_forward

    params = init_flux_dit_params(jax.random.key(6), CFG)
    lat = jax.random.normal(jax.random.key(7), (1, 4, 8, 8)) * 0.3
    args = (lat, jnp.asarray([500.0]),
            jax.random.normal(jax.random.key(8), (1, 6, CFG.context_dim)),
            jax.random.normal(jax.random.key(9), (1, CFG.pooled_dim)),
            jnp.asarray([3.5]))
    out0 = flux_dit_forward(params, CFG, *args)
    A, B = _ba(10)
    sd = {
        "transformer.transformer_blocks.0.attn.to_q.lora_A.weight": A * 0.01,
        "transformer.transformer_blocks.0.attn.to_q.lora_B.weight": B * 0.01,
    }
    params = load_flux_lora(params, CFG, sd)
    out1 = flux_dit_forward(params, CFG, *args)
    assert float(jnp.abs(out1 - out0).max()) > 1e-7


def test_unrecognized_lora_raises():
    import pytest

    params = init_flux_dit_params(jax.random.key(11), CFG)
    with pytest.raises(ValueError):
        load_flux_lora(params, CFG, {"bogus.key": np.zeros((2, 2))})
