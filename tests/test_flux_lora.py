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


def test_kohya_alpha_scaling():
    """A kohya `.alpha` key scales the fused update by alpha/rank
    (reference guess_alpha, utils/lora/flux.py:113-123)."""
    from fairygen_tpu.models.flux.lora import guess_lora_alpha

    params = init_flux_dit_params(jax.random.key(20), CFG)
    base = np.asarray(params["double_blocks"]["attn"]["a_qkv"]["w"])
    A, B = _ba(21)
    sd = {
        "lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight": A,
        "lora_unet_double_blocks_0_img_attn_qkv.lora_up.weight":
            np.tile(B, (3, 1)),
        "lora_unet_double_blocks_0_img_attn_qkv.alpha": np.float32(6.0),
    }
    assert np.isclose(guess_lora_alpha(sd), np.sqrt(6.0 / R))
    params = load_flux_lora(params, CFG, sd)
    w = np.asarray(params["double_blocks"]["attn"]["a_qkv"]["w"])
    delta = (sd["lora_unet_double_blocks_0_img_attn_qkv.lora_up.weight"]
             @ sd["lora_unet_double_blocks_0_img_attn_qkv.lora_down.weight"]).T
    np.testing.assert_allclose(w[0], base[0] + (6.0 / R) * delta, atol=1e-4)


def _canonical_sd():
    A, B = _ba(22)
    return {
        "blocks.1.attn.a_to_qkv.lora_A.default.weight": np.tile(A, (1, 3)),
        "blocks.1.attn.a_to_qkv.lora_B.default.weight": np.tile(B, (3, 1)),
        "blocks.1.ff_b.0.lora_A.weight": A,
        "blocks.1.ff_b.0.lora_B.weight": B,
        "single_blocks.2.norm.linear.lora_A.weight": A,
        "single_blocks.2.norm.linear.lora_B.weight": B,
        "blocks.1.attn.a_to_q.lora_A.weight": A,  # no kohya name -> dropped
        "blocks.1.attn.a_to_q.lora_B.weight": B,
    }


def test_opensource_converter_roundtrip():
    from fairygen_tpu.models.flux.lora import (
        flux_lora_to_canonical, flux_lora_to_opensource)

    open_sd = flux_lora_to_opensource(_canonical_sd())
    assert "lora_unet_double_blocks_1_img_attn_qkv.lora_up.weight" in open_sd
    assert float(open_sd["lora_unet_double_blocks_1_img_attn_qkv.alpha"]) == R
    assert not any("a_to_q" in k for k in open_sd)
    back = flux_lora_to_canonical(open_sd)
    assert "blocks.1.attn.a_to_qkv.lora_A.weight" in back
    np.testing.assert_array_equal(
        back["single_blocks.2.norm.linear.lora_B.weight"],
        _canonical_sd()["single_blocks.2.norm.linear.lora_B.weight"])


def test_opensource_converter_differential_vs_reference():
    """Key-for-key, value-for-value match with the reference
    FluxLoRAConverter.align_to_opensource_format (flux.py:211-255)."""
    import os
    import sys

    if not os.path.isdir("/root/reference/animation"):
        pytest.skip("reference not mounted")
    sys.path.insert(0, "/root/reference/animation")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        import _ref_import
        import torch

        _ref_import.install_stubs()
        from diffsynth.utils.lora.flux import FluxLoRAConverter
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference diffsynth not importable: {e}")
    finally:
        sys.path.pop(0)
        sys.path.pop(0)

    from fairygen_tpu.models.flux.lora import flux_lora_to_opensource

    sd = _canonical_sd()
    ref = FluxLoRAConverter.align_to_opensource_format(
        {k: torch.tensor(v) for k, v in sd.items()})
    ours = flux_lora_to_opensource(sd)
    assert set(ref) == set(ours)
    for k in ref:
        np.testing.assert_allclose(np.asarray(ref[k]), ours[k], atol=1e-6)
