"""Qwen-Image VAE parity: the reference QwenImageVAE is the Wan2.1 causal
VAE with diffusers-style naming; key translation + shared implementation
must match its single-frame encode/decode (tools/gen_goldens_qwen_vae.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.vae import (
    WanVAEConfig,
    convert_qwen_image_vae_state_dict,
    qwen_image_vae_decode,
    qwen_image_vae_encode,
)

CFG = WanVAEConfig.tiny_v1()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/qwen_vae.npz")


def _params(g):
    return convert_qwen_image_vae_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)


@pytest.mark.slow
def test_qwen_vae_encode(g):
    lat = qwen_image_vae_encode(_params(g), CFG, jnp.asarray(g["img"]))
    np.testing.assert_allclose(np.asarray(lat), g["lat"], atol=2e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_qwen_vae_decode(g):
    dec = qwen_image_vae_decode(_params(g), CFG, jnp.asarray(g["z"]))
    np.testing.assert_allclose(np.asarray(dec), g["dec"], atol=5e-4,
                               rtol=1e-3)
