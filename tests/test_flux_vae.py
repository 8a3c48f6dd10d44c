"""FLUX VAE golden parity (tiny hand-assembled reference encoder/decoder,
tools/gen_goldens_flux_vae.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.vae import (
    AutoencoderKLConfig,
    convert_flux_vae_state_dict,
    vae_decode,
    vae_encode,
)

CFG = AutoencoderKLConfig(latent_channels=4, block_out_channels=(8, 16, 32, 32),
                          norm_num_groups=4, scaling_factor=0.3611,
                          shift_factor=0.1159, use_quant_conv=False)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux_vae.npz")


def _params(g):
    return convert_flux_vae_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)


@pytest.mark.slow
def test_flux_vae_encode(g):
    mean = vae_encode(_params(g), CFG, jnp.asarray(g["img"]))
    # reference applies (mean - shift) * scale inside (flux_vae.py:432)
    z = (np.asarray(mean) - CFG.shift_factor) * CFG.scaling_factor
    np.testing.assert_allclose(z, g["lat"], atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_flux_vae_decode(g):
    # reference decode consumes the SCALED latent (flux_vae.py:350)
    z = jnp.asarray(g["z"]) / CFG.scaling_factor + CFG.shift_factor
    out = vae_decode(_params(g), CFG, z)
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-5,
                               rtol=1e-4)


def test_flux_config():
    c = AutoencoderKLConfig.flux()
    assert c.latent_channels == 16 and not c.use_quant_conv
    assert c.downscale_factor == 8
