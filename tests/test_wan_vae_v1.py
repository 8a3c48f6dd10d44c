"""Wan2.1 16-ch causal VAE parity vs reference goldens."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.wan.vae import (
    WanVAEConfig, convert_vae_v1_state_dict, vae38_decode, vae38_encode,
)

CFG = WanVAEConfig.tiny_v1()


def _params(g):
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    return convert_vae_v1_state_dict(sd, CFG)


def test_v1_encode(goldens):
    g = goldens("wan_vae_v1")
    params = _params(g)
    z = vae38_encode(params, CFG, jnp.asarray(g["x"]))
    np.testing.assert_allclose(np.asarray(z), g["z"], atol=2e-4, rtol=1e-3)


def test_v1_decode(goldens):
    g = goldens("wan_vae_v1")
    params = _params(g)
    dec = vae38_decode(params, CFG, jnp.asarray(g["z"]), clamp=False)
    np.testing.assert_allclose(np.asarray(dec), g["dec"], atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_v1_streaming_matches_full(goldens):
    g = goldens("wan_vae_v1")
    params = _params(g)
    z_f = vae38_encode(params, CFG, jnp.asarray(g["x"]), streaming=False)
    z_s = vae38_encode(params, CFG, jnp.asarray(g["x"]), streaming=True)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_f), atol=1e-5)
    d_f = vae38_decode(params, CFG, jnp.asarray(g["z"]), streaming=False, clamp=False)
    d_s = vae38_decode(params, CFG, jnp.asarray(g["z"]), streaming=True, clamp=False)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_f), atol=1e-5)
