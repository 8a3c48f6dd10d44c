"""FLUX.2 golden parity (tools/gen_goldens_flux2.py): DiT through the
real model_fn_flux2 and the pack+BatchNorm VAE wrapper."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux2.dit import (
    Flux2DiTConfig,
    convert_flux2_dit_state_dict,
    flux2_dit_forward,
    init_flux2_dit_params,
    prepare_image_ids,
)
from fairygen_tpu.models.flux2.vae import (
    AutoencoderKLConfig,
    convert_flux2_vae_state_dict,
    flux2_vae_decode,
    flux2_vae_encode,
)

DIT_CFG = Flux2DiTConfig.tiny()
VAE_CFG = AutoencoderKLConfig(latent_channels=4,
                              block_out_channels=(8, 16, 32, 32),
                              layers_per_block=1, norm_num_groups=4,
                              scaling_factor=1.0)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux2.npz")


@pytest.mark.slow
def test_flux2_dit_matches_reference(g):
    params = convert_flux2_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, DIT_CFG)
    # model_fn_flux2 passes timestep/1000 (flux2_image.py:362)
    out = flux2_dit_forward(
        params, DIT_CFG, jnp.asarray(g["lat"]),
        jnp.asarray(g["ts"]) / 1000.0, jnp.asarray(g["prompt"]),
        jnp.asarray([4.0]), img_ids=prepare_image_ids(4, 6),
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_flux2_vae_roundtrip_matches_reference(g):
    params = convert_flux2_vae_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("vae.")}, VAE_CFG)
    tokens = flux2_vae_encode(params, VAE_CFG, jnp.asarray(g["img"]))
    np.testing.assert_allclose(np.asarray(tokens), g["tokens"], atol=2e-4,
                               rtol=1e-3)
    dec = flux2_vae_decode(params, VAE_CFG, jnp.asarray(g["tokens"]), 4, 4)
    np.testing.assert_allclose(np.asarray(dec), g["dec"], atol=5e-4,
                               rtol=1e-3)


def test_flux2_dit_init_and_remat():
    import jax

    params = init_flux2_dit_params(jax.random.key(0), DIT_CFG)
    lat = jax.random.normal(jax.random.key(1), (1, 24, 16)) * 0.3
    prompt = jax.random.normal(jax.random.key(2), (1, 5, 48))
    args = (lat, jnp.asarray([0.5]), prompt, jnp.asarray([4.0]))
    kw = dict(img_ids=prepare_image_ids(4, 6))
    out = flux2_dit_forward(params, DIT_CFG, *args, **kw)
    out_r = flux2_dit_forward(params, DIT_CFG, *args, remat=True, **kw)
    assert out.shape == (1, 24, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)
