"""Z-Image DiT golden parity vs the reference model_fn_z_image
(tools/gen_goldens_z_image.py, tiny parameterized reference instance)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.z_image.dit import (
    ZImageDiTConfig,
    convert_z_image_dit_state_dict,
    init_z_image_dit_params,
    z_image_dit_forward,
)

CFG = ZImageDiTConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/z_image_dit.npz")


@pytest.mark.slow
def test_z_image_dit_matches_reference(g):
    params = convert_z_image_dit_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)
    # model_fn_z_image (z_image.py:237-257): t -> (1000-t)/1000, output
    # negated
    t = (1000.0 - jnp.asarray(g["timestep"])) / 1000.0
    out = -z_image_dit_forward(params, CFG, jnp.asarray(g["latents"]), t,
                               jnp.asarray(g["cap"]))
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


def test_z_image_init_and_remat():
    import jax

    params = init_z_image_dit_params(jax.random.key(0), CFG)
    lat = jax.random.normal(jax.random.key(1), (1, 4, 8, 8)) * 0.3
    cap = jax.random.normal(jax.random.key(2), (1, 5, CFG.cap_feat_dim))
    out = z_image_dit_forward(params, CFG, lat, jnp.asarray([0.4]), cap)
    out_r = z_image_dit_forward(params, CFG, lat, jnp.asarray([0.4]), cap,
                                remat=True)
    assert out.shape == (1, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)
