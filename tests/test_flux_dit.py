"""FLUX.1 MMDiT golden parity vs the reference torch implementation
(goldens produced by tools/gen_goldens_flux.py driving the REAL
model_fn_flux_image on a hand-assembled tiny FluxDiT)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.dit import (
    FluxDiTConfig,
    convert_flux_dit_state_dict,
    flux_dit_forward,
    init_flux_dit_params,
    prepare_image_ids,
)

CFG = FluxDiTConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux_dit.npz")


def _sd(g):
    return {k[3:]: g[k] for k in g.files if k.startswith("sd.")}


def test_flux_dit_matches_reference(g):
    params = convert_flux_dit_state_dict(_sd(g), CFG)
    out = flux_dit_forward(
        params, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


def test_flux_dit_prescaled_matches(g):
    """scale·log2e folded into the q-norm gammas == unscaled path."""
    params = convert_flux_dit_state_dict(_sd(g), CFG, prescale=True)
    out = flux_dit_forward(
        params, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]), prescaled=True,
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=5e-4,
                               rtol=1e-3)


def test_flux_dit_kontext_matches_reference(g):
    from fairygen_tpu.models.flux.dit import patchify

    params = convert_flux_dit_state_dict(_sd(g), CFG)
    kontext = jnp.asarray(g["kontext"])
    kid = prepare_image_ids(kontext.shape[2], kontext.shape[3]).copy()
    kid[:, 0] += 1
    out = flux_dit_forward(
        params, CFG, jnp.asarray(g["latents"]), jnp.asarray(g["timestep"]),
        jnp.asarray(g["prompt_emb"]), jnp.asarray(g["pooled"]),
        jnp.asarray(g["guidance"]),
        kontext_latents=patchify(kontext), kontext_image_ids=kid,
    )
    np.testing.assert_allclose(np.asarray(out), g["out_kontext"], atol=2e-4,
                               rtol=1e-3)


def test_flux_dit_init_and_remat():
    import jax

    params = init_flux_dit_params(jax.random.key(0), CFG)
    lat = jax.random.normal(jax.random.key(1), (2, 4, 8, 8)) * 0.3
    out = flux_dit_forward(
        params, CFG, lat, jnp.asarray([500.0, 100.0]),
        jax.random.normal(jax.random.key(2), (2, 6, CFG.context_dim)),
        jax.random.normal(jax.random.key(3), (2, CFG.pooled_dim)),
        jnp.asarray([3.5, 3.5]),
    )
    assert out.shape == (2, 4, 8, 8)
    out_r = flux_dit_forward(
        params, CFG, lat, jnp.asarray([500.0, 100.0]),
        jax.random.normal(jax.random.key(2), (2, 6, CFG.context_dim)),
        jax.random.normal(jax.random.key(3), (2, CFG.pooled_dim)),
        jnp.asarray([3.5, 3.5]), remat=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)
