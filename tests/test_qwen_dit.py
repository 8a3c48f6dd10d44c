"""Qwen-Image MMDiT golden parity vs the reference torch implementation
(tools/gen_goldens_qwen_dit.py drives the real model_fn_qwen_image on a
hand-assembled tiny QwenImageDiT)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.dit import (
    QwenImageDiTConfig,
    convert_qwen_image_dit_state_dict,
    init_qwen_image_dit_params,
    qwen_image_dit_forward,
)

CFG = QwenImageDiTConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/qwen_dit.npz")


def _params(g):
    return convert_qwen_image_dit_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)


@pytest.mark.slow
def test_qwen_dit_matches_reference(g):
    out = qwen_image_dit_forward(
        _params(g), CFG, jnp.asarray(g["latents"]),
        jnp.asarray(g["timestep"]), jnp.asarray(g["prompt_emb"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


@pytest.mark.slow
def test_qwen_dit_edit_latents_matches_reference(g):
    out = qwen_image_dit_forward(
        _params(g), CFG, jnp.asarray(g["latents"]),
        jnp.asarray(g["timestep"]), jnp.asarray(g["prompt_emb"]),
        edit_latents=[jnp.asarray(g["edit"])],
    )
    np.testing.assert_allclose(np.asarray(out), g["out_edit"], atol=2e-4,
                               rtol=1e-3)


def test_qwen_dit_init_and_remat():
    import jax

    params = init_qwen_image_dit_params(jax.random.key(0), CFG)
    lat = jax.random.normal(jax.random.key(1), (2, 4, 8, 8)) * 0.3
    emb = jax.random.normal(jax.random.key(2), (2, 5, CFG.txt_dim))
    out = qwen_image_dit_forward(params, CFG, lat,
                                 jnp.asarray([300.0, 700.0]), emb)
    out_r = qwen_image_dit_forward(params, CFG, lat,
                                   jnp.asarray([300.0, 700.0]), emb,
                                   remat=True)
    assert out.shape == (2, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)
