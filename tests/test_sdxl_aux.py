"""SDXL VAE + CLIP text encoder parity vs reference goldens."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.sdxl.vae import (
    AutoencoderKLConfig,
    convert_autoencoder_kl_state_dict,
    vae_decode,
    vae_encode,
)
from fairygen_tpu.models.sdxl.clip import (
    CLIPTextConfig,
    clip_text_encode,
    convert_clip_text_state_dict,
    sdxl_encode_prompt,
)

VAE_CFG = AutoencoderKLConfig.tiny()
TE1_CFG = CLIPTextConfig.tiny(eos_token_id=99)
TE2_CFG = CLIPTextConfig.tiny(hidden_size=48, intermediate_size=96,
                              hidden_act="gelu", projection_dim=40, eos_token_id=99)


def _sd(g, prefix):
    n = len(prefix) + 2
    return {k[n:]: g[k] for k in g.files if k.startswith(prefix + "::")}


@pytest.mark.slow
def test_autoencoder_kl(goldens):
    g = goldens("sdxl_aux")
    params = convert_autoencoder_kl_state_dict(_sd(g, "vae"), VAE_CFG)
    lat = vae_encode(params, VAE_CFG, jnp.asarray(g["vae_img"]))
    np.testing.assert_allclose(np.asarray(lat), g["vae_lat"], atol=2e-4, rtol=1e-3)
    dec = vae_decode(params, VAE_CFG, jnp.asarray(g["vae_lat"]))
    np.testing.assert_allclose(np.asarray(dec), g["vae_dec"], atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_clip_text_encoders(goldens):
    g = goldens("sdxl_aux")
    te1 = convert_clip_text_state_dict(_sd(g, "te1"), TE1_CFG)
    te2 = convert_clip_text_state_dict(_sd(g, "te2"), TE2_CFG)
    ids = jnp.asarray(g["ids"])
    o1 = clip_text_encode(te1, TE1_CFG, ids)
    np.testing.assert_allclose(
        np.asarray(o1["hidden_states"][-2]), g["te1_penult"], atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(o1["last_hidden_state"]), g["te1_last"], atol=2e-5, rtol=1e-4
    )
    o2 = clip_text_encode(te2, TE2_CFG, ids)
    np.testing.assert_allclose(
        np.asarray(o2["text_embeds"]), g["te2_text_embeds"], atol=2e-5, rtol=1e-4
    )
    emb, pooled = sdxl_encode_prompt(te1, TE1_CFG, te2, TE2_CFG, ids, ids)
    assert emb.shape == (2, 16, 32 + 48)
    np.testing.assert_allclose(np.asarray(pooled), g["te2_text_embeds"], atol=2e-5, rtol=1e-4)
