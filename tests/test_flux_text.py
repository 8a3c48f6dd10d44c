"""FLUX text-encoder golden parity (tools/gen_goldens_flux_text.py):
T5 v1.1 shared-bias mode vs transformers T5EncoderModel, and the CLIP
pooling path vs the reference FluxTextEncoderClip."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.text_encoders import (
    CLIPTextConfig,
    UMT5Config,
    clip_text_encode,
    convert_flux_clip_state_dict,
    convert_t5_encoder_state_dict,
    flux_encode_prompt_clip,
    umt5_encode,
)

T5_CFG = UMT5Config(vocab=96, dim=32, dim_attn=32, dim_ffn=48, num_heads=4,
                    num_layers=2, num_buckets=8, max_dist=32,
                    shared_pos_bias=True)
CLIP_CFG = CLIPTextConfig.tiny(vocab_size=100, hidden_size=32,
                               intermediate_size=64, num_layers=2,
                               num_heads=4, eos_token_id=99)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/flux_text.npz")


def test_t5_v1_1_matches_transformers(g):
    sd = {k[3:]: g[k] for k in g.files if k.startswith("t5.")}
    params = convert_t5_encoder_state_dict(sd, T5_CFG)
    out = umt5_encode(params, T5_CFG, jnp.asarray(g["t5_ids"]))
    np.testing.assert_allclose(np.asarray(out), g["t5_out"], atol=2e-5,
                               rtol=1e-4)


def test_flux_clip_pooled_matches_reference(g):
    sd = {k[5:]: g[k] for k in g.files if k.startswith("clip.")}
    params = convert_flux_clip_state_dict(sd, CLIP_CFG)
    pooled = flux_encode_prompt_clip(params, CLIP_CFG, jnp.asarray(g["clip_ids"]))
    np.testing.assert_allclose(np.asarray(pooled), g["clip_pooled"],
                               atol=2e-5, rtol=1e-4)


def test_flux_clip_skip_hidden_matches_reference(g):
    """The reference returns the clip_skip=2 hidden state alongside pooled
    (flux_text_encoder_clip.py:104-115); ours is hidden_states[-2]."""
    sd = {k[5:]: g[k] for k in g.files if k.startswith("clip.")}
    params = convert_flux_clip_state_dict(sd, CLIP_CFG)
    out = clip_text_encode(params, CLIP_CFG, jnp.asarray(g["clip_ids"]))
    np.testing.assert_allclose(np.asarray(out["hidden_states"][-2]),
                               g["clip_hidden"], atol=2e-5, rtol=1e-4)


def test_t5_v1_1_xxl_preset():
    c = UMT5Config.t5_v1_1_xxl()
    assert c.shared_pos_bias and c.vocab == 32128 and c.dim == 4096
