"""Qwen2.5-VL text-encoder golden parity vs transformers
(tools/gen_goldens_qwen_text.py): GQA + rotate-half RoPE (mRoPE reduces
to 1D for text) + SwiGLU, padding mask, post-final-norm hidden state."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.text_encoder import (
    QwenVLTextConfig,
    convert_qwen_vl_text_state_dict,
    qwen_vl_text_encode,
)

CFG = QwenVLTextConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/qwen_text.npz")


def test_qwen_vl_text_matches_transformers(g):
    params = convert_qwen_vl_text_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)
    out = qwen_vl_text_encode(params, CFG, jnp.asarray(g["ids"]),
                              attention_mask=jnp.asarray(g["mask"]))
    ref = g["out"]
    mask = g["mask"][..., None].astype(bool)
    # padded rows carry arbitrary values (dropped by extract_masked_hidden)
    np.testing.assert_allclose(np.asarray(out) * mask, ref * mask,
                               atol=2e-5, rtol=1e-4)


def test_intermediate_layer_extraction(g):
    """hidden_state_indices matches transformers' hidden_states[k]
    (FLUX.2 stacks layers (10, 20, 30))."""
    params = convert_qwen_vl_text_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)
    (h1,) = qwen_vl_text_encode(params, CFG, jnp.asarray(g["ids"]),
                                attention_mask=jnp.asarray(g["mask"]),
                                hidden_state_indices=(1,))
    mask = g["mask"][..., None].astype(bool)
    np.testing.assert_allclose(np.asarray(h1) * mask, g["h1"] * mask,
                               atol=2e-5, rtol=1e-4)


def test_qwen2_5_vl_7b_preset():
    c = QwenVLTextConfig.qwen2_5_vl_7b()
    assert c.dim == 3584 and c.num_kv_heads == 4 and c.head_dim == 128
