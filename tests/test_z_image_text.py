"""Z-Image text encoder (Qwen3) golden parity vs transformers:
qk-normed GQA with explicit head_dim, penultimate hidden state."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.text_encoder import (
    QwenVLTextConfig,
    convert_qwen_vl_text_state_dict,
    qwen_vl_text_encode,
)

CFG = QwenVLTextConfig.tiny(head_dim_override=8, qk_norm=True,
                            attn_bias=False, num_layers=3)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/z_image_text.npz")


def test_qwen3_penultimate_matches_transformers(g):
    params = convert_qwen_vl_text_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)
    out = qwen_vl_text_encode(params, CFG, jnp.asarray(g["ids"]),
                              attention_mask=jnp.asarray(g["mask"]),
                              hidden_state_index=-2)
    mask = g["mask"][..., None].astype(bool)
    np.testing.assert_allclose(np.asarray(out) * mask, g["out"] * mask,
                               atol=2e-5, rtol=1e-4)


def test_qwen3_4b_preset():
    c = QwenVLTextConfig.qwen3_4b()
    assert c.head_dim == 128 and c.qk_norm and not c.attn_bias
    assert c.dim == 2560 and c.num_layers == 36
