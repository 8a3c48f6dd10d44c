"""Qwen2.5-VL multimodal parity vs transformers: vision tower + mRoPE
positions + image-embedding splice through the text stack — the
Qwen-Image-Edit conditioning path (tools/gen_goldens_qwen_multimodal.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.text_encoder import (
    QwenVLTextConfig,
    convert_qwen_vl_text_state_dict,
    qwen_vl_rope_index,
    qwen_vl_text_encode,
)
from fairygen_tpu.models.qwen.vision import (
    QwenVLVisionConfig,
    convert_qwen_vl_vision_state_dict,
    qwen_vl_vision_encode,
)

TXT_CFG = QwenVLTextConfig.tiny(vocab=151700, mrope_section=(2, 1, 1))
VIS_CFG = QwenVLVisionConfig.tiny(hidden_size=16, num_heads=2,
                                  intermediate_size=24, out_hidden_size=32,
                                  depth=2, patch_size=2, window_size=8)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/qwen_multimodal.npz")


def test_vision_tower_within_vl_model(g):
    vis_params = convert_qwen_vl_vision_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.visual.")}, VIS_CFG)
    vis = qwen_vl_vision_encode(vis_params, VIS_CFG,
                                jnp.asarray(g["patches"]),
                                [tuple(r) for r in g["grid"]])
    np.testing.assert_allclose(np.asarray(vis), g["vis"], atol=3e-5,
                               rtol=1e-4)


def test_multimodal_prompt_matches_transformers(g):
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    txt_params = convert_qwen_vl_text_state_dict(sd, TXT_CFG)
    vis_params = convert_qwen_vl_vision_state_dict(sd, VIS_CFG)
    vis = qwen_vl_vision_encode(vis_params, VIS_CFG,
                                jnp.asarray(g["patches"]),
                                [tuple(r) for r in g["grid"]])
    pos = qwen_vl_rope_index(g["ids"][0], [tuple(r) for r in g["grid"]],
                             TXT_CFG, spatial_merge_size=2)
    out = qwen_vl_text_encode(txt_params, TXT_CFG, jnp.asarray(g["ids"]),
                              image_embeds=vis, position_ids=pos)
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=5e-5,
                               rtol=2e-4)


def test_multi_image_prompt_matches_transformers(g):
    """TWO images in one prompt (the "Picture i:" multi-edit layout):
    per-image grids through the vision tower, spliced in order."""
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    txt_params = convert_qwen_vl_text_state_dict(sd, TXT_CFG)
    vis_params = convert_qwen_vl_vision_state_dict(sd, VIS_CFG)
    grids = [tuple(r) for r in g["grid2"]]
    vis = qwen_vl_vision_encode(vis_params, VIS_CFG,
                                jnp.asarray(g["patches2"]), grids)
    np.testing.assert_allclose(np.asarray(vis), g["vis2"], atol=3e-5,
                               rtol=1e-4)
    pos = qwen_vl_rope_index(g["ids2"][0], grids, TXT_CFG,
                             spatial_merge_size=2)
    out = qwen_vl_text_encode(txt_params, TXT_CFG, jnp.asarray(g["ids2"]),
                              image_embeds=vis, position_ids=pos)
    np.testing.assert_allclose(np.asarray(out), g["out2"], atol=5e-5,
                               rtol=2e-4)
