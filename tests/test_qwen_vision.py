"""Qwen2.5-VL vision tower golden parity vs transformers
(tools/gen_goldens_qwen_vision.py): windowed + full attention blocks,
2D rotary, window reorder/undo, padded-window case, 2x2 merger."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.vision import (
    QwenVLVisionConfig,
    convert_qwen_vl_vision_state_dict,
    qwen_vl_vision_encode,
)

CFG = QwenVLVisionConfig.tiny(patch_size=2, window_size=8)


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/qwen_vision.npz")


def test_vision_tower_matches_transformers(g):
    params = convert_qwen_vl_vision_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)
    out = qwen_vl_vision_encode(params, CFG, jnp.asarray(g["patches"]),
                                [tuple(r) for r in g["grid"]])
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=3e-5,
                               rtol=1e-4)


def test_vision_7b_preset():
    c = QwenVLVisionConfig.qwen2_5_vl_7b()
    assert c.hidden_size == 1280 and c.out_hidden_size == 3584
    assert c.fullatt_block_indexes == (7, 15, 23, 31)
