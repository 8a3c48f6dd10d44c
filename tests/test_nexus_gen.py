"""NexusGen golden parity vs the reference fork: single-prefill target
image-embedding generation (prefill queries + vision_head + shift) and
the generation adapter (tools/gen_goldens_nexus_gen.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.nexus_gen import (
    convert_nexus_gen_adapter_state_dict,
    convert_nexus_gen_state_dict,
    nexus_gen_adapter,
    nexus_gen_target_embeddings,
)
from fairygen_tpu.models.qwen.text_encoder import QwenVLTextConfig

CFG = QwenVLTextConfig.tiny(vocab=151700, mrope_section=(2, 1, 1))


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/nexus_gen.npz")


def test_nexus_gen_target_embeddings(g):
    params = convert_nexus_gen_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)
    out = nexus_gen_target_embeddings(
        params, CFG, g["ids"], [tuple(r) for r in g["grid"]],
        num_img_tokens=16)
    np.testing.assert_allclose(np.asarray(out), g["target"], atol=5e-5,
                               rtol=2e-4)


def test_nexus_gen_adapter(g):
    params = convert_nexus_gen_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)
    target = nexus_gen_target_embeddings(
        params, CFG, g["ids"], [tuple(r) for r in g["grid"]],
        num_img_tokens=16)
    ap = convert_nexus_gen_adapter_state_dict(
        {k: g[k] for k in g.files if k.startswith("adapter.")})
    out = nexus_gen_adapter(ap, target)
    np.testing.assert_allclose(np.asarray(out), g["adapted"], atol=5e-5,
                               rtol=2e-4)
