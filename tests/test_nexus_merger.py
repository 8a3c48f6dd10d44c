"""NexusGen editing-merger parity (tools/gen_goldens_nexus_merger.py):
bidirectional Qwen2.5-VL layer with fractional base-grid mRoPE + the
RMS/Linear projector, with and without a reference stream."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.qwen.nexus_gen import (
    NexusGenMergerConfig,
    convert_nexus_gen_merger_state_dict,
    nexus_gen_editing_text_ids,
    nexus_gen_merger,
)

CFG = NexusGenMergerConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/nexus_merger.npz")


def test_merger_with_reference(g):
    params, _ = convert_nexus_gen_merger_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("mg.")}, CFG)
    out = nexus_gen_merger(params, CFG, jnp.asarray(g["embeds"]), (1, 6, 6),
                           jnp.asarray(g["ref"]), (1, 8, 8))
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-5,
                               rtol=1e-4)


def test_merger_t2i(g):
    params, _ = convert_nexus_gen_merger_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("mg.")}, CFG)
    out = nexus_gen_merger(params, CFG, jnp.asarray(g["embeds"]), (1, 6, 6))
    np.testing.assert_allclose(np.asarray(out), g["out_t2i"], atol=2e-5,
                               rtol=1e-4)


def test_editing_text_ids():
    """Fractional ids: target tokens on axis 0, reference on axis 1,
    scaled to the latent grid (flux_image.py:648-668)."""
    ids = nexus_gen_editing_text_ids(16, 24, (1, 6, 6), (1, 8, 8))
    assert ids.shape == (9 + 16, 3)
    assert (ids[:9, 0] == 0).all() and (ids[9:, 0] == 1).all()
    np.testing.assert_allclose(ids[1, 2], 24 / 6)  # col stride lat_w/w
    np.testing.assert_allclose(ids[9 + 1, 2], 24 / 8)
