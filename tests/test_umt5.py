"""UMT5 text encoder parity vs reference goldens."""
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.wan.text_encoder import (
    UMT5Config,
    convert_umt5_state_dict,
    umt5_encode,
    mask_pad_tokens,
)


def test_umt5_forward(goldens):
    g = goldens("umt5")
    cfg = UMT5Config.tiny()
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    params = convert_umt5_state_dict(sd, cfg)
    emb = umt5_encode(params, cfg, jnp.asarray(g["ids"]), jnp.asarray(g["mask"]))
    np.testing.assert_allclose(np.asarray(emb), g["emb"], atol=2e-5, rtol=1e-4)


def test_mask_pad_tokens(goldens):
    g = goldens("umt5")
    emb = jnp.ones((2, 24, 8))
    mask = jnp.asarray(g["mask"])
    out = np.asarray(mask_pad_tokens(emb, mask))
    assert out[0, 16].sum() == 8 and out[0, 17].sum() == 0
    assert out[1, 8].sum() == 8 and out[1, 9].sum() == 0
