"""Wan2.2 causal 3D VAE parity vs reference goldens.

The goldens were produced by the reference's streamed (feat_cache) encode/
decode; our full-sequence mode must match them exactly — that validates the
causal-equivalence derivation — and our streaming mode must match our
full-sequence mode.
"""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.wan.vae import (
    WanVAEConfig,
    convert_vae38_state_dict,
    vae38_decode,
    vae38_encode,
)

CFG = WanVAEConfig.tiny()


def _params(g):
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    return convert_vae38_state_dict(sd, CFG)


def test_encode_full_sequence(goldens):
    g = goldens("wan_vae")
    params = _params(g)
    z = vae38_encode(params, CFG, jnp.asarray(g["x"]))
    assert z.shape == g["z"].shape
    np.testing.assert_allclose(np.asarray(z), g["z"], atol=2e-4, rtol=1e-3)


def test_decode_full_sequence(goldens):
    g = goldens("wan_vae")
    params = _params(g)
    dec = vae38_decode(params, CFG, jnp.asarray(g["z2"]), clamp=False)
    assert dec.shape == g["dec2"].shape
    np.testing.assert_allclose(np.asarray(dec), g["dec2"], atol=5e-4, rtol=1e-3)


def test_roundtrip_decode(goldens):
    g = goldens("wan_vae")
    params = _params(g)
    dec = vae38_decode(params, CFG, jnp.asarray(g["z"]), clamp=False)
    np.testing.assert_allclose(np.asarray(dec), g["dec"], atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_streaming_matches_full(goldens):
    g = goldens("wan_vae")
    params = _params(g)
    z_full = vae38_encode(params, CFG, jnp.asarray(g["x"]), streaming=False)
    z_str = vae38_encode(params, CFG, jnp.asarray(g["x"]), streaming=True)
    np.testing.assert_allclose(np.asarray(z_str), np.asarray(z_full), atol=1e-5)

    d_full = vae38_decode(params, CFG, jnp.asarray(g["z2"]), streaming=False, clamp=False)
    d_str = vae38_decode(params, CFG, jnp.asarray(g["z2"]), streaming=True, clamp=False)
    np.testing.assert_allclose(np.asarray(d_str), np.asarray(d_full), atol=1e-5)


@pytest.mark.slow
def test_decode_multiframe_chunks(goldens):
    """frames_per_chunk batches the streamed decode — same causal math,
    fp-reassociation-only drift vs the per-frame stream (and vs full-seq)."""
    g = goldens("wan_vae")
    params = _params(g)
    z = jnp.asarray(g["z2"])
    d_full = vae38_decode(params, CFG, z, streaming=False, clamp=False)
    for k in (2, 3, 4):
        d_k = vae38_decode(params, CFG, z, streaming=True, clamp=False,
                           frames_per_chunk=k)
        assert d_k.shape == d_full.shape
        np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_full),
                                   atol=1e-5)
