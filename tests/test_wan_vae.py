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


def test_subpixel_upsample_matches_repeat_conv():
    """The sub-pixel decomposition of conv3x3(nearest-2x(x)) must match the
    materialized repeat+conv form to fp tolerance (weight-tap sums move
    into the kernel — reassociation-level drift only)."""
    import jax
    import jax.numpy as jnp

    from fairygen_tpu.models.wan.vae import (
        _conv2d, _upsample2x_conv3x3_subpixel,
    )

    ks = jax.random.split(jax.random.key(3), 3)
    x = jax.random.normal(ks[0], (2, 5, 7, 16), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, 16, 8), jnp.float32) * 0.2
    b = jax.random.normal(ks[2], (8,), jnp.float32)

    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    ref = _conv2d(up, w, b, padding=((1, 1), (1, 1)))
    out = _upsample2x_conv3x3_subpixel(x, w, b)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
