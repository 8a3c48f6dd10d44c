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


def test_layout_safe_interleaves_match_reference_reshape_forms():
    """_double_frames / dup_up3d / pixel_unpatchify were rewritten as
    strided-slice + interior-pad placements (the reshape/transpose forms
    trip a TPU layout pathology at batch>1 — docs/NOTES.md round-3).
    Pin them against the reference einops semantics elementwise."""
    import jax
    import jax.numpy as jnp

    from fairygen_tpu.models.wan.vae import (
        _double_frames, dup_up3d, pixel_unpatchify,
    )

    rng = np.random.default_rng(5)

    # _double_frames: channel halves -> frame pairs (wan_video_vae 153-156)
    y = jnp.asarray(rng.standard_normal((2, 3, 4, 5, 8)), jnp.float32)
    ref = y.reshape(2, 3, 4, 5, 2, 4).transpose(0, 1, 4, 2, 3, 5)
    ref = ref.reshape(2, 6, 4, 5, 4)
    np.testing.assert_array_equal(np.asarray(_double_frames(y)),
                                  np.asarray(ref))

    # dup_up3d: repeat channels, (co, ft, fs, fs) interleave (398-439)
    for (c, co, ft, fs) in [(16, 8, 2, 2), (16, 8, 1, 2), (8, 8, 2, 2)]:
        x = jnp.asarray(rng.standard_normal((1, 3, 4, 5, c)), jnp.float32)
        repeats = co * ft * fs * fs // c
        r = jnp.repeat(x, repeats, axis=-1)
        r = r.reshape(1, 3, 4, 5, co, ft, fs, fs)
        r = r.transpose(0, 1, 5, 2, 6, 3, 7, 4)
        ref = r.reshape(1, 3 * ft, 4 * fs, 5 * fs, co)[:, ft - 1:]
        out = dup_up3d(x, co, ft, fs, first_chunk=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # pixel_unpatchify: channel groups (c, r, q) -> 2x2 pixel blocks
    x = jnp.asarray(rng.standard_normal((1, 2, 3, 4, 12)), jnp.float32)
    r = x.reshape(1, 2, 3, 4, 3, 2, 2).transpose(0, 1, 2, 6, 3, 5, 4)
    ref = r.reshape(1, 2, 6, 8, 3)
    np.testing.assert_array_equal(np.asarray(pixel_unpatchify(x, 2)),
                                  np.asarray(ref))
