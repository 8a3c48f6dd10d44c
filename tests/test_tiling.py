"""VAE spatial tiling + temporal sliding-window tiler."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.wan.vae import WanVAEConfig, convert_vae38_state_dict, vae38_decode, vae38_encode
from fairygen_tpu.models.wan.vae_tiling import vae38_tiled_decode, vae38_tiled_encode
from fairygen_tpu.utils.temporal_tiler import temporal_tiled_model_fn

CFG = WanVAEConfig.tiny()


def _params(goldens):
    g = goldens("wan_vae")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    return convert_vae38_state_dict(sd, CFG)


@pytest.mark.slow
def test_tiled_decode_covering_tile_equals_untiled(goldens):
    g = goldens("wan_vae")
    params = _params(goldens)
    z = jnp.asarray(g["z2"])
    ref = vae38_decode(params, CFG, z, clamp=True)
    tiled = vae38_tiled_decode(params, CFG, z, tile_size=(2, 2), tile_stride=(2, 2),
                               streaming=False)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), atol=1e-4)


@pytest.mark.slow
def test_tiled_decode_overlapping(goldens):
    g = goldens("wan_vae")
    params = _params(goldens)
    z = jnp.concatenate([jnp.asarray(g["z2"])] * 2, axis=-1)  # (1,4,3,2,4)
    ref = vae38_decode(params, CFG, z, clamp=True)
    tiled = vae38_tiled_decode(params, CFG, z, tile_size=(2, 2), tile_stride=(1, 2),
                               streaming=False)
    assert tiled.shape == ref.shape
    # interiors blend; values stay in range and are close in magnitude
    assert float(jnp.abs(tiled).max()) <= 1.0
    assert float(jnp.abs(tiled - ref).mean()) < 0.3


@pytest.mark.slow
def test_tiled_encode_covering_tile_equals_untiled(goldens):
    g = goldens("wan_vae")
    params = _params(goldens)
    x = jnp.asarray(g["x"])
    ref = vae38_encode(params, CFG, x)
    tiled = vae38_tiled_encode(params, CFG, x, tile_size=(2, 2), tile_stride=(2, 2),
                               streaming=False)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), atol=1e-4)


def test_temporal_tiler_identity_model():
    lat = jnp.asarray(np.random.RandomState(0).randn(1, 4, 9, 2, 2).astype(np.float32))

    def model_fn(window):
        return window * 2.0

    out = temporal_tiled_model_fn(model_fn, lat, sliding_window_size=5,
                                  sliding_window_stride=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(lat) * 2.0, atol=1e-5)


def test_tiled_decode_mesh_sharded_matches_sequential(goldens):
    """Tiles sharded over the mesh data axis (batched same-shape groups)
    must reproduce the sequential tile loop (per-sample numerics are
    identical; only tile scheduling changes)."""
    import jax
    import pytest

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from fairygen_tpu.core.meshes import make_mesh

    params = _params(goldens)
    z = jnp.asarray(goldens("wan_vae")["z"])  # tiny latent
    kw = dict(tile_size=(2, 2), tile_stride=(1, 2), streaming=False)
    seq = np.asarray(vae38_tiled_decode(params, CFG, z, **kw))
    mesh = make_mesh(data=8, seq=1)
    par = np.asarray(vae38_tiled_decode(params, CFG, z, mesh=mesh, **kw))
    np.testing.assert_allclose(par, seq, atol=1e-6)
