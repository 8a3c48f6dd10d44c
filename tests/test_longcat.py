"""LongCat-Video DiT golden parity vs the reference model_fn_longcat_video
(tools/gen_goldens_longcat.py): t2v and conditioned (num_cond_latents)
paths, incl. the driver's latent overwrite + output negation."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.wan.longcat import (
    LongCatDiTConfig,
    convert_longcat_dit_state_dict,
    longcat_dit_forward,
)

CFG = LongCatDiTConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/longcat.npz")


def _params(g):
    return convert_longcat_dit_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("sd.")}, CFG)


def test_longcat_t2v_matches_reference(g):
    # model_fn negates the dit output (wan_video.py:1417)
    out = -longcat_dit_forward(_params(g), CFG, jnp.asarray(g["latents"]),
                               jnp.asarray(g["timestep"]),
                               jnp.asarray(g["ctx"]))
    np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4,
                               rtol=1e-3)


def test_longcat_through_pipeline(g):
    """WanVideoPipeline dispatches to the LongCat path when a LongCat DiT
    is loaded; conditioning frames from longcat_video stay pinned."""
    from fairygen_tpu.models.wan.vae import WanVAEConfig
    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline

    pipe = WanVideoPipeline(
        dit_params=None, dit_cfg=None,
        longcat_params=_params(g), longcat_cfg=CFG,
        vae_cfg=WanVAEConfig.tiny_v1(), dtype=jnp.float32,
    )
    ctx = jnp.asarray(g["ctx"])
    out = pipe(context=ctx, cfg_scale=1.0, height=64, width=64,
               num_frames=13, num_inference_steps=2, seed=0,
               output_type="latents")
    assert out.shape == (1, 4, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_longcat_conditioned_matches_reference(g):
    lat = jnp.asarray(g["latents"])
    cond = jnp.asarray(g["cond"])
    # the driver overwrites the conditioning frames (wan_video.py:1401)
    lat = lat.at[:, :, : cond.shape[2]].set(cond)
    out = -longcat_dit_forward(_params(g), CFG, lat,
                               jnp.asarray(g["timestep"]),
                               jnp.asarray(g["ctx"]),
                               num_cond_latents=cond.shape[2])
    np.testing.assert_allclose(np.asarray(out), g["out_cond"], atol=2e-4,
                               rtol=1e-3)
