"""FLUX tiled-denoiser parity vs the reference FastTileWorker branch
(tools/gen_goldens_flux_tiled.py) through the pipeline's jitted chunk."""
import numpy as np
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.flux.dit import (
    FluxDiTConfig,
    convert_flux_dit_state_dict,
)
from fairygen_tpu.pipelines.flux_image import (
    FluxImagePipeline,
    _tile_tasks,
)

CFG = FluxDiTConfig.tiny()


def test_tiled_single_sweep_matches_reference():
    g = np.load("tests/goldens/flux_tiled.npz")
    params = convert_flux_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)
    pipe = FluxImagePipeline(dit_params=params, dit_cfg=CFG,
                             dtype=jnp.float32, steps_per_dispatch=1)
    # one Euler step from x with v known: x1 = x + v*(s1-s0); recover v
    lat0 = jnp.asarray(g["latents"])
    lat1 = pipe(
        prompt_emb=jnp.asarray(g["prompt_emb"]),
        pooled_prompt_emb=jnp.asarray(g["pooled"]),
        latents=lat0, height=128, width=192, num_inference_steps=1,
        embedded_guidance=3.5, tiled=True, tile_size=8, tile_stride=4,
        output_type="latent",
    )
    # single step: timesteps[0]=1000*sigma0... the golden used t=614; so
    # instead compare the VELOCITY by re-deriving it from the update
    # against the reference tiled output at that timestep is not directly
    # reachable through __call__; assert the tile split machinery +
    # blending here and exact parity below.
    assert np.isfinite(np.asarray(lat1)).all()

    # direct sweep parity at the golden timestep
    from fairygen_tpu.pipelines.flux_image import _flux_denoise_chunk

    out, _ = _flux_denoise_chunk(
        params, lat0, jnp.asarray(g["prompt_emb"]),
        jnp.asarray(g["pooled"]), None, None, jnp.asarray(g["guidance"]),
        None, jnp.asarray([614.0]), jnp.asarray([1.0, 0.0]),
        jnp.float32(1.0), jnp.zeros(()), jnp.int32(0),
        dit_cfg=CFG, length=1, do_cfg=False, tile_opts=(8, 4),
    )
    v = (np.asarray(out) - np.asarray(lat0)) / (0.0 - 1.0)
    np.testing.assert_allclose(v, g["out"], atol=3e-4, rtol=1e-3)


def test_tile_tasks_cover():
    tasks = _tile_tasks(16, 24, 8, 4)
    cov = np.zeros((16, 24))
    for hl, hr, wl, wr in tasks:
        cov[hl:hr, wl:wr] += 1
    assert (cov > 0).all()


def test_tiled_rejects_tea_cache():
    """tiled + tea_cache_l1_thresh must raise (per-tile hidden states have
    no single cache; the chunk would otherwise crash unpacking)."""
    g = np.load("tests/goldens/flux_tiled.npz")
    params = convert_flux_dit_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("dit.")}, CFG)
    pipe = FluxImagePipeline(dit_params=params, dit_cfg=CFG,
                             dtype=jnp.float32, steps_per_dispatch=1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        pipe(prompt_emb=jnp.zeros((1, 8, CFG.context_dim), jnp.float32),
             pooled_prompt_emb=jnp.zeros((1, CFG.pooled_dim), jnp.float32),
             height=256, width=256, num_inference_steps=2,
             tiled=True, tile_size=8, tile_stride=4,
             tea_cache_l1_thresh=0.3, output_type="latent")
