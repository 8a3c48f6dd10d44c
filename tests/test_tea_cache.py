"""TeaCache-gated DiT forward."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params, wan_dit_forward
from fairygen_tpu.utils.tea_cache import TeaCacheState, init_tea_cache_state

CFG = WanDiTConfig(
    dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
    patch_size=(1, 2, 2), num_heads=4, num_layers=2,
)


@pytest.mark.slow
def test_tea_cache_first_step_matches_plain_and_skips_later():
    params = init_dit_params(jax.random.key(0), CFG)
    lat = jax.random.normal(jax.random.key(1), (1, 8, 3, 8, 8))
    ctx = jax.random.normal(jax.random.key(2), (1, 6, 32))
    opts = dict(model_id="Wan2.1-T2V-1.3B", rel_l1_thresh=1e9,  # force skips
                num_inference_steps=4)

    # token count: 3*4*4 = 48; t_mod has S'=1
    state = init_tea_cache_state((1, 1, 6, 96), (1, 48, 96))
    ref0 = wan_dit_forward(params, CFG, lat, jnp.asarray([900.0]), ctx)
    out0, state = wan_dit_forward(params, CFG, lat, jnp.asarray([900.0]), ctx,
                                  tea_cache_state=state, tea_cache_opts=opts)
    # step 0 always computes -> identical to plain forward
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0), atol=1e-5)
    assert int(state.step) == 1

    # step 1 with a huge threshold: skipped (residual reuse)
    lat2 = lat + 0.01
    out1, state = wan_dit_forward(params, CFG, lat2, jnp.asarray([700.0]), ctx,
                                  tea_cache_state=state, tea_cache_opts=opts)
    ref1 = wan_dit_forward(params, CFG, lat2, jnp.asarray([700.0]), ctx)
    # skipped output differs from a full recompute
    assert np.abs(np.asarray(out1) - np.asarray(ref1)).max() > 1e-6

    # with threshold 0 (always recompute) outputs match plain forward
    state0 = init_tea_cache_state((1, 1, 6, 96), (1, 48, 96))
    opts2 = dict(model_id="Wan2.1-T2V-1.3B", rel_l1_thresh=-1e9,
                 num_inference_steps=4)
    o, state0 = wan_dit_forward(params, CFG, lat, jnp.asarray([900.0]), ctx,
                                tea_cache_state=state0, tea_cache_opts=opts2)
    o2, state0 = wan_dit_forward(params, CFG, lat2, jnp.asarray([700.0]), ctx,
                                 tea_cache_state=state0, tea_cache_opts=opts2)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(ref1), atol=1e-5)
