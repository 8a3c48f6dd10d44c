"""Motion controller + VACE parity vs reference goldens."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.wan.aux_models import (
    MotionControllerConfig,
    VaceConfig,
    convert_motion_controller_state_dict,
    convert_vace_state_dict,
    motion_controller_forward,
    vace_forward,
)
from fairygen_tpu.models.wan.dit import (
    WanDiTConfig,
    convert_dit_state_dict,
    patchify,
    text_embedding,
    time_embedding,
    wan_dit_forward,
)
from fairygen_tpu.ops.rope import build_freqs_grid, precompute_freqs_3d


def _sd(g, prefix):
    n = len(prefix) + 2
    return {k[n:]: g[k] for k in g.files if k.startswith(prefix + "::")}


def test_motion_controller(goldens):
    g = goldens("wan_aux")
    cfg = MotionControllerConfig(freq_dim=32, dim=96)
    params = convert_motion_controller_state_dict(_sd(g, "mc"), cfg)
    out = motion_controller_forward(params, cfg, jnp.asarray(g["mc_in"]))
    np.testing.assert_allclose(np.asarray(out), g["mc_out"], atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_vace_conditioned_forward(goldens):
    g = goldens("wan_aux")
    dit_cfg = WanDiTConfig(
        dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=4,
    )
    vace_cfg = VaceConfig(
        vace_layers=(0, 2), vace_in_dim=16, dim=96, num_heads=4, ffn_dim=128,
    )
    dit_params = convert_dit_state_dict(_sd(g, "dit"), dit_cfg)
    vace_params = convert_vace_state_dict(_sd(g, "vace"), vace_cfg)

    lat = jnp.asarray(g["lat"])
    ts = jnp.asarray(g["ts"])
    ctx_raw = jnp.asarray(g["ctx"])
    vctx = jnp.asarray(g["vctx"])

    # replicate model_fn_wan_video's VACE wiring
    t, t_mod = time_embedding(dit_params, dit_cfg, ts)
    t_mod4 = t_mod[:, None]
    ctx = text_embedding(dit_params, ctx_raw)
    x_tokens, grid = patchify(dit_params, dit_cfg, lat)
    tables = precompute_freqs_3d(dit_cfg.head_dim)
    freqs = build_freqs_grid(tables, *grid)
    hints = vace_forward(vace_params, vace_cfg, x_tokens, vctx, ctx,
                         t_mod4, freqs, num_main_layers=dit_cfg.num_layers)
    out = wan_dit_forward(
        dit_params, dit_cfg, lat, ts, ctx_raw,
        vace_hints=hints, vace_scale=0.8,
    )
    np.testing.assert_allclose(np.asarray(out), g["vace_out"], atol=5e-4, rtol=1e-3)


def test_vace_context_internal_matches_external(goldens):
    """wan_dit_forward(vace_context=...) computes hints internally (the
    pipeline path, reference wan_video.py:1302-1307) and must equal the
    manually-composed golden wiring above."""
    g = goldens("wan_aux")
    dit_cfg = WanDiTConfig(
        dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=4,
    )
    vace_cfg = VaceConfig(
        vace_layers=(0, 2), vace_in_dim=16, dim=96, num_heads=4, ffn_dim=128,
    )
    dit_params = convert_dit_state_dict(_sd(g, "dit"), dit_cfg)
    vace_params = convert_vace_state_dict(_sd(g, "vace"), vace_cfg)
    out = wan_dit_forward(
        dit_params, dit_cfg, jnp.asarray(g["lat"]), jnp.asarray(g["ts"]),
        jnp.asarray(g["ctx"]),
        vace_params=vace_params, vace_cfg=vace_cfg,
        vace_context=jnp.asarray(g["vctx"]), vace_scale=0.8,
    )
    np.testing.assert_allclose(np.asarray(out), g["vace_out"], atol=5e-4, rtol=1e-3)
