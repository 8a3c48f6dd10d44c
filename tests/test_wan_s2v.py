"""S2V DiT parity vs reference goldens."""
import pytest
import numpy as np
import jax.numpy as jnp

from fairygen_tpu.models.wan.s2v import (
    S2VConfig, convert_s2v_state_dict, wan_s2v_forward,
    get_audio_embed_bucket_fps, linear_interpolation_np,
)

CFG = S2VConfig(
    dim=96, in_dim=16, ffn_dim=128, out_dim=16, text_dim=32, freq_dim=32,
    patch_size=(1, 2, 2), num_heads=4, num_layers=2,
    cond_dim=16, audio_dim=8, num_audio_token=2, enable_adain=True,
    audio_inject_layers=(0, 1),
)


@pytest.mark.slow
def test_s2v_forward(goldens):
    g = goldens("wan_s2v")
    sd = {k[4:]: g[k] for k in g.files if k.startswith("sd::")}
    params = convert_s2v_state_dict(sd, CFG)
    out = wan_s2v_forward(
        params, CFG,
        jnp.asarray(g["latents"]), jnp.asarray(g["ts"]), jnp.asarray(g["ctx"]),
        jnp.asarray(g["audio"]),
        motion_latents=jnp.asarray(g["motion"])[None],
        pose_cond=jnp.asarray(g["pose"]),
    )
    np.testing.assert_allclose(np.asarray(out), g["o"], atol=1e-3, rtol=1e-3)


def test_audio_bucket_shapes():
    emb = np.random.RandomState(0).randn(3, 100, 8)
    bucket, n = get_audio_embed_bucket_fps(emb, fps=16, batch_frames=20, m=0)
    assert bucket.shape[0] == n * 20
    feats = np.random.RandomState(1).randn(1, 50, 8)
    out = linear_interpolation_np(feats, 50, 30)
    assert out.shape == (1, 30, 8)


def test_frame_packer(goldens):
    import jax
    g = goldens("wan_s2v")
    cfg = S2VConfig(dim=96, num_heads=4, in_dim=16)
    from fairygen_tpu.models.wan.s2v import frame_packer_forward
    import numpy as np
    import jax.numpy as jnp

    def cd(name):
        w = g[f"fp::{name}.weight"]
        return {"w": w.transpose(1, 2, 3, 4, 0).reshape(-1, w.shape[0]),
                "b": g[f"fp::{name}.bias"]}

    params = {"proj": cd("proj"), "proj_2x": cd("proj_2x"), "proj_4x": cd("proj_4x")}
    params = jax.tree.map(jnp.asarray, params)
    mot, angles = frame_packer_forward(params, cfg, jnp.asarray(g["fp_motion"])[None])
    np.testing.assert_allclose(np.asarray(mot[0]), g["fp_mot"][0], atol=2e-5, rtol=1e-4)
    ref = g["fp_remb"]  # (2, 1, S, n, c/2) real/imag
    mine = np.stack([np.cos(angles), np.sin(angles)])
    np.testing.assert_allclose(mine, ref[:, 0, :, 0, :], atol=1e-6)
