"""Wan DiT forward parity vs the reference model_fn_wan_video (goldens)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.wan.dit import (
    WanDiTConfig,
    convert_dit_state_dict,
    init_dit_params,
    wan_dit_forward,
)


def _sd(g, prefix):
    plen = len(prefix) + 2
    return {k[plen:]: g[k] for k in g.files if k.startswith(prefix + "::")}


@pytest.mark.slow
def test_standard_path_with_image_branch(goldens):
    g = goldens("wan_dit")
    cfg = WanDiTConfig(
        dim=96, in_dim=16, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2, has_image_input=True,
    )
    params = convert_dit_state_dict(_sd(g, "std"), cfg)
    out = wan_dit_forward(
        params, cfg,
        jnp.asarray(g["std_latents"]),
        jnp.asarray(g["std_timestep"]),
        jnp.asarray(g["std_context"]),
        clip_feature=jnp.asarray(g["std_clip"]),
        y=jnp.asarray(g["std_y"]),
    )
    assert out.shape == g["std_out"].shape
    np.testing.assert_allclose(np.asarray(out), g["std_out"], atol=2e-4, rtol=1e-3)


def test_ti2v_separated_timestep_path(goldens):
    g = goldens("wan_dit")
    cfg = WanDiTConfig(
        dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=True, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
    )
    params = convert_dit_state_dict(_sd(g, "ti"), cfg)
    out = wan_dit_forward(
        params, cfg,
        jnp.asarray(g["ti_latents"]),
        jnp.asarray(g["ti_timestep"]),
        jnp.asarray(g["ti_context"]),
        fuse_vae_embedding_in_latents=True,
    )
    np.testing.assert_allclose(np.asarray(out), g["ti_out"], atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_init_params_shapes_match_converter(goldens):
    g = goldens("wan_dit")
    cfg = WanDiTConfig(
        dim=96, in_dim=16, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2, has_image_input=True,
    )
    import jax

    init = init_dit_params(jax.random.key(0), cfg)
    conv = convert_dit_state_dict(_sd(g, "std"), cfg)
    init_shapes = jax.tree.map(lambda x: x.shape, init)
    conv_shapes = jax.tree.map(lambda x: x.shape, conv)
    assert init_shapes == conv_shapes


def test_remat_matches_plain(goldens):
    g = goldens("wan_dit")
    cfg = WanDiTConfig(
        dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=True, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
    )
    params = convert_dit_state_dict(_sd(g, "ti"), cfg)
    args = (
        jnp.asarray(g["ti_latents"]),
        jnp.asarray(g["ti_timestep"]),
        jnp.asarray(g["ti_context"]),
    )
    a = wan_dit_forward(params, cfg, *args, fuse_vae_embedding_in_latents=True)
    b = wan_dit_forward(params, cfg, *args, fuse_vae_embedding_in_latents=True, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remat_offload_matches_full_remat(goldens):
    """remat='offload' (carry residuals parked in pinned host memory — the
    XLA-native analogue of the reference's save_on_cpu() gradient
    checkpoint, gradient_checkpoint.py:10-34): forward AND gradients match
    the on-device full-remat path."""
    g = goldens("wan_dit")
    cfg = WanDiTConfig(
        dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=True, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
    )
    params = convert_dit_state_dict(_sd(g, "ti"), cfg)
    args = (
        jnp.asarray(g["ti_latents"]),
        jnp.asarray(g["ti_timestep"]),
        jnp.asarray(g["ti_context"]),
    )
    a = wan_dit_forward(params, cfg, *args,
                        fuse_vae_embedding_in_latents=True, remat=True)
    b = wan_dit_forward(params, cfg, *args,
                        fuse_vae_embedding_in_latents=True, remat="offload")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def loss(p, remat):
        out = wan_dit_forward(p, cfg, *args,
                              fuse_vae_embedding_in_latents=True, remat=remat)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_full = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    g_off = jax.jit(jax.grad(lambda p: loss(p, "offload")))(params)
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (ka, va), (kb, vb) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_full), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(g_off), key=key)):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   atol=2e-5, err_msg=str(ka))


def test_train_step_offload_remat_matches(goldens):
    """A full SFT train step with remat='offload' reproduces the
    remat=True loss and updated params."""
    import optax

    from fairygen_tpu.training.train_step import make_wan_sft_train_step

    g = goldens("wan_dit")
    cfg = WanDiTConfig(
        dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=True, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
    )
    params = convert_dit_state_dict(_sd(g, "ti"), cfg)
    batch = {
        "latents": jnp.asarray(g["ti_latents"]),
        "context": jnp.asarray(g["ti_context"]),
    }
    rng = jax.random.key(7)
    outs = {}
    for remat in (True, "offload"):
        init_state, train_step = make_wan_sft_train_step(
            cfg, optax.sgd(1e-3), remat=remat)
        state, loss = train_step(init_state(params), batch, rng)
        outs[str(remat)] = (float(loss), state.params)
    assert np.isclose(outs["True"][0], outs["offload"][0], atol=1e-6)
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (ka, va), (kb, vb) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(outs["True"][1]), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(outs["offload"][1]), key=key)):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   atol=2e-5, err_msg=str(ka))


def test_cross_kv_precompute_matches(goldens):
    """Per-prompt hoisted cross-attn k/v == in-block computation (exact)."""
    from fairygen_tpu.models.wan.dit import precompute_cross_kv

    g = goldens("wan_dit")
    cfg = WanDiTConfig(
        dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=2,
        seperated_timestep=True, require_clip_embedding=False,
        require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
    )
    params = convert_dit_state_dict(_sd(g, "ti"), cfg)
    args = (
        jnp.asarray(g["ti_latents"]),
        jnp.asarray(g["ti_timestep"]),
        jnp.asarray(g["ti_context"]),
    )
    a = wan_dit_forward(params, cfg, *args,
                        fuse_vae_embedding_in_latents=True)
    ckv = precompute_cross_kv(params, cfg, args[2])
    assert ckv[0].shape == (2, 1, args[2].shape[1], 4, 24)
    b = wan_dit_forward(params, cfg, *args,
                        fuse_vae_embedding_in_latents=True, cross_kv=ckv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
