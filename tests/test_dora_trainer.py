"""Masked Style-DoRA SDXL trainer tests."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp
import optax

from fairygen_tpu.models.sdxl.unet2d import UNet2DConfig, convert_unet2d_state_dict
from fairygen_tpu.training.dora_trainer import (
    add_dora_to_sdxl_unet,
    make_sdxl_dora_train_step,
    masked_mse_loss,
    sdxl_dora_state_dict,
)

CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    transformer_layers_per_block=(1, 2),
    num_attention_heads=(2, 4),
    cross_attention_dim=32,
    norm_num_groups=16,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=80,
)


def _params(goldens):
    g = goldens("sdxl_unet")
    sd = {k[6:]: g[k] for k in g.files if k.startswith("unet::")}
    return convert_unet2d_state_dict(sd, CFG)


def test_masked_mse_matches_reference_formula():
    rs = np.random.RandomState(0)
    pred = jnp.asarray(rs.randn(2, 4, 8, 8).astype(np.float32))
    target = jnp.asarray(rs.randn(2, 4, 8, 8).astype(np.float32))
    mask = jnp.asarray((rs.rand(2, 1, 8, 8) > 0.5).astype(np.float32))
    loss = masked_mse_loss(pred, target, mask)
    m = np.broadcast_to(np.asarray(mask), pred.shape)
    ref = ((np.asarray(pred) - np.asarray(target)) ** 2 * m).sum() / m.sum()
    np.testing.assert_allclose(float(loss), ref, rtol=1e-6)


@pytest.mark.slow
def test_dora_injection_is_identity_and_counts(goldens):
    params = _params(goldens)
    from fairygen_tpu.models.sdxl.unet2d import unet2d_forward

    g = goldens("sdxl_unet")
    args = (jnp.asarray(g["sample"]), jnp.asarray(g["t"]), jnp.asarray(g["ehs"]))
    kw = dict(text_embeds=jnp.asarray(g["text_embeds"]), time_ids=jnp.asarray(g["time_ids"]))
    ref = unet2d_forward(params, CFG, *args, **kw)
    with_dora = add_dora_to_sdxl_unet(params, jax.random.key(0), rank=4)
    out = unet2d_forward(with_dora, CFG, *args, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    sd = sdxl_dora_state_dict(with_dora)
    n_attn = (1 + 2) + (1 + 2) * 2  # down CrossAttn(1,2 tblocks) ... just check >0
    assert sum(1 for k in sd if k.endswith(".lora_A.weight")) > 10
    assert any("lora_magnitude_vector" in k for k in sd)


@pytest.mark.slow
def test_dora_train_step_updates_adapters_only(goldens):
    params = add_dora_to_sdxl_unet(_params(goldens), jax.random.key(0), rank=4)
    init_state, train_step = make_sdxl_dora_train_step(
        CFG, optax.adamw(1e-3), snr_gamma=5.0, resolution=16,
    )
    state = init_state(params)
    rs = np.random.RandomState(1)
    batch = {
        "latents": jnp.asarray(rs.randn(1, 4, 8, 8).astype(np.float32)),
        "mask_latents": jnp.asarray((rs.rand(1, 1, 8, 8) > 0.5).astype(np.float32)),
        "prompt_embeds": jnp.asarray(rs.randn(1, 7, 32).astype(np.float32)),
        "pooled": jnp.asarray(rs.randn(1, 32).astype(np.float32)),
        "original_size": jnp.asarray([[16, 16]]),
        "crop_top_left": jnp.asarray([[0, 0]]),
    }
    new_state, loss = train_step(state, batch, jax.random.key(2))
    assert np.isfinite(float(loss))
    q = params["down_blocks"][1]["attentions"][0]["blocks"][0]["attn1"]["to_q"]
    q_new = new_state.params["down_blocks"][1]["attentions"][0]["blocks"][0]["attn1"]["to_q"]
    np.testing.assert_allclose(np.asarray(q_new["w"]), np.asarray(q["w"]))
    assert np.abs(np.asarray(q_new["lora"]["A"]) - np.asarray(q["lora"]["A"])).max() > 0


@pytest.mark.slow
def test_dora_save_load_roundtrip(goldens):
    """sdxl_dora_state_dict -> load_sdxl_dora_state_dict reproduces the
    adapted forward on fresh base params (the inference path that
    brushnet_stylize.py --dora / sdxl_t2i.py --dora uses)."""
    from fairygen_tpu.models.sdxl.unet2d import unet2d_forward
    from fairygen_tpu.training.dora_trainer import load_sdxl_dora_state_dict

    g = goldens("sdxl_unet")
    args = (jnp.asarray(g["sample"]), jnp.asarray(g["t"]),
            jnp.asarray(g["ehs"]))
    kw = dict(text_embeds=jnp.asarray(g["text_embeds"]),
              time_ids=jnp.asarray(g["time_ids"]))

    with_dora = add_dora_to_sdxl_unet(_params(goldens), jax.random.key(0),
                                      rank=4)
    # make the adapters non-trivial (B is zero-init -> perturb)
    leaves = []

    def bump(path, leaf):
        keys = [getattr(k, "key", None) for k in path]
        if "lora" in keys and keys[-1] == "B":
            leaves.append(path)
            return leaf + 0.01 * jax.random.normal(
                jax.random.key(len(leaves)), leaf.shape, leaf.dtype)
        return leaf

    with_dora = jax.tree_util.tree_map_with_path(bump, with_dora)
    assert leaves
    ref = unet2d_forward(with_dora, CFG, *args, **kw)

    sd = sdxl_dora_state_dict(with_dora)
    reloaded, n = load_sdxl_dora_state_dict(_params(goldens), sd, scale=1.0)
    assert n == sum(1 for k in sd if k.endswith(".lora_A.weight"))
    out = unet2d_forward(reloaded, CFG, *args, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # scale=0 disables the update entirely
    zero, _ = load_sdxl_dora_state_dict(_params(goldens), sd, scale=0.0)
    base = unet2d_forward(_params(goldens), CFG, *args, **kw)
    np.testing.assert_allclose(
        np.asarray(unet2d_forward(zero, CFG, *args, **kw)),
        np.asarray(base), atol=2e-5)
