"""BrushNet trainer + data_process cache round-trip."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp
import optax

from fairygen_tpu.models.sdxl.unet2d import UNet2DConfig, convert_unet2d_state_dict
from fairygen_tpu.training.brushnet_trainer import (
    make_brushnet_train_step, random_mask_gen, rle2mask,
)

UNET_CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    transformer_layers_per_block=(1, 2), num_attention_heads=(2, 4),
    cross_attention_dim=32, norm_num_groups=16,
    addition_time_embed_dim=8, projection_class_embeddings_input_dim=80,
)
BN_CFG = UNet2DConfig(
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    mid_block_type="UNetMidBlock2D", transformer_layers_per_block=(0, 0),
    num_attention_heads=(2, 4), attention_head_dim=8, cross_attention_dim=32,
    norm_num_groups=16, addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=80, conditioning_channels=5,
)


def test_mask_generators():
    rs = np.random.RandomState(0)
    m = random_mask_gen(rs, 64, 64)
    assert m.shape == (64, 64) and set(np.unique(m)).issubset({0.0, 1.0})
    assert 0 < m.mean() < 1  # strokes actually drawn
    rle = [1, 5, 20, 3]
    mm = rle2mask(rle, (8, 8))
    assert mm.sum() == 8


@pytest.mark.slow
def test_brushnet_train_step_updates_brushnet_only(goldens):
    g = goldens("sdxl_unet")
    unet_params = convert_unet2d_state_dict(
        {k[6:]: g[k] for k in g.files if k.startswith("unet::")}, UNET_CFG)
    bn_params = convert_unet2d_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("bn::")}, BN_CFG)
    init_state, train_step = make_brushnet_train_step(
        UNET_CFG, BN_CFG, unet_params, optax.adamw(1e-3))
    state = init_state(bn_params)
    rs = np.random.RandomState(1)
    batch = {
        "latents": jnp.asarray(rs.randn(1, 4, 16, 16).astype(np.float32)),
        "cond_latents": jnp.asarray(rs.randn(1, 4, 16, 16).astype(np.float32)),
        "mask_latents": jnp.asarray((rs.rand(1, 1, 16, 16) > 0.5).astype(np.float32)),
        "prompt_embeds": jnp.asarray(rs.randn(1, 7, 32).astype(np.float32)),
        "pooled": jnp.asarray(rs.randn(1, 32).astype(np.float32)),
        "time_ids": jnp.asarray(rs.randn(1, 6).astype(np.float32)),
    }
    new_state, loss = train_step(state, batch, jax.random.key(0))
    assert np.isfinite(float(loss))
    old = np.asarray(bn_params["brushnet_mid_block"]["w"])
    new = np.asarray(new_state.params["brushnet_mid_block"]["w"])
    assert np.abs(new - old).max() > 0


def test_data_process_cache_roundtrip(tmp_path):
    from fairygen_tpu.data import UnifiedDataset
    from fairygen_tpu.training.data_process import launch_data_process_task

    class FakeDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"x": i}

    def pre(sample):
        return {"latents": jnp.ones((2, 2)) * sample["x"],
                "context": jnp.zeros((3,))}

    n = launch_data_process_task(FakeDS(), pre, str(tmp_path), process_index=0,
                                 num_processes=2)
    assert n == 2
    ds = UnifiedDataset(base_path=str(tmp_path))
    assert len(ds) == 2
    item = ds[0]
    assert item["latents"].shape == (2, 2)
