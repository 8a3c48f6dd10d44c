"""DINOv3 + Qwen Image2LoRA parity
(tools/gen_goldens_dinov3_image2lora.py): the DINOv3 tower vs transformers
DINOv3ViTModel, the Image2LoRA trainer blocks + SequencialMLP residual vs
the reference model, merge_lora semantics, and fuse-into-DiT."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fairygen_tpu.models.dinov3 import (
    DINOv3Config,
    convert_dinov3_state_dict,
    dinov3_forward,
)
from fairygen_tpu.models.qwen.image2lora import (
    QwenImage2LoRAConfig,
    convert_image2lora_state_dict,
    image2lora_forward,
    merge_image2lora,
)

I2L_CFG = QwenImage2LoRAConfig.tiny()


@pytest.fixture(scope="module")
def g():
    return np.load("tests/goldens/dinov3_image2lora.npz")


def test_dinov3_matches_transformers(g):
    params, cfg = convert_dinov3_state_dict(
        {k[3:]: g[k] for k in g.files if k.startswith("dv.")},
        DINOv3Config.tiny())
    pooled, tokens = dinov3_forward(params, DINOv3Config.tiny(),
                                    jnp.asarray(g["pixels"]))
    np.testing.assert_allclose(np.asarray(tokens), g["tokens"], atol=3e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), g["pooled"], atol=3e-5,
                               rtol=1e-4)


def test_image2lora_matches_reference(g):
    params, _ = convert_image2lora_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("i2l.")}, I2L_CFG)
    lora = image2lora_forward(params, I2L_CFG, jnp.asarray(g["x"]),
                              jnp.asarray(g["residual"]))
    for k in lora:
        np.testing.assert_allclose(np.asarray(lora[k]), g["l1." + k],
                                   atol=2e-5, rtol=1e-4, err_msg=k)


def test_merge_matches_reference(g):
    params, _ = convert_image2lora_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("i2l.")}, I2L_CFG)
    l1 = image2lora_forward(params, I2L_CFG, jnp.asarray(g["x"]),
                            jnp.asarray(g["residual"]))
    l2 = image2lora_forward(params, I2L_CFG, jnp.asarray(g["x"]) * 0.5,
                            jnp.asarray(g["residual"]))
    merged = merge_image2lora([l1, l2], alpha=0.5)
    for k in merged:
        np.testing.assert_allclose(np.asarray(merged[k]), g["mg." + k],
                                   atol=2e-5, rtol=1e-4, err_msg=k)


def test_fuse_into_qwen_dit(g):
    """Image2LoRA output fuses into the Qwen DiT like any diffusers LoRA
    and shifts the forward."""
    from fairygen_tpu.models.qwen.dit import (
        QwenImageDiTConfig,
        init_qwen_image_dit_params,
        qwen_image_dit_forward,
    )
    from fairygen_tpu.models.qwen.lora import load_qwen_image_lora

    cfg = QwenImageDiTConfig.tiny()
    params = init_qwen_image_dit_params(jax.random.PRNGKey(0), cfg)
    i2l, _ = convert_image2lora_state_dict(
        {k[4:]: g[k] for k in g.files if k.startswith("i2l.")}, I2L_CFG)
    lora = image2lora_forward(i2l, I2L_CFG, jnp.asarray(g["x"]),
                              jnp.asarray(g["residual"]))
    fused = load_qwen_image_lora(jax.tree.map(lambda a: a, params), lora)

    rng = np.random.default_rng(3)
    lat = jnp.asarray(rng.standard_normal((1, 4, 8, 12)), jnp.float32)
    t = jnp.asarray([500.0])
    pe = jnp.asarray(rng.standard_normal((1, 6, 48)), jnp.float32)
    out0 = qwen_image_dit_forward(params, cfg, lat, t, pe)
    out1 = qwen_image_dit_forward(fused, cfg, lat, t, pe)
    assert np.isfinite(np.asarray(out1)).all()
    assert float(jnp.abs(out1 - out0).max()) > 1e-6  # the LoRA took effect
