"""W8A8 quantized dense — the FP8-linear capability port."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from fairygen_tpu.ops.quant import (
    quantize_dense_params, quantize_wan_dit_ffn, quantized_dense,
)
from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params, wan_dit_forward

CFG = WanDiTConfig(
    dim=96, in_dim=8, ffn_dim=128, out_dim=8, text_dim=32, freq_dim=32,
    patch_size=(1, 2, 2), num_heads=4, num_layers=2,
)


def test_quantized_dense_accuracy():
    rs = np.random.RandomState(0)
    p = {"w": jnp.asarray(rs.randn(64, 128).astype(np.float32) * 0.05),
         "b": jnp.asarray(rs.randn(128).astype(np.float32) * 0.01)}
    x = jnp.asarray(rs.randn(4, 10, 64).astype(np.float32))
    ref = x @ p["w"] + p["b"]
    qp = quantize_dense_params(p)
    out = quantized_dense(qp, x)
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 0.02, rel


@pytest.mark.slow
def test_quantized_ffn_dit_forward_close():
    params = init_dit_params(jax.random.key(0), CFG)
    lat = jax.random.normal(jax.random.key(1), (1, 8, 3, 8, 8)) * 0.5
    ts = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.key(2), (1, 6, 32))
    ref = wan_dit_forward(params, CFG, lat, ts, ctx)
    qparams = quantize_wan_dit_ffn(params)
    out = wan_dit_forward(qparams, CFG, lat, ts, ctx)
    rel = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-6))
    assert rel < 0.05, rel


@pytest.mark.slow
def test_quantized_all_linears_dit_forward_close():
    from fairygen_tpu.ops.quant import quantize_wan_dit_linears

    params = init_dit_params(jax.random.key(0), CFG)
    lat = jax.random.normal(jax.random.key(1), (1, 8, 3, 8, 8)) * 0.5
    ts = jnp.asarray([500.0])
    ctx = jax.random.normal(jax.random.key(2), (1, 6, 32))
    ref = wan_dit_forward(params, CFG, lat, ts, ctx)
    qparams = quantize_wan_dit_linears(
        params, ("ffn", "self_attn", "cross_attn"))
    # non-dense leaves (norm gammas) untouched; all six projections swapped
    for g in ("ffn", "self_attn", "cross_attn"):
        for k, v in qparams["blocks"][g].items():
            if isinstance(v, dict) and ("w" in v or "w_int8" in v):
                assert "w_int8" in v and "w" not in v, (g, k)
    out = wan_dit_forward(qparams, CFG, lat, ts, ctx)
    rel = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-6))
    assert rel < 0.06, rel


@pytest.mark.slow
def test_pipeline_quantize_smoke():
    """pipe.quantize('int8') end-to-end on the tiny pipeline goldens."""
    import pathlib

    import tests.test_wan_pipeline as twp

    path = pathlib.Path(__file__).parent / "goldens" / "wan_pipeline.npz"
    if not path.exists():
        pytest.skip("golden file wan_pipeline.npz not generated")
    g = np.load(path)
    kwargs = dict(
        context=jnp.asarray(g["ctx_p"]),
        negative_context=jnp.asarray(g["ctx_n"]),
        input_image=g["img_uint8"], seed=42,
        height=32, width=32, num_frames=9,
        cfg_scale=5.0, num_inference_steps=2, sigma_shift=5.0,
        output_type="floatpoint", torch_compat_noise=True,
    )
    pipe = twp._pipe(g)
    ref = pipe(**kwargs)
    pipe.quantize("int8")
    out = pipe(**kwargs)
    assert np.asarray(out).shape == np.asarray(ref).shape
    rel = float(np.abs(np.asarray(out) - np.asarray(ref)).max()
                / (np.abs(np.asarray(ref)).max() + 1e-6))
    assert rel < 0.25, rel  # int8 error compounds over 2 denoise steps
