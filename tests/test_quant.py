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


def _rel(out, ref):
    out, ref = np.asarray(out), np.asarray(ref)
    return float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6))


def _assert_all_swapped(tree):
    """Every non-skipped dense in the block tree carries w_int8."""
    n = [0]

    def rec(node):
        if isinstance(node, (list, tuple)):
            for v in node:
                rec(v)
            return
        if not isinstance(node, dict):
            return
        if "w_int8" in node:
            n[0] += 1
        for v in node.values():
            rec(v)

    rec(tree)
    assert n[0] > 0, "no dense layer was quantized"


def test_quantize_image_dit_flux():
    from fairygen_tpu.models.flux.dit import (
        FluxDiTConfig, flux_dit_forward, init_flux_dit_params)
    from fairygen_tpu.ops.quant import quantize_image_dit_params

    cfg = FluxDiTConfig.tiny()
    params = init_flux_dit_params(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 4, 8, 12)) * 0.3
    emb = jax.random.normal(jax.random.key(2), (1, 5, cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(3), (1, cfg.pooled_dim))
    args = (lat, jnp.asarray([500.0]), emb, pooled, jnp.asarray([4.0]))
    ref = flux_dit_forward(params, cfg, *args)
    qp = quantize_image_dit_params(params, min_dim=8)
    _assert_all_swapped([qp["double_blocks"], qp["single_blocks"]])
    assert "w" in qp["x_embedder"]  # embedders stay bf16
    out = flux_dit_forward(qp, cfg, *args)
    assert _rel(out, ref) < 0.06


def test_quantize_image_dit_qwen():
    from fairygen_tpu.models.qwen.dit import (
        QwenImageDiTConfig, init_qwen_image_dit_params,
        qwen_image_dit_forward)
    from fairygen_tpu.ops.quant import quantize_image_dit_params

    cfg = QwenImageDiTConfig.tiny()
    params = init_qwen_image_dit_params(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 4, 8, 8)) * 0.3
    emb = jax.random.normal(jax.random.key(2), (1, 5, cfg.txt_dim))
    args = (lat, jnp.asarray([500.0]), emb)
    ref = qwen_image_dit_forward(params, cfg, *args)
    qp = quantize_image_dit_params(params, min_dim=8)
    _assert_all_swapped(qp["blocks"])
    # modulation linears stay bf16 (error-sensitive, FLOP-light)
    assert "w_int8" not in str(jax.tree_util.tree_structure(
        qp["blocks"]["img_mod"]))
    out = qwen_image_dit_forward(qp, cfg, *args)
    assert _rel(out, ref) < 0.06


def test_quantize_image_dit_z_image():
    from fairygen_tpu.models.z_image.dit import (
        ZImageDiTConfig, init_z_image_dit_params, z_image_dit_forward)
    from fairygen_tpu.ops.quant import quantize_image_dit_params

    cfg = ZImageDiTConfig.tiny()
    params = init_z_image_dit_params(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 4, 8, 8)) * 0.3
    cap = jax.random.normal(jax.random.key(2), (1, 5, cfg.cap_feat_dim))
    args = (lat, jnp.asarray([0.4]), cap)
    ref = z_image_dit_forward(params, cfg, *args)
    qp = quantize_image_dit_params(params, min_dim=8)
    _assert_all_swapped([qp["layers"], qp["noise_refiner"],
                         qp["context_refiner"]])
    out = z_image_dit_forward(qp, cfg, *args)
    assert _rel(out, ref) < 0.06


def test_quantize_image_dit_flux2():
    from fairygen_tpu.models.flux2.dit import (
        Flux2DiTConfig, flux2_dit_forward, init_flux2_dit_params,
        prepare_image_ids)
    from fairygen_tpu.ops.quant import quantize_image_dit_params

    cfg = Flux2DiTConfig.tiny()
    params = init_flux2_dit_params(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 24, 16)) * 0.3
    prompt = jax.random.normal(jax.random.key(2), (1, 5, 48))
    args = (lat, jnp.asarray([0.5]), prompt, jnp.asarray([4.0]))
    kw = dict(img_ids=prepare_image_ids(4, 6))
    ref = flux2_dit_forward(params, cfg, *args, **kw)
    qp = quantize_image_dit_params(params, min_dim=8)
    _assert_all_swapped([qp["double_blocks"], qp["single_blocks"]])
    out = flux2_dit_forward(qp, cfg, *args, **kw)
    assert _rel(out, ref) < 0.06


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


def test_quantize_fit_skip_qwen():
    """_FIT_SKIP quantizes the modulation linears too (single-chip 20B
    fit mode); forward stays close, all mod denses carry w_int8."""
    from fairygen_tpu.models.qwen.dit import (
        QwenImageDiTConfig, init_qwen_image_dit_params,
        qwen_image_dit_forward)
    from fairygen_tpu.ops.quant import _FIT_SKIP, quantize_image_dit_params

    cfg = QwenImageDiTConfig.tiny()
    params = init_qwen_image_dit_params(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 4, 8, 8)) * 0.3
    emb = jax.random.normal(jax.random.key(2), (1, 5, cfg.txt_dim))
    args = (lat, jnp.asarray([500.0]), emb)
    ref = qwen_image_dit_forward(params, cfg, *args)
    qp = quantize_image_dit_params(params, min_dim=8,
                                   skip_substrings=_FIT_SKIP)
    assert "w_int8" in str(jax.tree_util.tree_structure(
        qp["blocks"]["img_mod"]))
    out = qwen_image_dit_forward(qp, cfg, *args)
    assert _rel(out, ref) < 0.12  # mods quantized: looser than default


def test_host_load_and_staged_params():
    """core/offload: host-committed load + per-call HBM onload context."""
    from fairygen_tpu.core.offload import (
        StagedParams, host_load_context, to_accelerator)

    with host_load_context(True):
        tree = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    cpu = jax.devices("cpu")[0]
    assert all(cpu in a.devices() for a in jax.tree.leaves(tree))

    staged = StagedParams(tree)
    with staged.use() as dev_tree:
        y = jax.jit(lambda p, x: x @ p["w"] + p["b"])(
            dev_tree, jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(y), 4.0)
    # host copy intact after the context exits
    assert all(cpu in a.devices() for a in jax.tree.leaves(staged.host_tree))
    assert to_accelerator(None) is None


def test_quantize_image_dit_flux_with_outlier_robust_tree():
    """The generic image-DiT quantizer accepts a calibration pytree
    mirroring the params: dense nodes with {"amax": (L, K)} get the
    outlier-robust path (migration + bf16 fallback), everything else
    stays plain W8A8 — the same mechanism the Wan stack deploys
    (test_quant_outlier.py), available to every family."""
    from fairygen_tpu.models.flux.dit import (
        FluxDiTConfig, flux_dit_forward, init_flux_dit_params)
    from fairygen_tpu.ops.quant import quantize_image_dit_params

    cfg = FluxDiTConfig.tiny()
    params = init_flux_dit_params(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 4, 8, 12)) * 0.3
    emb = jax.random.normal(jax.random.key(2), (1, 5, cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(3), (1, cfg.pooled_dim))
    args = (lat, jnp.asarray([500.0]), emb, pooled, jnp.asarray([4.0]))
    ref = flux_dit_forward(params, cfg, *args)

    L = cfg.num_double_blocks
    amax_fc2 = np.abs(np.random.default_rng(0).normal(
        size=(L, 4 * cfg.dim))).astype(np.float32) + 0.5
    cal = {"double_blocks": {"ff_a": {"fc2": {"amax": amax_fc2,
                                              "outlier_k": 4}}}}
    qp = quantize_image_dit_params(params, min_dim=8, act_amax=cal)
    fc2 = qp["double_blocks"]["ff_a"]["fc2"]
    assert "act_smooth" in fc2 and "outlier_sel" in fc2 \
        and "w_outlier" in fc2
    assert fc2["outlier_sel"].shape == (L, 4 * cfg.dim, 4)
    # uncalibrated neighbours stay plain
    fc1 = qp["double_blocks"]["ff_a"]["fc1"]
    assert "w_int8" in fc1 and "act_smooth" not in fc1
    out = flux_dit_forward(qp, cfg, *args)
    assert _rel(out, ref) < 0.06


def test_pipeline_quantize_with_calibration_stats():
    """pipe.quantize(act_amax=, outlier_k=) deploys the outlier-robust
    path through the product API (selective placement form)."""
    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline
    from fairygen_tpu.training.quant_experiment import (
        calibrate_wan_dit_act_amax,
    )

    cfg = WanDiTConfig(
        dim=48, in_dim=8, ffn_dim=96, out_dim=8, text_dim=16, freq_dim=16,
        patch_size=(1, 2, 2), num_heads=2, num_layers=2)
    params = init_dit_params(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 8, 2, 4, 4))
    ctx = jax.random.normal(jax.random.key(2), (1, 5, 16))
    ref = wan_dit_forward(params, cfg, lat, jnp.asarray([500.0]), ctx)

    amax = calibrate_wan_dit_act_amax(
        params, cfg, [(lat, jnp.full((1,), 500.0, jnp.float32), ctx)])
    pipe = WanVideoPipeline(dit_params=params, dit_cfg=cfg,
                            dtype=jnp.float32)
    pipe.quantize("int8", act_amax=amax,
                  outlier_k={"ffn": {"fc2": 4}})
    fc2 = pipe.dit_params["blocks"]["ffn"]["fc2"]
    assert "outlier_sel" in fc2 and "act_smooth" in fc2
    out = wan_dit_forward(pipe.dit_params, cfg, lat, jnp.asarray([500.0]),
                          ctx)
    assert float(jnp.sqrt(jnp.mean((out - ref) ** 2)
                          / jnp.mean(ref ** 2))) < 0.1


def test_flux_calibration_collector_feeds_generic_quantizer():
    """calibrate_flux_dit_act_amax -> quantize_image_dit_params(act_amax=):
    the FLUX counterpart of the Wan calibrate->quantize flow, with the
    static call-order mapping shape-asserted per layer."""
    from fairygen_tpu.models.flux.dit import (
        FluxDiTConfig, flux_dit_forward, init_flux_dit_params)
    from fairygen_tpu.ops.quant import quantize_image_dit_params
    from fairygen_tpu.training.quant_experiment import (
        calibrate_flux_dit_act_amax)

    cfg = FluxDiTConfig.tiny()
    params = init_flux_dit_params(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 4, 8, 12)) * 0.3
    emb = jax.random.normal(jax.random.key(2), (1, 5, cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(3), (1, cfg.pooled_dim))
    t = jnp.asarray([500.0])
    g = jnp.asarray([4.0])

    cal = calibrate_flux_dit_act_amax(params, cfg,
                                      [(lat, t, emb, pooled, g)])
    Ld, Ls = cfg.num_double_blocks, cfg.num_single_blocks
    assert cal["double_blocks"]["ff_a"]["fc2"]["amax"].shape == (
        Ld, 4 * cfg.dim)
    assert cal["double_blocks"]["attn"]["a_qkv"]["amax"].shape == (
        Ld, cfg.dim)
    assert cal["single_blocks"]["proj_out"]["amax"].shape == (
        Ls, 5 * cfg.dim)
    assert (cal["single_blocks"]["to_qkv_mlp"]["amax"] > 0).all()

    # mark the worst layer for fallback, quantize, run
    cal["double_blocks"]["ff_a"]["fc2"]["outlier_k"] = 4
    ref = flux_dit_forward(params, cfg, lat, t, emb, pooled, g)
    qp = quantize_image_dit_params(params, min_dim=8, act_amax=cal)
    fc2 = qp["double_blocks"]["ff_a"]["fc2"]
    assert "outlier_sel" in fc2 and "act_smooth" in fc2
    # every calibrated dense got the smoothing (norm1_* excluded by the
    # skip list, matching the quantizer's own placement rules)
    assert "act_smooth" in qp["single_blocks"]["to_qkv_mlp"]
    out = flux_dit_forward(qp, cfg, lat, t, emb, pooled, g)
    assert _rel(out, ref) < 0.06
