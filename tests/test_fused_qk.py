"""Fused rms-norm -> RoPE -> head-major prep kernel (ops/fused_qk) vs the
legacy chain (rms_norm -> rope_apply -> flash head-major relayout).

Kernel semantics run in interpreter mode on CPU; the compiled path is
exercised on real TPU by the bench and the real-weights tests.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fairygen_tpu.ops.fused_qk import (
    _fused_fwd,
    _pad_for_flash,
    _reference_chain,
    _rowscale,
    build_freqs_full,
    fused_qk_attention,
    rms_rope_heads_major,
)
from fairygen_tpu.ops.norms import rms_norm
from fairygen_tpu.ops.rope import build_freqs_grid, precompute_freqs_3d, rope_apply


def _inputs(b, s, n, hd, grid, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    d = n * hd
    xq = jnp.asarray(rng.standard_normal((b, s, d)), dtype)
    xk = jnp.asarray(rng.standard_normal((b, s, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, n, hd)), dtype)
    gq = jnp.asarray(rng.standard_normal((d,)) * (hd**-0.5) * 1.4427, dtype)
    gk = jnp.asarray(rng.standard_normal((d,)), dtype)
    freqs = build_freqs_grid(precompute_freqs_3d(hd, 128), *grid)
    assert freqs.shape[1] == s
    return xq, xk, v, gq, gk, freqs


@pytest.mark.slow
@pytest.mark.parametrize("s,grid", [(300, (5, 6, 10)), (777, (7, 111, 1))])
def test_prep_kernel_matches_legacy_chain(s, grid):
    """The prep kernel == rms_norm + rope_apply + head-major transpose to
    ~1 bf16 ulp (FMA association differs between the two graphs; the norm
    part alone is bit-identical — asserted below), padded tail rows are
    exact zeros (the bounded flash pad_correct contract)."""
    from jax.experimental.pallas import tpu as pltpu

    b, n, hd = 1, 2, 128
    xq, _, _, gq, _, freqs = _inputs(b, s, n, hd, grid)
    ff = build_freqs_full(freqs)
    eps = 1e-6

    ref = rms_norm(xq, gq, eps)
    ref = rope_apply(ref.reshape(b, s, n, hd), freqs)
    ref = ref.transpose(0, 2, 1, 3).reshape(b * n, s, hd)

    s_pad, _, _ = _pad_for_flash(s)
    with pltpu.force_tpu_interpret_mode():
        out = rms_rope_heads_major(xq, gq, _rowscale(xq, eps), ff, n, s_pad)
        out_norm_only = rms_rope_heads_major(
            xq, gq, _rowscale(xq, eps), None, n, s_pad, rope=False)

    a = np.asarray(out[:, :s].astype(jnp.float32))
    r = np.asarray(ref.astype(jnp.float32))
    np.testing.assert_allclose(a, r, atol=2e-2)  # ~1 ulp at bf16 scale
    assert float(jnp.abs(out[:, s:]).max()) == 0.0

    ref_n = rms_norm(xq, gq, eps).reshape(b, s, n, hd)
    ref_n = ref_n.transpose(0, 2, 1, 3).reshape(b * n, s, hd)
    np.testing.assert_array_equal(
        np.asarray(out_norm_only[:, :s].astype(jnp.float32)),
        np.asarray(ref_n.astype(jnp.float32)))


@pytest.mark.slow
@pytest.mark.parametrize(
    "b,s,n,grid",
    [(1, 300, 2, (5, 6, 10)), (1, 2500, 3, (25, 10, 10)),
     (2, 777, 2, (7, 111, 1))],
)
def test_fused_attention_matches_reference(b, s, n, grid):
    from jax.experimental.pallas import tpu as pltpu

    hd = 128
    xq, xk, v, gq, gk, freqs = _inputs(b, s, n, hd, grid, seed=1)
    ff = build_freqs_full(freqs)
    ref = _reference_chain(xq, xk, v, gq, gk, freqs, n, 1e-6)
    with pltpu.force_tpu_interpret_mode():
        out = _fused_fwd(xq, xk, v, gq, gk, ff, n, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(ref.astype(jnp.float32)), atol=2.5e-2)


def test_fused_attention_gradients_match_reference():
    """The custom_vjp backward routes through the legacy XLA chain, so
    gradients are EXACTLY the legacy gradients (fp32, CPU fallback)."""
    b, s, n, hd = 1, 300, 2, 128
    xq, xk, v, gq, gk, freqs = _inputs(b, s, n, hd, (5, 6, 10), seed=2,
                                       dtype=jnp.float32)
    ff = build_freqs_full(freqs)

    def loss_fused(*args):
        return jnp.sum(fused_qk_attention(*args, freqs, ff, n, 1e-6) ** 2)

    def loss_ref(*args):
        return jnp.sum(_reference_chain(*args, freqs, n, 1e-6) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(xq, xk, v, gq, gk)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(xq, xk, v, gq, gk)
    for a, b_ in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.slow
def test_natural_out_matches_head_major_out():
    """flash_attention_heads_major(natural_out=True) writes blocks straight
    into the (B, S, N, d) layout — identical values to the transpose-back
    path, for both the streaming and the small-kv kernels."""
    from unittest import mock

    from jax.experimental.pallas import tpu as pltpu

    import fairygen_tpu.ops.fused_qk as fq

    b, s, n = 1, 2500, 2
    xq, xk, v, gq, gk, freqs = _inputs(b, s, n, 128, (25, 10, 10), seed=7)
    ff = build_freqs_full(freqs)
    with pltpu.force_tpu_interpret_mode():
        base = fq._fused_fwd(xq, xk, v, gq, gk, ff, n, 1e-6)
        with mock.patch.object(fq, "_NATURAL_OUT", True):
            nat = fq._fused_fwd(xq, xk, v, gq, gk, ff, n, 1e-6)
    np.testing.assert_array_equal(np.asarray(nat), np.asarray(base))

    k = jnp.asarray(np.asarray(xk[:, :512]).reshape(b, 512, n, 128))
    vv = jnp.asarray(np.asarray(v[:, :512]))
    with pltpu.force_tpu_interpret_mode(), \
            mock.patch.object(fq, "_on_tpu", lambda: True):
        base = fq.fused_q_attention(xq, k, vv, gq, n, 1e-6)
        with mock.patch.object(fq, "_NATURAL_OUT", True):
            nat = fq.fused_q_attention(xq, k, vv, gq, n, 1e-6)
    np.testing.assert_array_equal(np.asarray(nat), np.asarray(base))


@pytest.mark.slow
def test_fused_q_cross_attention_matches_reference():
    """q-side-only prep (rms + relayout, no RoPE) for cross-attention."""
    from unittest import mock

    from jax.experimental.pallas import tpu as pltpu

    import fairygen_tpu.ops.fused_qk as fq

    rng = np.random.default_rng(4)
    b, s, n, hd, lk = 1, 777, 2, 128, 512
    d = n * hd
    xq = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, lk, n, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, lk, n, hd)), jnp.bfloat16)
    gq = jnp.asarray(rng.standard_normal((d,)) * (hd**-0.5) * 1.4427,
                     jnp.bfloat16)
    ref = fq._cross_reference_chain(xq, k, v, gq, n, 1e-6)
    with pltpu.force_tpu_interpret_mode(), \
            mock.patch.object(fq, "_on_tpu", lambda: True):
        out = fq.fused_q_attention(xq, k, v, gq, n, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(ref.astype(jnp.float32)), atol=2.5e-2)


def test_fused_q_cross_gradients_match_reference():
    import fairygen_tpu.ops.fused_qk as fq

    rng = np.random.default_rng(5)
    b, s, n, hd, lk = 1, 300, 2, 128, 77
    d = n * hd
    xq = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, n, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lk, n, hd)), jnp.float32)
    gq = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)

    def loss_fused(*args):
        return jnp.sum(fq.fused_q_attention(*args, n, 1e-6) ** 2)

    def loss_ref(*args):
        return jnp.sum(fq._cross_reference_chain(*args, n, 1e-6) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xq, k, v, gq)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xq, k, v, gq)
    for a, b_ in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_dit_cross_attention_cpu_fallback_unchanged():
    from fairygen_tpu.models.wan.dit import _cross_attention

    rng = np.random.default_rng(6)
    b, s, n, hd, lk = 1, 60, 2, 128, 33
    d = n * hd
    p = {
        "q": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "k": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "v": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "o": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "norm_q": jnp.ones((d,), jnp.float32),
        "norm_k": jnp.ones((d,), jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, lk, d)), jnp.float32)
    legacy = _cross_attention(p, x, ctx, n, 1e-6, False)
    fused = _cross_attention(p, x, ctx, n, 1e-6, False, fused_q=True)
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(fused))


@pytest.mark.slow
def test_fused_per_head_matches_reference():
    """Per-head-rms + interleaved-rope variant (Z-Image / image DiTs)."""
    from unittest import mock

    from jax.experimental.pallas import tpu as pltpu

    import fairygen_tpu.ops.fused_qk as fq

    rng = np.random.default_rng(8)
    b, s, n, hd = 1, 777, 3, 128
    d = n * hd
    xq = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    xk = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, n, hd)), jnp.bfloat16)
    gq = jnp.asarray(rng.standard_normal((hd,)), jnp.bfloat16)
    gk = jnp.asarray(rng.standard_normal((hd,)), jnp.bfloat16)
    ang = rng.uniform(0, 6.28, (s, hd // 2)).astype(np.float32)
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))
    ref = fq._reference_chain_per_head(xq, xk, v, gq, gk, cos, sin, n, 1e-5)
    with pltpu.force_tpu_interpret_mode(), \
            mock.patch.object(fq, "_on_tpu", lambda: True):
        out = fq.fused_qk_attention_per_head(xq, xk, v, gq, gk, cos, sin,
                                             n, 1e-5)
    # the fused path folds scale*log2e into gamma (one FEWER bf16
    # rounding than the legacy post-rope prescale) -> ~2 ulp divergence
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(ref.astype(jnp.float32)), atol=3.5e-2)


def test_fused_per_head_gradients_match_reference():
    import fairygen_tpu.ops.fused_qk as fq

    rng = np.random.default_rng(9)
    b, s, n, hd = 1, 300, 2, 128
    d = n * hd
    xq = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    xk = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, n, hd)), jnp.float32)
    gq = jnp.asarray(rng.standard_normal((hd,)) * 0.1, jnp.float32)
    gk = jnp.asarray(rng.standard_normal((hd,)), jnp.float32)
    ang = rng.uniform(0, 6.28, (s, hd // 2)).astype(np.float32)
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))

    def loss_fused(*args):
        return jnp.sum(
            fq.fused_qk_attention_per_head(*args, cos, sin, n, 1e-5) ** 2)

    def loss_ref(*args):
        return jnp.sum(
            fq._reference_chain_per_head(*args, cos, sin, n, 1e-5) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(xq, xk, v, gq, gk)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(xq, xk, v, gq, gk)
    for a, b_ in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_z_image_attention_cpu_fallback_unchanged():
    """On CPU the Z-Image fused gate routes through the reference chain —
    must equal the legacy branch exactly (golden invariance)."""
    from unittest import mock

    import fairygen_tpu.models.z_image.dit as zd

    cfg = zd.ZImageDiTConfig(dim=256, num_heads=2, num_layers=1,
                             num_refiner_layers=1, axes_dims=(32, 48, 48),
                             cap_feat_dim=32)
    assert cfg.head_dim == 128
    rng = np.random.default_rng(10)
    d = cfg.dim
    p = {
        "to_q": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "to_k": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "to_v": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "to_out": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "norm_q": jnp.ones((cfg.head_dim,), jnp.float32),
        "norm_k": jnp.ones((cfg.head_dim,), jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((1, 64, d)), jnp.float32)
    ang = rng.uniform(0, 6.28, (64, 64)).astype(np.float32)
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))
    with mock.patch.dict("os.environ", {"FAIRYGEN_FUSED_QK": "1"}):
        fused = zd._attention(p, x, cos, sin, cfg)
    with mock.patch.dict("os.environ", {"FAIRYGEN_FUSED_QK": "0"}):
        legacy = zd._attention(p, x, cos, sin, cfg)
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(fused))


def test_flux_single_blocks_cpu_fallback_unchanged():
    """FLUX.1 / FLUX.2 single blocks with the fused gate on vs off — on
    CPU both route through the reference chain, outputs must be equal."""
    from unittest import mock

    import fairygen_tpu.models.flux.dit as fd
    import fairygen_tpu.models.flux2.dit as f2

    rng = np.random.default_rng(11)

    cfg = fd.FluxDiTConfig.tiny(dim=256, num_heads=2, axes_dim=(4, 30, 30))
    params = fd.init_flux_dit_params(jax.random.key(0), cfg, jnp.float32)
    blk = jax.tree.map(lambda a: a[0], params["single_blocks"])
    x = jnp.asarray(rng.standard_normal((1, 96, cfg.dim)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, cfg.dim)), jnp.float32)
    ang = rng.uniform(0, 6.28, (96, cfg.head_dim // 2)).astype(np.float32)
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))
    with mock.patch.dict("os.environ", {"FAIRYGEN_FUSED_QK": "1"}):
        a = fd.flux_single_block(blk, x, cond, cos, sin, cfg)
    with mock.patch.dict("os.environ", {"FAIRYGEN_FUSED_QK": "0"}):
        b_ = fd.flux_single_block(blk, x, cond, cos, sin, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    cfg2 = f2.Flux2DiTConfig.tiny(num_heads=2, head_dim=128,
                                  axes_dim=(32, 32, 32, 32))
    params2 = f2.init_flux2_dit_params(jax.random.key(1), cfg2, jnp.float32)
    blk2 = jax.tree.map(lambda a: a[0], params2["single_blocks"])
    x = jnp.asarray(rng.standard_normal((1, 96, cfg2.dim)), jnp.float32)
    mod = (jnp.zeros((1, cfg2.dim)), jnp.zeros((1, cfg2.dim)),
           jnp.ones((1, cfg2.dim)))
    ang = rng.uniform(0, 6.28, (96, cfg2.head_dim // 2)).astype(np.float32)
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))
    with mock.patch.dict("os.environ", {"FAIRYGEN_FUSED_QK": "1"}):
        a = f2.flux2_single_block(blk2, x, mod, cos, sin, cfg2)
    with mock.patch.dict("os.environ", {"FAIRYGEN_FUSED_QK": "0"}):
        b_ = f2.flux2_single_block(blk2, x, mod, cos, sin, cfg2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


@pytest.mark.slow
def test_fused_per_head_prescaled_matches_reference():
    """fold_scale=False (FLUX convert-time prescale): the fused path must
    match the legacy prescaled=True chain."""
    from unittest import mock

    from jax.experimental.pallas import tpu as pltpu

    import fairygen_tpu.ops.fused_qk as fq

    rng = np.random.default_rng(12)
    b, s, n, hd = 1, 300, 2, 128
    d = n * hd
    xq = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    xk = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, n, hd)), jnp.bfloat16)
    gq = jnp.asarray(rng.standard_normal((hd,)) * (hd**-0.5) * 1.4427,
                     jnp.bfloat16)
    gk = jnp.asarray(rng.standard_normal((hd,)), jnp.bfloat16)
    ang = rng.uniform(0, 6.28, (s, hd // 2)).astype(np.float32)
    cos, sin = jnp.cos(jnp.asarray(ang)), jnp.sin(jnp.asarray(ang))
    ref = fq._reference_chain_per_head(xq, xk, v, gq, gk, cos, sin, n,
                                       1e-5, fold_scale=False)
    with pltpu.force_tpu_interpret_mode(), \
            mock.patch.object(fq, "_on_tpu", lambda: True):
        out = fq.fused_qk_attention_per_head(xq, xk, v, gq, gk, cos, sin,
                                             n, 1e-5, False)
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(ref.astype(jnp.float32)), atol=3.5e-2)


@pytest.mark.slow
def test_s2v_block_fused_matches_legacy():
    """s2v_dit_block with freqs_full routed through the fused prep
    (interpret mode, mocked on-TPU) vs the legacy branch."""
    from unittest import mock

    from jax.experimental.pallas import tpu as pltpu

    import fairygen_tpu.ops.fused_qk as fq
    from fairygen_tpu.models.wan.s2v import S2VConfig, s2v_dit_block
    from fairygen_tpu.ops.rope import build_freqs_grid, precompute_freqs_3d

    cfg = S2VConfig(dim=256, num_heads=2, num_layers=1, ffn_dim=512,
                    text_dim=64)
    assert cfg.head_dim == 128
    rng = np.random.default_rng(13)
    d = cfg.dim

    def dense():
        return {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05,
                                 jnp.float32),
                "b": jnp.zeros((d,), jnp.float32)}

    blk = {
        "self_attn": {"q": dense(), "k": dense(), "v": dense(), "o": dense(),
                      "norm_q": jnp.ones((d,), jnp.float32),
                      "norm_k": jnp.ones((d,), jnp.float32)},
        "cross_attn": {"q": dense(), "k": dense(), "v": dense(),
                       "o": dense(),
                       "norm_q": jnp.ones((d,), jnp.float32),
                       "norm_k": jnp.ones((d,), jnp.float32)},
        "norm3": {"w": jnp.ones((d,), jnp.float32),
                  "b": jnp.zeros((d,), jnp.float32)},
        "ffn": {"fc1": {"w": jnp.asarray(
                    rng.standard_normal((d, cfg.ffn_dim)) * 0.05,
                    jnp.float32), "b": jnp.zeros((cfg.ffn_dim,))},
                "fc2": {"w": jnp.asarray(
                    rng.standard_normal((cfg.ffn_dim, d)) * 0.05,
                    jnp.float32), "b": jnp.zeros((d,))}},
        "modulation": jnp.asarray(rng.standard_normal((6, d)) * 0.02,
                                  jnp.float32),
    }
    s = 300
    x = jnp.asarray(rng.standard_normal((1, s, d)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 33, d)), jnp.float32)
    t_mod2 = jnp.asarray(rng.standard_normal((2, 6, d)) * 0.02, jnp.float32)
    freqs = build_freqs_grid(precompute_freqs_3d(128, 128), 5, 6, 10)
    ff = fq.build_freqs_full(freqs)

    legacy = s2v_dit_block(blk, x, ctx, t_mod2, 260, freqs, cfg)
    with pltpu.force_tpu_interpret_mode(), \
            mock.patch.object(fq, "_on_tpu", lambda: True):
        fused = s2v_dit_block(blk, x, ctx, t_mod2, 260, freqs, cfg,
                              freqs_full=ff)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(legacy),
                               atol=1e-4, rtol=1e-4)


def test_dit_self_attention_cpu_fallback_unchanged():
    """On CPU (no TPU), _self_attention with freqs_full routes through the
    reference chain — outputs must equal the legacy freqs_full=None path
    exactly (golden-test invariance)."""
    from fairygen_tpu.models.wan.dit import _self_attention

    rng = np.random.default_rng(3)
    b, s, n, hd = 1, 60, 2, 128
    d = n * hd
    p = {
        "q": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "k": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "v": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "o": {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)},
        "norm_q": jnp.ones((d,), jnp.float32),
        "norm_k": jnp.ones((d,), jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    freqs = build_freqs_grid(precompute_freqs_3d(hd, 128), 5, 6, 2)
    ff = build_freqs_full(freqs)
    legacy = _self_attention(p, x, freqs, n, 1e-6)
    fused = _self_attention(p, x, freqs, n, 1e-6, freqs_full=ff)
    np.testing.assert_array_equal(np.asarray(legacy), np.asarray(fused))


@pytest.mark.slow
@pytest.mark.parametrize("s_t,s_i", [(256, 1100), (77, 300)])
def test_fused_joint_matches_reference(s_t, s_i):
    """JOINT txt+img path (Qwen / FLUX double blocks): two-stream prep
    into one buffer with an interior zero gap == the legacy per-stream
    rms -> rope -> txt-first concat -> bounded attention.  The gap rows
    contribute exp2(0)=1 each to every softmax denominator and are
    removed by the count-based pad correction — exactness is the point
    of this test, not just closeness."""
    from unittest import mock

    from jax.experimental.pallas import tpu as pltpu

    import fairygen_tpu.ops.fused_qk as fq

    rng = np.random.default_rng(11)
    b, n, hd = 1, 2, 128
    d = n * hd
    mk = lambda *sh: jnp.asarray(rng.standard_normal(sh), jnp.bfloat16)
    xq_t, xk_t = mk(b, s_t, d), mk(b, s_t, d)
    xq_i, xk_i = mk(b, s_i, d), mk(b, s_i, d)
    v_t, v_i = mk(b, s_t, n, hd), mk(b, s_i, n, hd)
    gq_t, gk_t = mk(d)[:hd], mk(d)[:hd]
    gq_i, gk_i = mk(d)[:hd], mk(d)[:hd]
    ang_t = rng.uniform(0, 6.28, (s_t, hd // 2)).astype(np.float32)
    ang_i = rng.uniform(0, 6.28, (s_i, hd // 2)).astype(np.float32)
    cos_t, sin_t = jnp.cos(jnp.asarray(ang_t)), jnp.sin(jnp.asarray(ang_t))
    cos_i, sin_i = jnp.cos(jnp.asarray(ang_i)), jnp.sin(jnp.asarray(ang_i))

    ref_t, ref_i = fq._reference_chain_joint(
        xq_t, xk_t, v_t, xq_i, xk_i, v_i, gq_t, gk_t, gq_i, gk_i,
        cos_t, sin_t, cos_i, sin_i, n, 1e-6, True)
    with pltpu.force_tpu_interpret_mode(), \
            mock.patch.object(fq, "_on_tpu", lambda: True):
        o_t, o_i = fq.fused_qk_attention_joint(
            xq_t, xk_t, v_t, xq_i, xk_i, v_i, gq_t, gk_t, gq_i, gk_i,
            cos_t, sin_t, cos_i, sin_i, n, 1e-6, True)
    assert o_t.shape == ref_t.shape and o_i.shape == ref_i.shape
    # scale-fold rounding (one fewer bf16 round) -> ~2 ulp
    np.testing.assert_allclose(np.asarray(o_t.astype(jnp.float32)),
                               np.asarray(ref_t.astype(jnp.float32)),
                               atol=3.5e-2)
    np.testing.assert_allclose(np.asarray(o_i.astype(jnp.float32)),
                               np.asarray(ref_i.astype(jnp.float32)),
                               atol=3.5e-2)


def test_fused_joint_gradients_match_reference():
    import fairygen_tpu.ops.fused_qk as fq

    rng = np.random.default_rng(12)
    b, s_t, s_i, n, hd = 1, 30, 70, 2, 128
    d = n * hd
    mk = lambda *sh: jnp.asarray(rng.standard_normal(sh), jnp.float32)
    args = (mk(b, s_t, d), mk(b, s_t, d), mk(b, s_t, n, hd),
            mk(b, s_i, d), mk(b, s_i, d), mk(b, s_i, n, hd),
            mk(hd) * 0.1, mk(hd), mk(hd) * 0.1, mk(hd))
    ang_t = rng.uniform(0, 6.28, (s_t, hd // 2)).astype(np.float32)
    ang_i = rng.uniform(0, 6.28, (s_i, hd // 2)).astype(np.float32)
    tabs = (jnp.cos(jnp.asarray(ang_t)), jnp.sin(jnp.asarray(ang_t)),
            jnp.cos(jnp.asarray(ang_i)), jnp.sin(jnp.asarray(ang_i)))

    def loss_fused(*a):
        o_t, o_i = fq.fused_qk_attention_joint(*a, *tabs, n, 1e-6, True)
        return jnp.sum(o_t ** 2) + jnp.sum(o_i ** 2)

    def loss_ref(*a):
        o_t, o_i = fq._reference_chain_joint(*a, *tabs, n, 1e-6, True)
        return jnp.sum(o_t ** 2) + jnp.sum(o_i ** 2)

    nargs = tuple(range(10))
    g1 = jax.grad(loss_fused, argnums=nargs)(*args)
    g2 = jax.grad(loss_ref, argnums=nargs)(*args)
    for a, b_ in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_qwen_flux2_joint_cpu_fallback_unchanged():
    """On CPU the Qwen / FLUX.2 double-block fused gates route through the
    reference chain — block outputs must be invariant to the gate
    (golden-test invariance), asserted via FAIRYGEN_FUSED_QK."""
    from unittest import mock
    import os

    import fairygen_tpu.ops.fused_qk as fq
    from fairygen_tpu.models.qwen.dit import (
        QwenImageDiTConfig, init_qwen_image_dit_params, qwen_block)

    cfg = QwenImageDiTConfig(dim=256, num_heads=2, head_dim=128,
                             num_layers=1)
    params = init_qwen_image_dit_params(jax.random.key(0), cfg, jnp.float32)
    blk = jax.tree.map(lambda a: a[0], params["blocks"])
    rng = np.random.default_rng(13)
    b, li, lt = 1, 48, 16
    img = jnp.asarray(rng.standard_normal((b, li, cfg.dim)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((b, lt, cfg.dim)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((b, cfg.dim)), jnp.float32)
    ang_i = rng.uniform(0, 6.28, (li, 64)).astype(np.float32)
    ang_t = rng.uniform(0, 6.28, (lt, 64)).astype(np.float32)
    rope = (jnp.cos(jnp.asarray(ang_i)), jnp.sin(jnp.asarray(ang_i)),
            jnp.cos(jnp.asarray(ang_t)), jnp.sin(jnp.asarray(ang_t)))
    with mock.patch.dict(os.environ, {"FAIRYGEN_FUSED_QK": "1"}):
        a1 = qwen_block(blk, img, txt, cond, rope, cfg)
    with mock.patch.dict(os.environ, {"FAIRYGEN_FUSED_QK": "0"}):
        a2 = qwen_block(blk, img, txt, cond, rope, cfg)
    for x1, x2 in zip(a1, a2):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
