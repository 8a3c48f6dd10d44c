"""Fused LayerNorm->modulate Pallas kernel vs the XLA reference.

Kernel semantics run in interpreter mode on CPU; the compiled path is
exercised on real TPU by the bench. The reference formula is itself
golden-tested transitively through every Wan DiT golden (dit_block's
unfused path computes the identical math).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fairygen_tpu.ops.fused_norms import (
    _ln_mod_pallas,
    _ln_mod_reference,
    affine_rows,
    layer_norm_modulate,
)


@pytest.mark.parametrize(
    "shape,seg",
    [
        ((1, 256, 128), 0),      # uniform modulation, exact tile
        ((2, 300, 256), 0),      # ragged seq -> pad path
        ((1, 512, 128), 113),    # two-segment boundary mid-tile
        ((2, 700, 128), 256),    # boundary on tile edge, ragged
    ],
)
def test_pallas_matches_reference(shape, seg):
    from jax.experimental.pallas import tpu as pltpu

    b, s, d = shape
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (b, s, d), jnp.float32)
    shift2 = jax.random.normal(ks[1], (b, 2, d), jnp.float32)
    scale2 = jax.random.normal(ks[2], (b, 2, d), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = _ln_mod_pallas(x, shift2, scale2, seg, 1e-6)
    ref = _ln_mod_reference(x, shift2, scale2, seg, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_bf16_pallas_matches_reference():
    from jax.experimental.pallas import tpu as pltpu

    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (1, 256, 128), jnp.float32).astype(jnp.bfloat16)
    sh = jax.random.normal(ks[1], (1, 2, 128), jnp.float32).astype(jnp.bfloat16)
    sc = jax.random.normal(ks[2], (1, 2, 128), jnp.float32).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = _ln_mod_pallas(x, sh, sc, 64, 1e-6)
    ref = _ln_mod_reference(x, sh, sc, 64, 1e-6)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2)


def test_grad_matches_plain_formula():
    """custom_vjp backward == autodiff through the plain XLA formula."""
    ks = jax.random.split(jax.random.key(2), 3)
    x = jax.random.normal(ks[0], (1, 96, 128), jnp.float32)
    sh = jax.random.normal(ks[1], (1, 2, 128), jnp.float32)
    sc = jax.random.normal(ks[2], (1, 2, 128), jnp.float32)

    def loss_fused(x, sh, sc):
        return jnp.sum(layer_norm_modulate(x, sh, sc, 40, 1e-6) ** 2)

    def loss_ref(x, sh, sc):
        return jnp.sum(_ln_mod_reference(x, sh, sc, 40, 1e-6) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, sh, sc)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, sh, sc)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_ln_modulate_uniform_wrapper():
    """ln_modulate (the FLUX/Qwen/FLUX.2 adaLN form) == legacy expression,
    on both the XLA fallback and the kernel path (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from fairygen_tpu.ops import fused_norms
    from fairygen_tpu.ops.norms import layer_norm

    ks = jax.random.split(jax.random.key(4), 3)
    x = jax.random.normal(ks[0], (2, 300, 128), jnp.float32)
    sh = jax.random.normal(ks[1], (2, 1, 128), jnp.float32)
    sc = jax.random.normal(ks[2], (2, 1, 128), jnp.float32)
    legacy = layer_norm(x, 1e-6) * (1 + sc) + sh

    out_cpu = fused_norms.ln_modulate(x, sh, sc, 1e-6)
    np.testing.assert_array_equal(np.asarray(out_cpu), np.asarray(legacy))

    with pltpu.force_tpu_interpret_mode():
        rows_sh = jnp.broadcast_to(sh, (2, 2, 128))
        rows_sc = jnp.broadcast_to(sc, (2, 2, 128))
        out_kernel = fused_norms._ln_mod_pallas(x, rows_sh, rows_sc, 0, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out_kernel), np.asarray(legacy), atol=2e-5, rtol=1e-4)

    # modulation-batch-1 broadcast against a larger x batch
    out_b = fused_norms.ln_modulate(x, sh[:1], sc[:1], 1e-6)
    legacy_b = layer_norm(x, 1e-6) * (1 + sc[:1]) + sh[:1]
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(legacy_b))


@pytest.mark.parametrize("with_scale", [True, False])
def test_rms_modulate(with_scale):
    """rms_modulate (Z-Image sandwich form) == rms_norm(x, w) * scale, on
    the XLA fallback (bit-exact) and the kernel path (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from fairygen_tpu.ops import fused_norms
    from fairygen_tpu.ops.norms import rms_norm

    ks = jax.random.split(jax.random.key(5), 3)
    x = jax.random.normal(ks[0], (2, 300, 128), jnp.float32)
    w = jax.random.normal(ks[1], (128,), jnp.float32)
    sc = (jax.random.normal(ks[2], (2, 1, 128), jnp.float32)
          if with_scale else None)
    legacy = rms_norm(x, w, 1e-5)
    if sc is not None:
        legacy = legacy * sc

    out_cpu = fused_norms.rms_modulate(x, w, sc, 1e-5)
    np.testing.assert_array_equal(np.asarray(out_cpu), np.asarray(legacy))

    with pltpu.force_tpu_interpret_mode():
        out_kernel = fused_norms._rms_mod_pallas(x, w, sc, 1e-5)
    np.testing.assert_allclose(
        np.asarray(out_kernel), np.asarray(legacy), atol=2e-5, rtol=1e-4)


def test_rms_modulate_grad_matches_plain():
    from fairygen_tpu.ops import fused_norms

    ks = jax.random.split(jax.random.key(6), 3)
    x = jax.random.normal(ks[0], (1, 96, 128), jnp.float32)
    w = jax.random.normal(ks[1], (128,), jnp.float32)
    sc = jax.random.normal(ks[2], (1, 1, 128), jnp.float32)

    def loss_fused(x, w, sc):
        return jnp.sum(fused_norms.rms_modulate(x, w, sc, 1e-5) ** 2)

    def loss_ref(x, w, sc):
        return jnp.sum(fused_norms._rms_mod_reference(x, w, sc, 1e-5) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, sc)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, sc)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("silu", [True, False])
def test_vae_rms_silu(silu):
    """Fused VAE channel-norm(+SiLU) == vae_rms_norm -> _silu, on the XLA
    fallback (bit-exact) and the kernel path (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from fairygen_tpu.models.wan.vae import _silu as vae_silu
    from fairygen_tpu.models.wan.vae import vae_rms_norm
    from fairygen_tpu.ops import fused_norms

    ks = jax.random.split(jax.random.key(7), 2)
    x = jax.random.normal(ks[0], (1, 2, 8, 40, 128), jnp.float32)
    g = jax.random.normal(ks[1], (128,), jnp.float32)
    legacy = vae_rms_norm(x, g)
    if silu:
        legacy = vae_silu(legacy)

    out_cpu = fused_norms.vae_rms_silu(x, g, silu)
    np.testing.assert_array_equal(np.asarray(out_cpu), np.asarray(legacy))

    with pltpu.force_tpu_interpret_mode():
        out_kernel = fused_norms._vae_rms_silu_pallas(
            x.reshape(-1, 128), g, silu).reshape(x.shape)
    np.testing.assert_allclose(
        np.asarray(out_kernel), np.asarray(legacy), atol=2e-5, rtol=1e-4)


def test_vae_rms_silu_grad_matches_plain():
    from fairygen_tpu.ops import fused_norms

    ks = jax.random.split(jax.random.key(8), 2)
    x = jax.random.normal(ks[0], (64, 128), jnp.float32)
    g = jax.random.normal(ks[1], (128,), jnp.float32)

    def loss_fused(x, g):
        return jnp.sum(fused_norms.vae_rms_silu(x, g, True) ** 2)

    def loss_ref(x, g):
        return jnp.sum(fused_norms._vae_rms_silu_reference(x, g, True) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, g)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, g)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_affine_rows_is_affine_layernorm():
    """affine_rows turns (w, b) into rows so the fused op == LN(x)*w + b."""
    ks = jax.random.split(jax.random.key(3), 3)
    x = jax.random.normal(ks[0], (2, 64, 128), jnp.float32)
    w = jax.random.normal(ks[1], (128,), jnp.float32)
    b = jax.random.normal(ks[2], (128,), jnp.float32)
    sh, sc = affine_rows(w, b, 2)
    out = layer_norm_modulate(x, sh, sc, 0, 1e-6)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    ref = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * w + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
