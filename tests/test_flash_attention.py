"""Pallas flash attention kernel vs the XLA reference.

Runs in interpreter mode on CPU (kernel semantics), and compiled when a
real TPU is available.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fairygen_tpu.ops.attention import xla_attention
from fairygen_tpu.ops.flash_attention import _flash_fwd_impl, flash_attention


@pytest.mark.parametrize(
    "shape",
    [
        (1, 256, 2, 64),  # small
        (2, 777, 3, 64),  # ragged seq, pads + masks
        (1, 1024, 4, 128),
    ],
)
@pytest.mark.slow
def test_flash_matches_xla_interpret(shape):
    from jax.experimental.pallas import tpu as pltpu

    b, s, n, d = shape
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (b, s, n, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, n, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, n, d), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = _flash_fwd_impl(q, k, v, None)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_flash_cross_attention_shape_interpret():
    from jax.experimental.pallas import tpu as pltpu

    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (1, 300, 2, 64), jnp.float32)
    k = jax.random.normal(ks[1], (1, 77, 2, 64), jnp.float32)
    v = jax.random.normal(ks[2], (1, 77, 2, 64), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = _flash_fwd_impl(q, k, v, None)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_flash_backward_grads():
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], (1, 64, 2, 32), jnp.float32)
    k = jax.random.normal(ks[1], (1, 64, 2, 32), jnp.float32)
    v = jax.random.normal(ks[2], (1, 64, 2, 32), jnp.float32)

    def f_ref(q, k, v):
        return (xla_attention(q, k, v) ** 2).sum()

    # custom_vjp backward is the exact XLA recompute — compare grads
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda q, k, v: (flash_attention(q, k, v) ** 2).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_flash_bias_matches_xla_interpret():
    """Head-shared additive-bias kernel (EliGen regional masks): block
    -1e30/0 mask + small dense bias, ragged seq (pad masked via bias)."""
    from jax.experimental.pallas import tpu as pltpu

    from fairygen_tpu.ops.flash_attention import flash_attention_bias

    b, s, n, d = 1, 300, 2, 64
    ks = jax.random.split(jax.random.key(7), 4)
    q = jax.random.normal(ks[0], (b, s, n, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, n, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, n, d), jnp.float32)
    allow = jax.random.bernoulli(ks[3], 0.7, (b, s, s))
    allow = allow.at[:, jnp.arange(s), jnp.arange(s)].set(True)
    bias = jnp.where(allow, 0.0, -1e30).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_bias(q, k, v, bias)
    ref = xla_attention(q, k, v, bias=bias[:, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize(
    "shape,kv_len",
    [
        ((1, 777, 2, 64), None),   # ragged seq (pad-masked columns)
        ((1, 512, 2, 64), 300),    # explicit ragged kv (Ulysses padding)
        ((1, 300, 2, 64), None),   # small-kv single-tile path
        ((2, 2100, 4, 128), None),  # multi-tile streaming path
    ],
)
def test_bounded_logits_matches_default(shape, kv_len):
    """Max-free (bounded-logits) kernels must equal the max-tracking path
    bit-close on rms-norm-scale inputs, including pad masking and the
    explicit kv_len ragged path."""
    from jax.experimental.pallas import tpu as pltpu

    b, s, n, d = shape
    ks = jax.random.split(jax.random.key(11), 3)
    # rms-norm-scale magnitudes (the precondition for bounded_logits)
    q = jax.random.normal(ks[0], (b, s, n, d), jnp.float32)
    q = q / jnp.sqrt(jnp.mean(q * q, -1, keepdims=True))
    k = jax.random.normal(ks[1], (b, s, n, d), jnp.float32)
    k = k / jnp.sqrt(jnp.mean(k * k, -1, keepdims=True))
    v = jax.random.normal(ks[2], (b, s, n, d), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = _flash_fwd_impl(q, k, v, None, kv_len=kv_len,
                              bounded_logits=True)
    valid = None if kv_len is None else jnp.arange(s) < kv_len
    from fairygen_tpu.ops.attention import xla_attention as _xla

    ref = _xla(q, k[:, :kv_len] if kv_len else k,
               v[:, :kv_len] if kv_len else v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)
