"""int8 W8A8 error accumulation over a full denoise rollout.

The forward-close tests (test_quant.py) bound single-sweep quantization
error; this bounds what actually matters for the int8 deployment mode
(bench.py FAIRYGEN_BENCH_INT8, pipe.quantize()): drift of the FINAL
latents after the 50-step flow-match Euler integration, where per-step
errors feed back through the trajectory.  Reference analogue: the FP8
linear mode (core/vram/layers.py:321-357) ships with no quality
evidence at all.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairygen_tpu.diffusion.flow_match import FlowMatchScheduler
from fairygen_tpu.models.wan.dit import (
    WanDiTConfig, init_dit_params, wan_dit_forward)
from fairygen_tpu.ops.quant import quantize_wan_dit_linears

CFG = WanDiTConfig(
    dim=96, in_dim=8, ffn_dim=192, out_dim=8, text_dim=32, freq_dim=32,
    patch_size=(1, 2, 2), num_heads=4, num_layers=2,
)


def _rollout(params, n_steps=50):
    sched = FlowMatchScheduler("Wan").set_timesteps(n_steps, shift=5.0)
    sigmas = jnp.asarray(np.append(sched.sigmas, 0.0), jnp.float32)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)
    lat = jax.random.normal(jax.random.key(1), (1, 8, 3, 8, 8))
    ctx = jax.random.normal(jax.random.key(2), (1, 6, 32))

    @jax.jit
    def run(params, lat):
        def body(i, x):
            v = wan_dit_forward(params, CFG, x, timesteps[i][None], ctx)
            return x + v * (sigmas[i + 1] - sigmas[i])

        return jax.lax.fori_loop(0, n_steps, body, lat)

    return run(params, lat)


@pytest.mark.slow
def test_int8_rollout_psnr():
    params = init_dit_params(jax.random.key(0), CFG)
    ref = _rollout(params)
    q = quantize_wan_dit_linears(params, ("ffn", "self_attn", "cross_attn"))
    out = _rollout(q)
    mse = float(jnp.mean((out - ref) ** 2))
    peak = float(jnp.abs(ref).max())
    psnr = 10.0 * np.log10(peak**2 / max(mse, 1e-20))
    # measured 53.8 dB on the tiny config; gate with margin.  Per-step
    # quant error (<2% rel, test_quant.py) stays bounded through the
    # 50-step Euler feedback rather than compounding.
    assert psnr > 40.0, psnr
