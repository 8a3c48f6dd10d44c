"""ControlNet timing benchmark (reference analogue:
``stylization/BrushNet/benchmarks/benchmark_controlnet.py`` — here on
the framework's Qwen-Image blockwise ControlNet stack).

Per step: two CFG sweeps (posi/nega, as the reference's
``model_fn_qwen_image`` driver runs them) of the MMDiT with the
per-block ControlNet residual adds riding the scan, x steps, plus the
real causal-VAE decode (T=1).  The ~19.2B-param tower is ~19 GiB even
at int8 W8A8 — beyond one v5e's 16 GB — so the full preset measures
REDUCED DEPTHS (12 and 24 of 60 blocks, int8 ``_FIT_SKIP``, per-block
compute exact) and extrapolates the 60-block step from the two-point
per-block marginal, the same methodology as ``tools/bench_qwen.py``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from utils import (add_common_args, benchmark_fn, device_memory_gbs, flush,
                   generate_csv_dict, report, zeros_params)

FULL_DEPTH = 60


def _time_sweep(depth, hw, lt, quantize, n_iter):
    from fairygen_tpu.models.qwen.controlnet import (
        QwenImageBlockwiseControlNetConfig,
        init_qwen_blockwise_controlnet_params, qwen_blockwise_cond_embed)
    from fairygen_tpu.models.qwen.dit import (
        QwenImageDiTConfig, init_qwen_image_dit_params, patchify,
        qwen_image_dit_forward)

    dtype = jnp.bfloat16
    if depth is None:  # tiny preset
        dcfg = QwenImageDiTConfig.tiny()
        ccfg = QwenImageBlockwiseControlNetConfig.tiny(
            num_layers=dcfg.num_layers, dim=dcfg.dim, in_dim=dcfg.in_dim)
    else:
        dcfg = QwenImageDiTConfig(num_layers=depth)
        ccfg = QwenImageBlockwiseControlNetConfig(num_layers=depth)

    def q(p):
        if quantize != "int8":
            return p
        from fairygen_tpu.ops.quant import _FIT_SKIP, quantize_image_dit_params

        return quantize_image_dit_params(p, skip_substrings=_FIT_SKIP)

    dparams = zeros_params(lambda: q(init_qwen_image_dit_params(
        jax.random.key(0), dcfg, dtype=dtype)))
    cparams = zeros_params(lambda: q(init_qwen_blockwise_controlnet_params(
        jax.random.key(1), ccfg, dtype=dtype)))

    ch = dcfg.in_dim // 4  # pre-2x2-pack latent channels
    lat = jnp.zeros((1, ch, hw, hw), dtype)
    cond_lat = jnp.zeros((1, ch, hw, hw), dtype)
    ts = jnp.full((1,), 500.0, jnp.float32)
    ctx = jnp.zeros((1, lt, dcfg.txt_dim), dtype)

    # One sweep per jit program (the pipeline also runs posi/nega as
    # separate batch-1 sweeps); CFG is counted as 2 sweeps per step.
    @jax.jit
    def sweep(dp, cp, x):
        cn_cond = qwen_blockwise_cond_embed(cp, ccfg, patchify(cond_lat))
        bw = ((cp["blocks"], cn_cond, 1.0),)
        return qwen_image_dit_forward(dp, dcfg, x, ts, ctx,
                                      blockwise_controlnet=bw)

    dt = benchmark_fn(sweep, dparams, cparams, lat, n_iter=n_iter)
    mem = device_memory_gbs()
    del dparams, cparams
    flush()
    return dt, mem


def bench_qwen_controlnet(args):
    from fairygen_tpu.models.qwen.vae import (
        qwen_image_vae_config, qwen_image_vae_decode)
    from fairygen_tpu.models.wan.vae import WanVAEConfig, init_vae_params

    dtype = jnp.bfloat16
    if args.preset == "tiny":
        vcfg = WanVAEConfig.tiny_v1()
        hw = 8
        dt_sweep, mem = _time_sweep(None, hw, 16, "none", args.n_iter)
        quantize, label = "none", "tiny"
    else:
        vcfg = qwen_image_vae_config()  # the shared causal VAE, T=1
        hw = 128
        d1, d2 = 12, 24
        t1, _ = _time_sweep(d1, hw, 512, "int8", args.n_iter)
        t2, mem = _time_sweep(d2, hw, 512, "int8", args.n_iter)
        per_block = (t2 - t1) / (d2 - d1)
        dt_sweep = t1 + (FULL_DEPTH - d1) * per_block
        quantize = "int8"
        label = f"1024px-cfg-extrap{FULL_DEPTH}blk"
        print(f"# per block {per_block*1e3:.2f} ms, depth-{d1} sweep "
              f"{t1*1e3:.0f} ms -> extrapolated 60-block sweep "
              f"{dt_sweep*1e3:.0f} ms", file=sys.stderr)

    B = args.batch_size
    dt = 2.0 * dt_sweep * B  # posi + nega per step, per sample

    vp = init_vae_params(vcfg, dtype)
    z = jnp.zeros((B, vcfg.z_dim, hw, hw), dtype)
    dt_vae = benchmark_fn(
        jax.jit(lambda p, z: qwen_image_vae_decode(p, vcfg, z)), vp, z,
        n_iter=args.n_iter)
    del vp
    flush()

    total = dt * args.num_inference_steps + dt_vae
    return generate_csv_dict("QwenImage-ControlNet", label,
                             B, args.num_inference_steps, total,
                             quantize=quantize, memory_gbs=mem)


def run(args):
    rows = [bench_qwen_controlnet(args)]
    report(rows, args.csv)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_common_args(p)
    run(p.parse_args())
