"""IP-Adapter timing benchmark (reference analogue:
``stylization/BrushNet/benchmarks/benchmark_ip_adapters.py``).

Times the framework's image-prompt stack on FLUX.1: SigLIP SO400M encode
of the prompt image (once) + MLP projection to 128 IP tokens, then the
DiT sweep with the per-block decoupled IP cross-attention x steps, plus
the VAE decode.  Full preset runs the DiT at int8 W8A8 (single-v5e fit);
the SigLIP tower stays bf16.
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


def bench_flux_ipadapter(args):
    from fairygen_tpu.models.flux.dit import (
        FluxDiTConfig, flux_dit_forward, init_flux_dit_params)
    from fairygen_tpu.models.flux.ipadapter import (
        FluxIpAdapterConfig, flux_ipadapter_project, init_flux_ipadapter_params)
    from fairygen_tpu.models.sdxl.vae import (
        AutoencoderKLConfig, init_autoencoder_kl_params, vae_decode)
    from fairygen_tpu.models.siglip import (
        SiglipVisionConfig, init_siglip_vision_params, siglip_vision_forward)

    dtype = jnp.bfloat16
    quantize = "none"
    if args.preset == "tiny":
        dcfg = FluxDiTConfig.tiny()
        scfg = SiglipVisionConfig(hidden_size=16, intermediate_size=32,
                                  num_layers=1, num_heads=2, image_size=28,
                                  patch_size=14)
        icfg = FluxIpAdapterConfig.tiny(
            num_heads=dcfg.num_heads, head_dim=dcfg.head_dim,
            id_embeddings_dim=scfg.hidden_size,
            num_double_blocks=dcfg.num_double_blocks,
            num_single_blocks=dcfg.num_single_blocks)
        vcfg = AutoencoderKLConfig.tiny(block_out_channels=(16, 32))
        hw, lt = 8, 16
    else:
        dcfg = FluxDiTConfig.flux1_dev()
        icfg = FluxIpAdapterConfig()
        scfg = SiglipVisionConfig.so400m()
        vcfg = AutoencoderKLConfig.flux()
        hw, lt = 128, 512
        quantize = "int8"

    B = args.batch_size
    sparams = zeros_params(lambda: init_siglip_vision_params(
        jax.random.key(0), scfg, dtype=dtype))
    iparams = zeros_params(lambda: init_flux_ipadapter_params(
        jax.random.key(1), icfg, dtype=dtype))
    img = jnp.zeros((1, 3, scfg.image_size, scfg.image_size), dtype)

    @jax.jit
    def encode(sp, ip, im):
        pooled_emb, _ = siglip_vision_forward(sp, scfg, im)
        return flux_ipadapter_project(ip, icfg, pooled_emb)

    dt_enc = benchmark_fn(encode, sparams, iparams, img, n_iter=args.n_iter)
    ip_tokens = jax.device_get(encode(sparams, iparams, img))
    ip_tokens = jnp.asarray(ip_tokens)
    del sparams
    flush()  # drop the SigLIP executables before the 12B tower lands

    if quantize == "int8":
        # int8-from-birth (the 24 GB bf16 tree never exists).  FLUX's
        # AdaLN-modulation linears are named norm1_a/norm1_b/norm, so the
        # generic "norm"-skipping lists leave 3.3B params in bf16; skip
        # only the embedders — real norm gammas are 1-D and excluded by
        # the quantizer's ndim/min_dim guards.  The ~5 GB bf16 IP k/v
        # adapters quantize too (consume=True): SigLIP + IP + DiT + VAE
        # must share one chip's HBM.
        from fairygen_tpu.ops.quant import quantize_image_dit_params

        def make_dit():
            return quantize_image_dit_params(
                init_flux_dit_params(jax.random.key(2), dcfg, dtype=dtype),
                skip_substrings=("emb",))

        iparams = quantize_image_dit_params(
            iparams, block_keys=("double", "single"), consume=True)
    else:
        def make_dit():
            return init_flux_dit_params(jax.random.key(2), dcfg, dtype=dtype)

    dparams = zeros_params(make_dit)

    lat = jnp.zeros((B, dcfg.in_dim // 4, hw, hw), dtype)
    ts = jnp.full((B,), 500.0, jnp.float32)
    ctx = jnp.zeros((B, lt, dcfg.context_dim), dtype)
    pooled = jnp.zeros((B, dcfg.pooled_dim), dtype)
    guid = jnp.full((B,), 3.5, jnp.float32)

    @jax.jit
    def step(dp, ip, tok, x):
        return flux_dit_forward(dp, dcfg, x, ts, ctx, pooled, guid,
                                ipadapter=(ip, tok, 1.0))

    dt = benchmark_fn(step, dparams, iparams, ip_tokens, lat,
                      n_iter=args.n_iter)
    mem = device_memory_gbs()
    del dparams, iparams

    vp = init_autoencoder_kl_params(vcfg, dtype, include_encoder=False)
    z = jnp.zeros((B, vcfg.latent_channels, hw, hw), dtype)
    dt_vae = benchmark_fn(
        jax.jit(lambda p, z: vae_decode(p, vcfg, z)), vp, z,
        n_iter=args.n_iter)
    del vp
    flush()

    total = dt_enc + dt * args.num_inference_steps + dt_vae
    return generate_csv_dict(
        "FLUX1-IPAdapter", "1024px" if args.preset == "full" else "tiny",
        B, args.num_inference_steps, total, quantize=quantize,
        memory_gbs=mem)


def run(args):
    rows = [bench_flux_ipadapter(args)]
    report(rows, args.csv)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    add_common_args(p)
    run(p.parse_args())
