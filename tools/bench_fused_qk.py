"""A/B the fused q/k prep path (ops/fused_qk) at flagship shapes.

Times the 30-block scan at Wan2.2-TI2V-5B 480p/81f shapes (8190 tokens)
three ways:
  legacy   — rms_norm -> rope_apply -> flash (freqs_full=None)
  fused    — fused prep kernel + head-major flash
  fused+no — fused prep + natural-layout output stores

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_fused_qk.py
"""
import time

import jax
import jax.numpy as jnp

import fairygen_tpu.ops.fused_qk as fq
from fairygen_tpu.models.wan.dit import (
    WanDiTConfig, blocks_forward, init_dit_params,
)
from fairygen_tpu.ops.rope import build_freqs_grid, precompute_freqs_3d


def _time(fn, *args, n_iter=10):
    o = fn(*args)
    jax.tree.map(lambda t: float(t.astype(jnp.float32).sum()), o)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = fn(*args)
    jax.tree.map(lambda t: float(t.astype(jnp.float32).sum()), o)
    return (time.perf_counter() - t0) / n_iter


def main():
    dtype = jnp.bfloat16
    cfg = WanDiTConfig.ti2v_5b()
    shapes = jax.eval_shape(
        lambda: init_dit_params(jax.random.key(0), cfg, dtype=dtype))
    # random params (NOT zeros: the numeric check below needs nonzero q/k
    # projections; timing is data-independent)
    leaves, treedef = jax.tree.flatten(shapes)
    ks = jax.random.split(jax.random.key(1), len(leaves))
    params = jax.tree.unflatten(treedef, [
        jax.random.normal(k, s.shape, s.dtype) * 0.02
        for k, s in zip(ks, leaves)])

    s = 21 * 15 * 26  # 8190 tokens
    x = jnp.zeros((1, s, cfg.dim), dtype)
    ctx_e = jnp.zeros((1, 512, cfg.dim), dtype)
    t_mod = jnp.zeros((1, 2, 6, cfg.dim), dtype)
    freqs = build_freqs_grid(precompute_freqs_3d(cfg.head_dim), 21, 15, 26)
    ff = fq.build_freqs_full(freqs)
    seg = 15 * 26

    legacy = jax.jit(lambda p, xx: blocks_forward(
        p["blocks"], xx, ctx_e, t_mod, freqs, cfg, seg=seg))
    dt = _time(legacy, params, x)
    print(f"legacy 30-block scan: {dt*1e3:8.2f} ms ({dt/30*1e3:6.3f} ms/block)")

    fused = jax.jit(lambda p, xx: blocks_forward(
        p["blocks"], xx, ctx_e, t_mod, freqs, cfg, seg=seg, freqs_full=ff))
    dt_f = _time(fused, params, x)
    print(f"fused  30-block scan: {dt_f*1e3:8.2f} ms ({dt_f/30*1e3:6.3f} ms/block)")

    fq._NATURAL_OUT = True
    fused_no = jax.jit(lambda p, xx: blocks_forward(
        p["blocks"], xx, ctx_e, t_mod, freqs, cfg, seg=seg, freqs_full=ff))
    dt_n = _time(fused_no, params, x)
    print(f"fused+natural_out:    {dt_n*1e3:8.2f} ms ({dt_n/30*1e3:6.3f} ms/block)")
    fq._NATURAL_OUT = False

    # numeric sanity on-chip: fused vs legacy with the random params above
    # (zero params would zero the q/k projections and hide any kernel bug)
    xr = jax.random.normal(jax.random.key(2), x.shape, dtype)
    a = legacy(params, xr)
    b = fused(params, xr)
    diff = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    scale = float(jnp.abs(a.astype(jnp.float32)).max())
    print(f"max |legacy - fused| on random x/params: {diff:.3e} "
          f"(|legacy| max {scale:.3e})")


def z_image_block():
    """A/B one Z-Image unified block at the 1024px shape (L=4736)."""
    import os

    import numpy as np

    import fairygen_tpu.models.z_image.dit as zd

    dtype = jnp.bfloat16
    cfg = zd.ZImageDiTConfig.z_image()
    shapes = jax.eval_shape(
        lambda: zd.init_z_image_dit_params(jax.random.key(0), cfg, dtype=dtype))
    blk_shapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape[1:], s.dtype),
        shapes["layers"])
    blk = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), blk_shapes))()
    L = int(os.environ.get('FAIRYGEN_BENCH_L', 4608 + 128))  # img + caption
    x = jnp.zeros((1, L, cfg.dim), dtype)
    t_emb = jnp.zeros((1, cfg.adaln_dim), dtype)
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 6.28, (L, cfg.head_dim // 2)).astype(np.float32)
    cos, sin = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))

    for flag, name in [("0", "legacy"), ("1", "fused ")]:
        os.environ["FAIRYGEN_FUSED_QK"] = flag
        f = jax.jit(lambda p, xx: zd.z_block(p, xx, cos, sin, cfg,
                                             adaln=t_emb))
        dt = _time(f, blk, x)
        print(f"z-image {name} block: {dt*1e3:8.3f} ms")
    del os.environ["FAIRYGEN_FUSED_QK"]


def flux_single():
    """A/B one FLUX.1 single block at the 1024px shape (L=4608)."""
    import os

    import numpy as np

    import fairygen_tpu.models.flux.dit as fd

    dtype = jnp.bfloat16
    cfg = fd.FluxDiTConfig.flux1_dev()
    shapes = jax.eval_shape(
        lambda: fd.init_flux_dit_params(jax.random.key(0), cfg, dtype=dtype))
    blk_shapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape[1:], s.dtype),
        shapes["single_blocks"])
    blk = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), blk_shapes))()
    L = int(os.environ.get('FAIRYGEN_BENCH_L', 4096 + 512))
    x = jnp.zeros((1, L, cfg.dim), dtype)
    cond = jnp.zeros((1, cfg.dim), dtype)
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 6.28, (L, cfg.head_dim // 2)).astype(np.float32)
    cos, sin = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))

    for flag, name in [("0", "legacy"), ("1", "fused ")]:
        os.environ["FAIRYGEN_FUSED_QK"] = flag
        f = jax.jit(lambda p, xx: fd.flux_single_block(
            p, xx, cond, cos, sin, cfg, prescaled=True))
        dt = _time(f, blk, x)
        print(f"flux single {name} block: {dt*1e3:8.3f} ms")
    del os.environ["FAIRYGEN_FUSED_QK"]




def flux_double():
    """A/B one FLUX.1 double (joint txt+img) block at the 1024px shape."""
    import os

    import numpy as np

    import fairygen_tpu.models.flux.dit as fd

    dtype = jnp.bfloat16
    cfg = fd.FluxDiTConfig.flux1_dev()
    shapes = jax.eval_shape(
        lambda: fd.init_flux_dit_params(jax.random.key(0), cfg, dtype=dtype))
    blk_shapes = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape[1:], s.dtype),
        shapes["double_blocks"])
    blk = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), blk_shapes))()
    li, lt = 4096, 512
    xa = jnp.zeros((1, li, cfg.dim), dtype)   # img
    xb = jnp.zeros((1, lt, cfg.dim), dtype)   # txt
    cond = jnp.zeros((1, cfg.dim), dtype)
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 6.28, (lt + li, cfg.head_dim // 2)).astype(np.float32)
    cos, sin = jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))

    for flag, name in [("0", "legacy"), ("1", "fused ")]:
        os.environ["FAIRYGEN_FUSED_QK"] = flag
        f = jax.jit(lambda p, xi, xt: fd.flux_double_block(
            p, xi, xt, cond, cos, sin, cfg, prescaled=True)[0])
        dt = _time(f, blk, xa, xb)
        print(f"flux double {name} block: {dt*1e3:8.3f} ms")
    del os.environ["FAIRYGEN_FUSED_QK"]


def qwen_block_ab():
    """A/B one Qwen-Image joint block at the 1024px-class shape."""
    import os

    import numpy as np

    import fairygen_tpu.models.qwen.dit as qd

    dtype = jnp.bfloat16
    cfg = qd.QwenImageDiTConfig()
    shapes = jax.eval_shape(lambda: qd.init_qwen_image_dit_params(
        jax.random.key(0), qd.QwenImageDiTConfig(num_layers=1), dtype=dtype))
    blk = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape[1:], s.dtype), shapes["blocks"]))()
    li, lt = 4096, 256
    img = jnp.zeros((1, li, cfg.dim), dtype)
    txt = jnp.zeros((1, lt, cfg.dim), dtype)
    cond = jnp.zeros((1, cfg.dim), dtype)
    rng = np.random.default_rng(0)
    ai = rng.uniform(0, 6.28, (li, cfg.head_dim // 2)).astype(np.float32)
    at = rng.uniform(0, 6.28, (lt, cfg.head_dim // 2)).astype(np.float32)
    rope = (jnp.asarray(np.cos(ai)), jnp.asarray(np.sin(ai)),
            jnp.asarray(np.cos(at)), jnp.asarray(np.sin(at)))

    for flag, name in [("0", "legacy"), ("1", "fused ")]:
        os.environ["FAIRYGEN_FUSED_QK"] = flag
        f = jax.jit(lambda p, xi, xt: qd.qwen_block(
            p, xi, xt, cond, rope, qd.QwenImageDiTConfig(num_layers=1))[0])
        dt = _time(f, blk, img, txt)
        print(f"qwen joint {name} block: {dt*1e3:8.3f} ms")
    del os.environ["FAIRYGEN_FUSED_QK"]


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "wan"
    {"wan": main, "z": z_image_block, "flux": flux_single,
     "flux-double": flux_double, "qwen": qwen_block_ab}[which]()
