"""Size the VAE decoder's 44 TF/s low-res stage and test an all-matmul fix.

The 30x52/C1024 decoder stage measures 44 TF/s through XLA's conv3d
(docs/NOTES.md); the big-spatial stages run 118-126 TF/s.  Candidate fix:
expand the 3x3x3 conv as 27 shifted (T*H*W, C) @ (C, C) matmuls — pure
MXU work, no conv lowering, ~2 GB of shift copies per conv at full-seq.

Shapes benched: streaming chunk (T=4 latent frames + 2 cache) and
full-seq (T=21+2) at 30x52 and 60x104, C in {1024}.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_vae_lowres_conv.py
"""
import time

import jax
import jax.numpy as jnp


def _time(fn, *args, n_iter=10):
    o = fn(*args)
    float(o.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        o = fn(*args)
    float(o.astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / n_iter


def conv_xla(x, w, b):
    # (B,T,H,W,C) . (kt,kh,kw,Cin,Cout), VALID-T (pre-padded), SAME-HW
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b


def conv_taps(x, w, b):
    """27 shifted matmuls. x pre-padded in T (VALID); SAME spatial."""
    bsz, t, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    to = t - 2
    acc = jnp.zeros((bsz, to, h, wd, cout), jnp.float32)
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                xs = jax.lax.dynamic_slice(
                    xp, (0, dt, dh, dw, 0), (bsz, to, h, wd, cin))
                acc += jnp.einsum(
                    "bthwc,cd->bthwd", xs, w[dt, dh, dw],
                    preferred_element_type=jnp.float32)
    return acc.astype(x.dtype) + b


def main():
    key = jax.random.key(0)
    for (t, h, wd, c) in [(6, 30, 52, 1024), (23, 30, 52, 1024),
                          (10, 60, 104, 1024), (23, 60, 104, 512)]:
        kx, kw = jax.random.split(jax.random.fold_in(key, t * h * c), 2)
        x = jax.random.normal(kx, (1, t, h, wd, c), jnp.bfloat16)
        w = jax.random.normal(kw, (3, 3, 3, c, c), jnp.bfloat16) * 0.02
        b = jnp.zeros((c,), jnp.bfloat16)
        to = t - 2
        flops = 2 * 27 * c * c * to * h * wd
        f_x = jax.jit(conv_xla)
        f_t = jax.jit(conv_taps)
        dx = _time(f_x, x, w, b)
        dt_ = _time(f_t, x, w, b)
        ox = f_x(x, w, b).astype(jnp.float32)
        ot = f_t(x, w, b).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(ox - ot)) / (jnp.max(jnp.abs(ox)) + 1e-9))
        print(f"T={t:2d} {h}x{wd} C={c}: xla {dx*1e3:7.2f} ms "
              f"({flops/dx/1e12:5.1f} TF/s) | taps {dt_*1e3:7.2f} ms "
              f"({flops/dt_/1e12:5.1f} TF/s) | rel-err {err:.2e}")


if __name__ == "__main__":
    main()
