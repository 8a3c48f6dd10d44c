"""Profile the 720p (704x1280, 81f) VAE decode — VERDICT round-3 item 3.

The committed single-chip 720p decode number (25.7 s, docs/NOTES.md) used
the reference's default tiling (tile 30x52, stride 15x26 -> 9 tiles).
At the 44x80-latent 720p grid that tiling computes 2.74x the frame area
(sum of tile areas 73x132 vs 44x80) — pure overlap redundancy, plus the
per-tile feather blend.  This tool measures, on the real chip:

  1. the 9-tile baseline (tile-overlap redundancy 2.74x),
  2. a 2-tile width split (tile 44x42, stride 44x38 -> redundancy 1.05x),
  3. the untiled full-frame decode at several frames_per_chunk
     (redundancy 1.0x; multi-frame chunking already bounds activation
     memory — the original reason for tiling on 16 GB),

and prints a summary table.  Results land in docs/NOTES.md / BENCHMARKS.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/fairygen_jax"))

import jax
import jax.numpy as jnp

from fairygen_tpu.models.wan.vae import (
    WanVAEConfig, init_vae_params, vae38_decode)
from fairygen_tpu.models.wan.vae_tiling import vae38_tiled_decode

LAT = (1, 48, 21, 44, 80)  # 81f @ 704x1280


def timed(fn, *a, **k):
    out = fn(*a, **k)
    float(out.sum())  # force through the tunnel
    t0 = time.perf_counter()
    out = fn(*a, **k)
    float(out.sum())
    return time.perf_counter() - t0


def main():
    dtype = jnp.bfloat16
    cfg = WanVAEConfig.wan22_38()
    params = jax.jit(lambda: init_vae_params(cfg, dtype))()
    lat = jnp.zeros(LAT, dtype)

    rows = []

    def run(label, fn):
        try:
            s = timed(fn)
            rows.append((label, s))
            print(f"{label:48s} {s:7.2f}s", flush=True)
        except Exception as e:  # OOM etc — report, keep going
            rows.append((label, None))
            print(f"{label:48s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    which = os.environ.get("BENCH_VAE_720P_WHICH", "all")
    if which in ("all", "full"):
        for fpc in (1, 2, 4):
            run(f"full-frame streaming fpc={fpc}",
                lambda fpc=fpc: vae38_decode(params, cfg, lat, streaming=True,
                                             frames_per_chunk=fpc))
    if which in ("all", "2tile"):
        run("2-tile (44x42 stride 44x38, redundancy 1.05x)",
            lambda: vae38_tiled_decode(params, cfg, lat,
                                       tile_size=(44, 42),
                                       tile_stride=(44, 38)))
    if which in ("all", "9tile"):
        run("9-tile reference default (30x52/15x26, 2.74x)",
            lambda: vae38_tiled_decode(params, cfg, lat))

    print("\nsummary:")
    for label, s in rows:
        print(f"  {label}: {s if s is None else round(s, 2)}")


if __name__ == "__main__":
    main()
