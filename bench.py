"""Flagship benchmark: Wan2.2-TI2V-5B single-chip clip generation.

Measures the full denoise program (50 flow-match steps, CFG as two batch-1
DiT sweeps — measured ~3% faster than the merged batch-2 form on v5e and
half the activation memory — first-frame re-pinning, all one jitted
fori_loop) plus the streamed causal VAE decode at 480x832x81f bf16, and
reports seconds per 5.4 s clip (the reference workload:
animation/inference.py:19-30).

Prints TWO JSON lines (primary first — the exact bf16 path):
  {"metric": "wan22_ti2v_5b_480p_81f_clip_seconds",      ...}
  {"metric": "wan22_ti2v_5b_480p_81f_clip_seconds_int8", ...}
vs_baseline is the north-star ratio: target_time / measured_time against
the BASELINE.md target of a 5 s clip in <60 s (>1.0 means faster than
target). Weights are zero-initialized (timing is weight-independent).

The int8 line is the W8A8 deployment mode (the reference's FP8-linear
capability, ops/quant.py; quality-gated on TRAINED tiny weights in
tests/test_quant_trained.py and error-budgeted in docs/NOTES.md — the
full-scale gate still needs real checkpoints, so the exact bf16 path
stays the primary).

Env:
  FAIRYGEN_BENCH_PRESET=tiny     quick smoke configuration
  FAIRYGEN_BENCH_STEPS=N         denoise steps (default 50)
  FAIRYGEN_BENCH_TEACACHE=0.19   enable the TeaCache skip gate at the given
                                 rel-L1 threshold (lossy accelerator; prints
                                 an auxiliary stderr line, primary metric
                                 stays the exact pipeline)
  FAIRYGEN_BENCH_INT8=0|ffn|all  0 disables the int8 line; ffn restricts the
                                 quantized groups (default: all of
                                 ffn+self_attn+cross_attn)
  FAIRYGEN_BENCH_720P=1          ALSO run the 720p/121f north-star workload
                                 and print it as a third JSON line (adds
                                 several minutes; committed rows live in
                                 benchmarks/collated_results.csv)
"""
import json
import os
import sys
import time

# Persistent XLA compilation cache: the tunneled backend's remote compile
# is the wall-clock bottleneck for cold runs (the first VAE chunk program
# alone is ~10 min); the cache makes repeat benches start in seconds.
# Timing sections are post-warm-up, so the metric is unaffected.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/fairygen_jax"))

import jax
import jax.numpy as jnp
import numpy as np


def _zeros_params(shapes):
    return jax.jit(lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()


def main():
    from fairygen_tpu.diffusion.flow_match import FlowMatchScheduler
    from fairygen_tpu.models.wan.dit import (
        WanDiTConfig, init_dit_params, wan_dit_forward,
    )
    from fairygen_tpu.models.wan.vae import (
        WanVAEConfig, init_vae_params, vae38_decode,
    )

    preset = os.environ.get("FAIRYGEN_BENCH_PRESET", "full")
    n_steps = int(os.environ.get("FAIRYGEN_BENCH_STEPS", "50"))

    if preset == "tiny":
        dit_cfg = WanDiTConfig(
            dim=96, in_dim=8, ffn_dim=192, out_dim=8, text_dim=64, freq_dim=32,
            patch_size=(1, 2, 2), num_heads=4, num_layers=2,
            seperated_timestep=True, require_clip_embedding=False,
            require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
        )
        lat_shape = (1, 8, 3, 4, 4)
        ctx_shape = (1, 16, 64)
        n_steps = min(n_steps, 4)
        decode_video = False
    else:
        dit_cfg = WanDiTConfig.ti2v_5b()
        lat_shape = (1, 48, 21, 30, 52)  # 81f @ 480x832
        ctx_shape = (1, 512, 4096)
        decode_video = True

    dtype = jnp.bfloat16
    dit_shapes = jax.eval_shape(
        lambda: init_dit_params(jax.random.key(0), dit_cfg, dtype=dtype)
    )
    dit_params = _zeros_params(dit_shapes)

    sched = FlowMatchScheduler("Wan").set_timesteps(n_steps, shift=5.0)
    sigmas = jnp.asarray(np.append(sched.sigmas, 0.0), jnp.float32)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)
    cfg_scale = 5.0

    ctx_p = jnp.zeros(ctx_shape, dtype)
    ctx_n = jnp.zeros(ctx_shape, dtype)

    # Chunked dispatch: a handful of steps per jit call. Amortizes host
    # overhead while keeping each device program short (the tunneled axon
    # backend cannot survive a single ~90 s dispatch).
    steps_per_dispatch = int(os.environ.get("FAIRYGEN_BENCH_CHUNK", "5"))

    import functools

    # Per-prompt cross-attention k/v hoisted out of the 100-sweep loop —
    # exactly what pipe() does (pipelines/wan_video.py _cross_kv); the
    # one-time precompute is timed as part of the clip below.
    from fairygen_tpu.models.wan.dit import precompute_cross_kv

    kv_fn = jax.jit(lambda p, c: precompute_cross_kv(p, dit_cfg, c))

    @functools.partial(jax.jit, static_argnums=(6,), donate_argnums=(1,))
    def denoise_chunk(params, latents, ffl, kv_p, kv_n, start, length):
        def step(i, lat):
            t1 = jnp.broadcast_to(timesteps[i], (1,))
            v_p = wan_dit_forward(params, dit_cfg, lat, t1, ctx_p,
                                  fuse_vae_embedding_in_latents=True,
                                  cross_kv=kv_p)
            v_n = wan_dit_forward(params, dit_cfg, lat, t1, ctx_n,
                                  fuse_vae_embedding_in_latents=True,
                                  cross_kv=kv_n)
            v = v_n + cfg_scale * (v_p - v_n)
            lat = lat + v.astype(lat.dtype) * (sigmas[i + 1] - sigmas[i]).astype(lat.dtype)
            return lat.at[:, :, 0:1].set(ffl)

        return jax.lax.fori_loop(start, start + length, step, latents)

    def denoise(params, latents, ffl):
        kv_p = kv_fn(params, ctx_p)
        kv_n = kv_fn(params, ctx_n)
        for s in range(0, n_steps, steps_per_dispatch):
            latents = denoise_chunk(params, latents, ffl, kv_p, kv_n,
                                    jnp.int32(s),
                                    min(steps_per_dispatch, n_steps - s))
        return latents

    latents = jnp.zeros(lat_shape, dtype)
    ffl = jnp.zeros(lat_shape[:2] + (1,) + lat_shape[3:], dtype)

    # warm-up (compile)
    out = denoise(dit_params, latents, ffl)
    float(out.sum())  # force full materialization through the tunnel

    t0 = time.perf_counter()
    out = denoise(dit_params, jnp.zeros(lat_shape, dtype), ffl)
    float(out.sum())
    denoise_s = time.perf_counter() - t0

    # W8A8 deployment mode — second first-class metric (VERDICT round-3
    # item 1): quality-gated on trained tiny weights in
    # tests/test_quant_trained.py, error budget in docs/NOTES.md.
    int8_mode = os.environ.get("FAIRYGEN_BENCH_INT8", "all")
    int8_s = None
    if int8_mode != "0" and preset != "tiny":
        from fairygen_tpu.ops.quant import quantize_wan_dit_linears

        groups = (("ffn",) if int8_mode == "ffn"
                  else ("ffn", "self_attn", "cross_attn"))
        qparams = quantize_wan_dit_linears(dit_params, groups)
        float(denoise(qparams, jnp.zeros(lat_shape, dtype), ffl).sum())
        t0 = time.perf_counter()
        float(denoise(qparams, jnp.zeros(lat_shape, dtype), ffl).sum())
        int8_s = time.perf_counter() - t0
        del qparams
        print(f"# int8({int8_mode}) denoise={int8_s:.2f}s "
              f"({denoise_s / int8_s:.2f}x vs bf16; W8A8 dynamic per-row "
              f"activation scales)", file=sys.stderr)

    # TeaCache rows default ON since round 5: same evidence class as the
    # int8 line (quality gated at trained-tiny scale — 70.08 dB at the
    # 35/50 operating point the calibrate->gate flow selects; the JSON
    # "note" carries the caveat until real weights mount).  Set
    # FAIRYGEN_BENCH_TEACACHE=0 to disable, or a float threshold for the
    # drift-gate mode.
    tea_thresh = os.environ.get("FAIRYGEN_BENCH_TEACACHE", "calibrated")
    if tea_thresh == "0":
        tea_thresh = None
    tea_times, tea_label = {}, ""
    if tea_thresh and preset != "tiny":
        from fairygen_tpu.utils.tea_cache import init_tea_cache_state

        tokens = (lat_shape[2] // dit_cfg.patch_size[0]) * \
            (lat_shape[3] // dit_cfg.patch_size[1]) * \
            (lat_shape[4] // dit_cfg.patch_size[2])
        if tea_thresh == "calibrated":
            # mechanical replay of the calibrate->gate OPERATING POINT
            # (training/tea_cache_experiment.py: threshold searched for
            # 0.7 compute -> 35/50 calc steps realized, 70.1 dB on the
            # trained demo model; offline replay == runtime schedule to
            # <=1 f32 flip).  Zero-init bench weights would drive the
            # drift gate to max-skip, so the schedule — whose wall-clock
            # cost is weight-independent — is forced instead: first/last
            # calc, 15 interior skips spread so no two are adjacent
            # (the accumulate-then-calc character of the gated runs).
            mask = np.ones(n_steps, bool)
            n_skip = round(0.3 * n_steps)
            interior = np.linspace(2, n_steps - 2, n_skip).round().astype(int)
            mask[interior] = False
            opts = dict(forced_calc_mask=jnp.asarray(mask),
                        num_inference_steps=n_steps)
            tea_label = f"calibrated {int(mask.sum())}/{n_steps}"
        else:
            opts = dict(model_id="Wan2.1-T2V-1.3B",
                        rel_l1_thresh=float(tea_thresh),
                        num_inference_steps=n_steps)
            tea_label = f"thresh={tea_thresh}"

        @functools.partial(jax.jit, donate_argnums=(1, 3))
        def tea_chunk(params, latents, ffl, tea, start):
            length = steps_per_dispatch
            def step(i, carry):
                lat, tea = carry
                x2 = jnp.concatenate([lat, lat], axis=0)
                t2 = jnp.broadcast_to(timesteps[i], (2,))
                v2, tea = wan_dit_forward(
                    params, dit_cfg, x2, t2,
                    jnp.concatenate([ctx_p, ctx_n], axis=0),
                    fuse_vae_embedding_in_latents=True,
                    tea_cache_state=tea, tea_cache_opts=opts,
                )
                v = v2[1:] + cfg_scale * (v2[:1] - v2[1:])
                lat = lat + v.astype(lat.dtype) * (sigmas[i + 1] - sigmas[i]).astype(lat.dtype)
                return lat.at[:, :, 0:1].set(ffl), tea

            return jax.lax.fori_loop(start, start + length, step, (latents, tea))

        def tea_denoise(params):
            lat = jnp.zeros(lat_shape, dtype)
            tea = init_tea_cache_state((2, 2, 6, dit_cfg.dim),
                                       (2, tokens, dit_cfg.dim), dtype=dtype)
            for s in range(0, n_steps, steps_per_dispatch):
                lat, tea = tea_chunk(params, lat, ffl, tea, jnp.int32(s))
            return lat

        def tea_row(tname, tparams, base):
            float(tea_denoise(tparams).sum())  # warm-up
            t0 = time.perf_counter()
            float(tea_denoise(tparams).sum())
            tea_times[tname] = time.perf_counter() - t0
            print(f"# teacache({tea_label}) {tname} denoise="
                  f"{tea_times[tname]:.2f}s ({base / tea_times[tname]:.2f}x "
                  f"vs dense {tname})", file=sys.stderr)

        # bf16 row FIRST with only the bf16 params resident: the tea
        # program is the batch-2 joint-CFG form, and bf16 (10 GB) + an
        # int8 copy (5 GB) + its activations OOMed a 16 GB chip
        # (round-5 log).  The int8 row then quantizes with consume=True,
        # freeing each bf16 weight as its int8 replacement appears.
        # Failures here must not cost the primary lines (the rows are
        # auxiliary; the tunneled backend can be flaky).
        try:
            tea_row("bf16", dit_params, denoise_s)
            if int8_mode != "0":
                from fairygen_tpu.ops.quant import (
                    quantize_wan_dit_linears)

                groups = (("ffn",) if int8_mode == "ffn"
                          else ("ffn", "self_attn", "cross_attn"))
                qtea = quantize_wan_dit_linears(dit_params, groups,
                                                consume=True)
                tea_row("int8", qtea, int8_s or denoise_s)
                del qtea
        except Exception as e:  # noqa: BLE001
            print(f"# teacache rows failed non-fatally: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)

    vae_s = 0.0
    if decode_video:
        del dit_params
        vae_cfg = WanVAEConfig.wan22_38()
        # structure-true zero params (models/wan/vae.init_vae_params —
        # verified leaf-identical to the builder this file used to carry)
        vae_params = jax.jit(lambda: init_vae_params(vae_cfg, dtype))()

        # warm-up (compiles the first-chunk + steady-state programs)
        # 4-frame streamed chunks: same causal math as the per-frame stream
        # (fp-reassociation drift only, test_decode_multiframe_chunks);
        # measured 5.58 -> 5.11 s (k=7: 5.27 s, k=1: 5.58 s) on v5e
        fpc = int(os.environ.get("FAIRYGEN_BENCH_VAE_CHUNK", "4"))
        video = vae38_decode(vae_params, vae_cfg, out.astype(dtype),
                             streaming=True, frames_per_chunk=fpc)
        float(video.sum())
        t0 = time.perf_counter()
        video = vae38_decode(vae_params, vae_cfg, out.astype(dtype),
                             streaming=True, frames_per_chunk=fpc)
        float(video.sum())
        vae_s = time.perf_counter() - t0

    total = denoise_s + vae_s
    target = 60.0  # BASELINE.md: 5 s clip in <60 s
    print(json.dumps({
        "metric": "wan22_ti2v_5b_480p_81f_clip_seconds",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(target / total, 3),
    }))
    if int8_s is not None:
        int8_total = int8_s + vae_s
        print(json.dumps({
            "metric": "wan22_ti2v_5b_480p_81f_clip_seconds_int8",
            "value": round(int8_total, 3),
            "unit": "s",
            "vs_baseline": round(target / int8_total, 3),
        }))
    for tname, tsec in tea_times.items():
        tt = tsec + vae_s
        print(json.dumps({
            "metric": f"wan22_ti2v_5b_480p_81f_clip_seconds_teacache_{tname}",
            "value": round(tt, 3),
            "unit": "s",
            "vs_baseline": round(target / tt, 3),
            "note": f"lossy accelerator at the calibrated operating point "
                    f"({tea_label}); quality evidence transfers from the "
                    f"tiny-scale calibrate->gate demo (70.1 dB) until real "
                    f"weights mount",
        }))
    print(f"# denoise={denoise_s:.2f}s ({n_steps} steps, two-sweep cfg) "
          f"vae_decode={vae_s:.2f}s preset={preset}", file=sys.stderr)
    if not tea_times and preset != "tiny":
        # committed operating rows (FAIRYGEN_BENCH_TEACACHE=calibrated,
        # 2026-08-20 on-chip: benchmarks/collated_results.csv): TeaCache
        # at the calibrate->gate 35/50 schedule = 47.24 s bf16 (1.27x
        # target) / 38.64 s composed with int8 (1.55x target); quality
        # transfers from the tiny-scale demo (70.1 dB) until real
        # weights mount
        print("# teacache operating rows committed: bf16 47.24 s / "
              "int8 38.64 s at 35/50 (rerun with "
              "FAIRYGEN_BENCH_TEACACHE=calibrated)", file=sys.stderr)
    if os.environ.get("FAIRYGEN_BENCH_720P") == "1" and preset != "tiny":
        bench_720p(n_steps)


def bench_720p(n_steps):
    """Auxiliary north-star row: 720p (704x1280) 81f single-chip clip.

    The BASELINE.md target is <60 s on a v5e-8; vs_baseline here is
    measured against the single-chip-equivalent bar 60*8=480 s (the
    v5e-8 run needs >=linear Ulysses sp=8 scaling, which the analytic
    projection + HLO-structure tests support — docs/NOTES.md).  VAE
    decode uses full-frame fpc=1 streaming: measured 11.90 s vs 25.65 s
    for the reference's 9-tile default and 12.82 s for a 2-tile split
    (tools/bench_vae_720p.py, 2026-08-19) — at 720p on 16 GB the tiling
    is pure overlap redundancy (2.74x recompute), so it's off here.
    """
    import functools

    from fairygen_tpu.diffusion.flow_match import FlowMatchScheduler
    from fairygen_tpu.models.wan.dit import (
        WanDiTConfig, init_dit_params, precompute_cross_kv, wan_dit_forward,
    )
    from fairygen_tpu.models.wan.vae import (
        WanVAEConfig, init_vae_params, vae38_decode,
    )

    dtype = jnp.bfloat16
    dit_cfg = WanDiTConfig.ti2v_5b()
    lat_shape = (1, 48, 21, 44, 80)  # 81f @ 704x1280
    ctx_shape = (1, 512, 4096)

    dit_params = _zeros_params(jax.eval_shape(
        lambda: init_dit_params(jax.random.key(0), dit_cfg, dtype=dtype)))
    sched = FlowMatchScheduler("Wan").set_timesteps(n_steps, shift=5.0)
    sigmas = jnp.asarray(np.append(sched.sigmas, 0.0), jnp.float32)
    timesteps = jnp.asarray(sched.timesteps, jnp.float32)
    cfg_scale = 5.0
    ctx_p = jnp.zeros(ctx_shape, dtype)
    ctx_n = jnp.zeros(ctx_shape, dtype)
    steps_per_dispatch = int(os.environ.get("FAIRYGEN_BENCH_CHUNK", "5"))

    kv_fn = jax.jit(lambda p, c: precompute_cross_kv(p, dit_cfg, c))

    @functools.partial(jax.jit, static_argnums=(6,), donate_argnums=(1,))
    def denoise_chunk(params, latents, ffl, kv_p, kv_n, start, length):
        def step(i, lat):
            t1 = jnp.broadcast_to(timesteps[i], (1,))
            v_p = wan_dit_forward(params, dit_cfg, lat, t1, ctx_p,
                                  fuse_vae_embedding_in_latents=True,
                                  cross_kv=kv_p)
            v_n = wan_dit_forward(params, dit_cfg, lat, t1, ctx_n,
                                  fuse_vae_embedding_in_latents=True,
                                  cross_kv=kv_n)
            v = v_n + cfg_scale * (v_p - v_n)
            lat = lat + v.astype(lat.dtype) * (sigmas[i + 1] - sigmas[i]).astype(lat.dtype)
            return lat.at[:, :, 0:1].set(ffl)

        return jax.lax.fori_loop(start, start + length, step, latents)

    ffl = jnp.zeros(lat_shape[:2] + (1,) + lat_shape[3:], dtype)
    kv_p = kv_fn(dit_params, ctx_p)
    kv_n = kv_fn(dit_params, ctx_n)

    def denoise():
        lat = jnp.zeros(lat_shape, dtype)
        for s in range(0, n_steps, steps_per_dispatch):
            lat = denoise_chunk(dit_params, lat, ffl, kv_p, kv_n,
                                jnp.int32(s),
                                min(steps_per_dispatch, n_steps - s))
        return lat

    # light warm-up: compile the chunk program once (full + remainder
    # shapes), then time ONE full pass — a second full 50-step pass at
    # ~4.6 s/step would double the several-minute runtime for nothing
    float(denoise_chunk(dit_params, jnp.zeros(lat_shape, dtype), ffl,
                        kv_p, kv_n, jnp.int32(0),
                        min(steps_per_dispatch, n_steps)).sum())
    rem = n_steps % steps_per_dispatch
    if rem:
        float(denoise_chunk(dit_params, jnp.zeros(lat_shape, dtype), ffl,
                            kv_p, kv_n, jnp.int32(0), rem).sum())
    t0 = time.perf_counter()
    out = denoise()
    float(out.sum())
    denoise_s = time.perf_counter() - t0

    del dit_params, kv_p, kv_n
    vae_cfg = WanVAEConfig.wan22_38()
    vae_params = jax.jit(lambda: init_vae_params(vae_cfg, dtype))()
    decode = lambda: vae38_decode(vae_params, vae_cfg, out.astype(dtype),  # noqa: E731
                                  streaming=True, frames_per_chunk=1)
    float(decode().sum())  # warm-up
    t0 = time.perf_counter()
    float(decode().sum())
    vae_s = time.perf_counter() - t0

    total = denoise_s + vae_s
    print(json.dumps({
        "metric": "wan22_ti2v_5b_720p_81f_clip_seconds_1chip",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(60.0 * 8 / total, 3),
    }))
    print(f"# 720p denoise={denoise_s:.2f}s vae_decode={vae_s:.2f}s "
          f"(full-frame fpc=1 stream, untiled)", file=sys.stderr)
    # v5e-8 projection = measured single-chip parts x the EXECUTED sp=8
    # program structure: the Ulysses sweep at this exact latent grid
    # (18480 tokens = 8 x 2310, zero padding, 4 all-to-alls/block — the
    # a2a payload is ~2.4 MB/block vs ~1.8 s of block compute) runs with
    # single-device-exact equality on the 8-device mesh
    # (tests/test_sp8_720p_program.py; dryrun sp8-720p-grid stage), so
    # the DiT sweep divides by 8; the decode stays the measured
    # single-chip fpc=1 stream (11.9 s — faster than any tiling, and the
    # sharded-tile alternative is also executed in the same test).
    proj = denoise_s / 8.0 + vae_s
    print(json.dumps({
        "metric": "wan22_ti2v_5b_720p_81f_clip_seconds_v5e8_projected",
        "value": round(proj, 3),
        "unit": "s",
        "vs_baseline": round(60.0 / proj, 3),
    }))


def _backend_ready(timeout_s=60):
    """Probe backend init in a SUBPROCESS (a failed in-process init is
    cached by jax and poisons every later attempt)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s + 30, capture_output=True)
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0


if __name__ == "__main__":
    # The axon tunnel can be transiently down (observed a multi-hour
    # outage 2026-08-17).  Wait for the backend in subprocess probes
    # BEFORE touching jax here, instead of failing the whole bench on
    # one refused init.  FAIRYGEN_BENCH_WAIT_S caps the wait (0 = off).
    wait_budget = float(os.environ.get("FAIRYGEN_BENCH_WAIT_S", "900"))
    t0 = time.time()
    while wait_budget > 0 and not _backend_ready():
        remaining = wait_budget - (time.time() - t0)
        if remaining <= 0:
            print("bench: backend never became ready "
                  f"(waited {wait_budget:.0f}s)", file=sys.stderr)
            break
        print(f"bench: backend unavailable, retrying "
              f"({remaining:.0f}s left)", file=sys.stderr)
        time.sleep(min(60, max(1, remaining)))
    main()
