"""Serving scheduler benchmark: continuous (step-level) vs request-level.

No reference analogue (the reference serves nothing).  Measures the
property the continuous engine exists for — head-of-line latency for
short requests that arrive while a long clip is denoising:

  scenario: ONE long request (L steps) is admitted first; N short
  requests (s steps each) arrive immediately after.

  fifo        request-level BatchingEngine: shorts queue behind the full
              long clip (plus each other).
  continuous  ContinuousEngine with 2 slots: shorts join at the next
              step boundary and leave after s joint steps.

Reported per engine: mean short-request completion latency (submit ->
result) and the makespan (all requests done).  The continuous engine
trades some long-request latency (every joint step pays the batched
program) for bounded short-request latency; the CSV rows make that
trade-off measurable instead of asserted.

``--preset tiny`` shrinks to CPU-smoke shapes (used by
``tests/test_benchmarks_suite.py``); ``full`` uses a mid-size DiT on the
real chip (the flagship model's latency shape, minutes-cheap).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from utils import generate_csv_dict, report


def _build(preset):
    from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
    from fairygen_tpu.models.wan.vae import WanVAEConfig
    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline

    if preset == "tiny":
        cfg = WanDiTConfig(
            dim=96, in_dim=16, ffn_dim=192, out_dim=16, text_dim=64,
            freq_dim=32, patch_size=(1, 2, 2), num_heads=4, num_layers=2)
        shape = dict(height=32, width=32, num_frames=5)
        steps = dict(long=16, short=2, n_short=3)
        ctx_len = 16
    else:
        # mid-size: flagship 480p token count, 1/3 depth, half width — the
        # scheduling behavior of a ~minute clip at ~seconds cost
        cfg = WanDiTConfig(
            dim=1536, in_dim=16, ffn_dim=7168, out_dim=16, text_dim=4096,
            freq_dim=256, patch_size=(1, 2, 2), num_heads=12, num_layers=10)
        shape = dict(height=480, width=832, num_frames=21)
        steps = dict(long=32, short=4, n_short=3)
        ctx_len = 512

    dtype = jnp.bfloat16 if preset != "tiny" else jnp.float32
    shapes = jax.eval_shape(
        lambda: init_dit_params(jax.random.key(0), cfg, dtype=dtype))
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
    pipe = WanVideoPipeline(dit_params=params, dit_cfg=cfg,
                            vae_cfg=WanVAEConfig.wan21_16(), dtype=dtype)
    ctx = jnp.zeros((1, ctx_len, cfg.text_dim), dtype)
    return pipe, ctx, shape, steps


def _build_flux(preset):
    from fairygen_tpu.models.flux.dit import (
        FluxDiTConfig, init_flux_dit_params)
    from fairygen_tpu.pipelines.flux_image import FluxImagePipeline

    if preset == "tiny":
        cfg = FluxDiTConfig.tiny()
        shape = dict(height=64, width=64)
        steps = dict(long=16, short=2, n_short=3)
        lt = 11
    else:
        # mid-size: flagship 1024px token grid (4096 packed tokens),
        # half width / ~1/3 depth — dev-vs-schnell scheduling at
        # seconds-cost (same scaling idea as the Wan mid-size build)
        cfg = FluxDiTConfig(dim=1536, num_heads=12,
                            num_double_blocks=6, num_single_blocks=12)
        shape = dict(height=1024, width=1024)
        steps = dict(long=50, short=4, n_short=3)
        lt = 512

    dtype = jnp.bfloat16 if preset != "tiny" else jnp.float32
    shapes = jax.eval_shape(
        lambda: init_flux_dit_params(jax.random.key(0), cfg, dtype=dtype))
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()
    pipe = FluxImagePipeline(dit_params=params, dit_cfg=cfg, dtype=dtype)
    emb = jnp.zeros((1, lt, cfg.context_dim), dtype)
    pooled = jnp.zeros((1, cfg.pooled_dim), dtype)
    return pipe, (emb, pooled), shape, steps


def bench_flux_fifo(pipe, embs, shape, steps):
    from fairygen_tpu.serving import BatchingEngine
    from utils import sync

    emb, pooled = embs

    def gen(prompts, **params):
        return [pipe(prompt_emb=emb, pooled_prompt_emb=pooled, seed=0,
                     num_inference_steps=params["num_inference_steps"],
                     embedded_guidance=params.get("embedded_guidance", 3.5),
                     output_type="latent", **shape)
                for _ in prompts]

    eng = BatchingEngine(gen, max_batch=1, max_wait_ms=1)
    try:
        sync(eng.submit("w",
                        num_inference_steps=steps["long"]).wait(timeout=3600))
        sync(eng.submit("w",
                        num_inference_steps=steps["short"]).wait(timeout=3600))
        return _submit_all(
            lambda context=None, **p: eng.submit("x", **p), None, shape,
            steps)
    finally:
        eng.shutdown()


def bench_flux_continuous(pipe, embs, shape, steps):
    from fairygen_tpu.serving import ContinuousEngine, FluxSlotStepper
    from utils import sync

    emb, pooled = embs
    eng = ContinuousEngine(
        FluxSlotStepper(pipe, **shape), num_slots=2)
    try:
        def submit(context=None, **p):
            return eng.submit(prompt_emb=emb, pooled_prompt_emb=pooled,
                              seed=0, output_type="latent", **p)

        # warm every occupancy level (see bench_continuous)
        w1 = submit(num_inference_steps=8)
        w2 = submit(num_inference_steps=3)
        sync(w2.wait(timeout=3600))
        sync(w1.wait(timeout=3600))
        return _submit_all(submit, None, shape, steps)
    finally:
        eng.shutdown()


def _submit_all(submit, ctx, shape_kw, steps):
    """Submit 1 long + n_short shorts; returns ([short latencies], makespan).

    Latency clock starts at each request's OWN submit time and stops when
    the result MATERIALIZES (the axon queue is async — wait() alone
    returns at dispatch, not execution; see utils.sync)."""
    from utils import sync

    t0 = time.perf_counter()
    long_req = submit(num_inference_steps=steps["long"], context=ctx)
    time.sleep(0.05)  # the long request is in flight before shorts arrive
    shorts, sub_t = [], []
    for _ in range(steps["n_short"]):
        sub_t.append(time.perf_counter())
        shorts.append(submit(num_inference_steps=steps["short"], context=ctx))
    lats = []
    for r, ts in zip(shorts, sub_t):
        sync(r.wait(timeout=3600))
        lats.append(time.perf_counter() - ts)
    sync(long_req.wait(timeout=3600))
    return lats, time.perf_counter() - t0


def bench_fifo(pipe, ctx, shape, steps):
    from fairygen_tpu.serving import BatchingEngine

    def gen(prompts, **params):
        # ctx rides the closure: engine signatures hash request params
        return [pipe(context=ctx, cfg_scale=1.0, seed=0,
                     num_inference_steps=params["num_inference_steps"],
                     output_type="latents", **shape)
                for _ in prompts]

    from utils import sync

    eng = BatchingEngine(gen, max_batch=1, max_wait_ms=1)
    try:
        # warm-up: compile both step counts, drain the device queue
        sync(eng.submit("w",
                        num_inference_steps=steps["long"]).wait(timeout=3600))
        sync(eng.submit("w",
                        num_inference_steps=steps["short"]).wait(timeout=3600))
        return _submit_all(
            lambda context=None, **p: eng.submit("x", **p), ctx, shape,
            steps)
    finally:
        eng.shutdown()


def bench_continuous(pipe, ctx, shape, steps):
    from fairygen_tpu.serving import ContinuousEngine, WanSlotStepper

    eng = ContinuousEngine(
        WanSlotStepper(pipe, **shape), num_slots=2)
    try:
        from utils import sync

        def submit(**p):
            return eng.submit(cfg_scale=1.0, seed=0, output_type="latents",
                              **p)

        # warm EVERY occupancy level the scenario will hit: two staggered
        # requests compile the B=2 joint-step program + its cross-kv, and
        # the longer one finishes alone, compiling the B=1 pair — all
        # outside the timed window
        w1 = submit(num_inference_steps=8, context=ctx)
        w2 = submit(num_inference_steps=3, context=ctx)
        sync(w2.wait(timeout=3600))
        sync(w1.wait(timeout=3600))
        return _submit_all(submit, ctx, shape, steps)
    finally:
        eng.shutdown()


def run(args):
    if getattr(args, "family", "wan") == "flux":
        pipe, ctx, shape, steps = _build_flux(args.preset)
        cfg_str = (f"long{steps['long']}/short{steps['short']}"
                   f"x{steps['n_short']}@{shape['height']}x"
                   f"{shape['width']}")
        benches = (("FluxServing-fifo", bench_flux_fifo),
                   ("FluxServing-continuous", bench_flux_continuous))
    else:
        pipe, ctx, shape, steps = _build(args.preset)
        cfg_str = (f"long{steps['long']}/short{steps['short']}"
                   f"x{steps['n_short']}@{shape['height']}x"
                   f"{shape['width']}x{shape['num_frames']}f")
        benches = (("WanServing-fifo", bench_fifo),
                   ("WanServing-continuous", bench_continuous))

    rows = []
    for name, fn in benches:
        lats, makespan = fn(pipe, ctx, shape, steps)
        short_mean = float(np.mean(lats))
        print(f"{name}: short latencies "
              f"{[round(x, 3) for x in sorted(lats)]} s, "
              f"makespan {makespan:.3f} s", flush=True)
        rows.append(generate_csv_dict(
            name, cfg_str, batch_size=2 if "continuous" in name else 1,
            num_inference_steps=steps["short"], total_secs=short_mean))
        # makespan as its own row so the fairness/throughput trade-off is
        # visible in the same table
        rows.append(generate_csv_dict(
            name + "-makespan", cfg_str,
            batch_size=2 if "continuous" in name else 1,
            num_inference_steps=steps["long"], total_secs=makespan))
    report(rows, args.csv)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=("tiny", "full"), default="full")
    p.add_argument("--family", choices=("wan", "flux"), default="wan",
                   help="flux = the t2i scenario (one 50-step dev render "
                        "+ 4-step schnell-class previews; VERDICT r4 #6)")
    p.add_argument("--csv", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=1,
                   help="accepted for run_all.py uniformity; the scenario "
                        "fixes its own request mix")
    run(p.parse_args())


if __name__ == "__main__":
    main()
