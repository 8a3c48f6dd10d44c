"""Step-level continuous batching (serving/continuous.py).

Validates the three load-bearing properties of the slot engine:

  1. **Exactness** — a slot's trajectory equals a dedicated
     ``WanVideoPipeline`` run (same seed/steps/cfg), even while sharing
     the batch with requests on different schedules.
  2. **Per-slot schedules** — slots advance on their own step counts /
     sigma tables / CFG scales inside one batched program.
  3. **Step-boundary admission** — a short request admitted after a long
     one finishes first (no head-of-line blocking), the property the
     request-level BatchingEngine cannot provide.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
from fairygen_tpu.models.wan.vae import WanVAEConfig
from fairygen_tpu.pipelines.wan_video import WanVideoPipeline
from fairygen_tpu.serving.continuous import ContinuousEngine, WanSlotStepper

CFG = WanDiTConfig(
    dim=96, in_dim=16, ffn_dim=128, out_dim=16, text_dim=32, freq_dim=32,
    patch_size=(1, 2, 2), num_heads=4, num_layers=2)
H = W = 32
F = 5
CTX_LEN = 7


def _mk_pipe():
    return WanVideoPipeline(
        dit_params=init_dit_params(jax.random.key(0), CFG), dit_cfg=CFG,
        vae_cfg=WanVAEConfig.wan21_16(), dtype=jnp.float32)


def _ctx(seed):
    return jax.random.normal(jax.random.key(seed), (1, CTX_LEN, 32),
                             jnp.float32)


def test_slots_match_dedicated_pipeline_runs():
    """Requests with different steps/cfg/seeds share the batch yet each
    reproduces its dedicated single-request pipeline run."""
    pipe = _mk_pipe()
    eng = ContinuousEngine(WanSlotStepper(
        pipe, height=H, width=W, num_frames=F), num_slots=2)
    ctx_a, ctx_b, nctx = _ctx(1), _ctx(2), _ctx(3)
    try:
        r_a = eng.submit(context=ctx_a, negative_context=nctx, seed=11,
                         num_inference_steps=3, cfg_scale=4.0,
                         output_type="latents")
        r_b = eng.submit(context=ctx_b, seed=22, num_inference_steps=5,
                         cfg_scale=1.0, sigma_shift=3.0,
                         output_type="latents")
        out_a = np.asarray(r_a.wait(timeout=300))
        out_b = np.asarray(r_b.wait(timeout=300))
        stats = eng.stats()
    finally:
        eng.shutdown()

    want_a = np.asarray(pipe(
        context=ctx_a, negative_context=nctx, seed=11, height=H, width=W,
        num_frames=F, num_inference_steps=3, cfg_scale=4.0,
        output_type="latents"))
    want_b = np.asarray(pipe(
        context=ctx_b, seed=22, height=H, width=W, num_frames=F,
        num_inference_steps=5, cfg_scale=1.0, sigma_shift=3.0,
        output_type="latents"))
    np.testing.assert_allclose(out_a, want_a, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(out_b, want_b, atol=2e-4, rtol=1e-4)
    # the two trajectories genuinely differ (different seeds/schedules)
    assert np.abs(want_a - want_b).max() > 1e-3
    # both requests rode shared steps: fewer total steps than sequential
    assert stats["steps"] < 3 + 5
    assert stats["mean_occupancy"] > 1.0


def test_short_request_is_not_blocked_by_long_one():
    """A 2-step request admitted behind a 12-step request completes while
    the long one is still denoising — the continuous-batching property."""
    pipe = _mk_pipe()
    eng = ContinuousEngine(WanSlotStepper(
        pipe, height=H, width=W, num_frames=F), num_slots=2)
    try:
        r_long = eng.submit(context=_ctx(1), seed=0, num_inference_steps=12,
                            cfg_scale=1.0, output_type="latents")
        r_short = eng.submit(context=_ctx(2), seed=1, num_inference_steps=2,
                             cfg_scale=1.0, output_type="latents")
        r_short.wait(timeout=300)
        assert not r_long._done.is_set(), (
            "short request should finish ~10 steps before the long one")
        assert 0.0 < r_long.progress < 1.0
        r_long.wait(timeout=300)
    finally:
        eng.shutdown()


def test_sync_decode_mode_matches_async():
    """decode_async=False (inline decode on the scheduler thread, the
    pre-round-4 behavior) stays available and bit-matches the default
    decode-thread path — with a real (tiny) VAE so the worker thread
    actually runs the decode, not just the handoff."""
    from fairygen_tpu.models.wan.vae import init_vae_params

    vcfg = WanVAEConfig.tiny()
    dcfg = WanDiTConfig(
        dim=96, in_dim=vcfg.z_dim, ffn_dim=128, out_dim=vcfg.z_dim,
        text_dim=32, freq_dim=32, patch_size=(1, 2, 2), num_heads=4,
        num_layers=2)
    pipe = WanVideoPipeline(
        dit_params=init_dit_params(jax.random.key(0), dcfg), dit_cfg=dcfg,
        vae_params=init_vae_params(vcfg), vae_cfg=vcfg, dtype=jnp.float32)
    outs = {}
    for mode in (True, False):
        eng = ContinuousEngine(WanSlotStepper(
            pipe, height=H, width=W, num_frames=F), num_slots=2,
            decode_async=mode)
        try:
            r = eng.submit(context=_ctx(4), seed=5, num_inference_steps=2,
                           cfg_scale=1.0, output_type="floatpoint")
            outs[mode] = np.asarray(r.wait(timeout=300))
            assert eng.stats()["completed"] == 1
        finally:
            eng.shutdown()
    assert outs[True].shape[-3:] == (F, H, W), outs[True].shape
    np.testing.assert_array_equal(outs[True], outs[False])


def test_admission_beyond_capacity_queues_and_errors_surface():
    """Requests beyond num_slots queue for the next free slot; a bad
    request errors without poisoning its neighbours."""
    pipe = _mk_pipe()
    eng = ContinuousEngine(WanSlotStepper(
        pipe, height=H, width=W, num_frames=F), num_slots=2)
    try:
        good = [eng.submit(context=_ctx(i), seed=i, num_inference_steps=2,
                           cfg_scale=1.0, output_type="latents")
                for i in range(3)]
        bad = eng.submit(context=jnp.zeros((1, CTX_LEN + 3, 32)), seed=9,
                         num_inference_steps=2, cfg_scale=1.0,
                         output_type="latents")
        outs = [np.asarray(r.wait(timeout=300)) for r in good]
        with pytest.raises(RuntimeError, match="context length"):
            bad.wait(timeout=300)
    finally:
        eng.shutdown()
    # queued request matches its dedicated run too
    want = np.asarray(pipe(
        context=_ctx(2), seed=2, height=H, width=W, num_frames=F,
        num_inference_steps=2, cfg_scale=1.0, output_type="latents"))
    np.testing.assert_allclose(outs[2], want, atol=2e-4, rtol=1e-4)


def test_slot_parallel_mesh_matches_single_device():
    """Slot-parallel serving: the slot batch rides the mesh 'data' axis
    (weights replicated, one slot per device group) and every request
    still matches its dedicated single-device pipeline run."""
    from fairygen_tpu.core.meshes import make_mesh

    mesh = make_mesh(data=2, devices=jax.devices()[:2])
    pipe = _mk_pipe()
    # one slot rides a hot LoRA: covers the fixed-path per-slot adapter
    # selection (idle/no-adapter slots gather the identity row)
    sd_x = _mk_lora_sd(5, rank=2, targets={
        "blocks.0.self_attn.q": (96, 96), "blocks.1.ffn.2": (128, 96)})
    eng = ContinuousEngine(WanSlotStepper(
        pipe, height=H, width=W, num_frames=F, slot_mesh=mesh,
        loras={"x": sd_x}), num_slots=2)
    ctx_a, ctx_b, nctx = _ctx(1), _ctx(2), _ctx(3)
    try:
        r_a = eng.submit(context=ctx_a, negative_context=nctx, seed=11,
                         num_inference_steps=3, cfg_scale=4.0,
                         output_type="latents", lora="x")
        r_b = eng.submit(context=ctx_b, seed=22, num_inference_steps=5,
                         cfg_scale=1.0, sigma_shift=3.0,
                         output_type="latents")
        out_a = np.asarray(r_a.wait(timeout=300))
        out_b = np.asarray(r_b.wait(timeout=300))
    finally:
        eng.shutdown()

    from fairygen_tpu.models.adapters import hot_lora_into_wan_dit

    pipe_x = WanVideoPipeline(
        dit_params=hot_lora_into_wan_dit(pipe.dit_params, sd_x)[0],
        dit_cfg=CFG, vae_cfg=WanVAEConfig.wan21_16(), dtype=jnp.float32)
    want_a = np.asarray(pipe_x(
        context=ctx_a, negative_context=nctx, seed=11, height=H, width=W,
        num_frames=F, num_inference_steps=3, cfg_scale=4.0,
        output_type="latents"))
    want_b = np.asarray(pipe(
        context=ctx_b, seed=22, height=H, width=W, num_frames=F,
        num_inference_steps=5, cfg_scale=1.0, sigma_shift=3.0,
        output_type="latents"))
    np.testing.assert_allclose(out_a, want_a, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(out_b, want_b, atol=2e-4, rtol=1e-4)


def _mk_lora_sd(seed, rank, targets):
    """Random torch-layout Wan-DiT LoRA: targets like 'blocks.0.self_attn.q'
    with (d_in, d_out) per target."""
    rs = np.random.RandomState(seed)
    sd = {}
    for t, (d_in, d_out) in targets.items():
        sd[f"{t}.lora_A.weight"] = (
            0.3 * rs.randn(rank, d_in)).astype(np.float32)
        sd[f"{t}.lora_B.weight"] = (
            0.3 * rs.randn(d_out, rank)).astype(np.float32)
    return sd


def test_per_slot_loras_match_dedicated_hot_lora_runs():
    """Two requests with DIFFERENT adapters (different ranks, different
    target sets) + one adapter-free request share the batch, and each
    matches its dedicated hot-LoRA pipeline run — the per-sample adapter
    gather (VERDICT round-3 item 6)."""
    from fairygen_tpu.models.adapters import hot_lora_into_wan_dit

    sd_x = _mk_lora_sd(5, rank=2, targets={
        "blocks.0.self_attn.q": (96, 96), "blocks.1.ffn.2": (128, 96)})
    sd_y = _mk_lora_sd(6, rank=3, targets={
        "blocks.1.cross_attn.v": (96, 96), "blocks.0.ffn.0": (96, 128)})
    pipe = _mk_pipe()
    eng = ContinuousEngine(WanSlotStepper(
        pipe, height=H, width=W, num_frames=F,
        loras={"x": sd_x, "y": sd_y}), num_slots=3)
    ctx_a, ctx_b, ctx_c, nctx = _ctx(1), _ctx(2), _ctx(4), _ctx(3)
    try:
        r_a = eng.submit(context=ctx_a, negative_context=nctx, seed=11,
                         num_inference_steps=3, cfg_scale=4.0,
                         output_type="latents", lora="x")
        r_b = eng.submit(context=ctx_b, seed=22, num_inference_steps=5,
                         cfg_scale=1.0, output_type="latents", lora="y")
        r_c = eng.submit(context=ctx_c, seed=33, num_inference_steps=4,
                         cfg_scale=1.0, output_type="latents")
        bad = eng.submit(context=_ctx(9), seed=1, num_inference_steps=2,
                         output_type="latents", lora="nope")
        out_a = np.asarray(r_a.wait(timeout=300))
        out_b = np.asarray(r_b.wait(timeout=300))
        out_c = np.asarray(r_c.wait(timeout=300))
        with pytest.raises(RuntimeError, match="unknown hot LoRA"):
            bad.wait(timeout=300)
        stats = eng.stats()
    finally:
        eng.shutdown()

    def dedicated(sd, ctx, **kw):
        params = (hot_lora_into_wan_dit(pipe.dit_params, sd)[0]
                  if sd is not None else pipe.dit_params)
        p = WanVideoPipeline(dit_params=params, dit_cfg=CFG,
                             vae_cfg=WanVAEConfig.wan21_16(),
                             dtype=jnp.float32)
        return np.asarray(p(context=ctx, height=H, width=W, num_frames=F,
                            output_type="latents", **kw))

    want_a = dedicated(sd_x, ctx_a, negative_context=nctx, seed=11,
                       num_inference_steps=3, cfg_scale=4.0)
    want_b = dedicated(sd_y, ctx_b, seed=22, num_inference_steps=5,
                       cfg_scale=1.0)
    want_c = dedicated(None, ctx_c, seed=33, num_inference_steps=4,
                       cfg_scale=1.0)
    np.testing.assert_allclose(out_a, want_a, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(out_b, want_b, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(out_c, want_c, atol=2e-4, rtol=1e-4)
    # the adapters actually changed the outputs (the test is not vacuous)
    assert np.abs(want_a - dedicated(None, ctx_a, negative_context=nctx,
                                     seed=11, num_inference_steps=3,
                                     cfg_scale=4.0)).max() > 1e-3
    assert np.abs(want_b - want_c).max() > 1e-3
    # mixed-adapter requests genuinely shared batched steps
    assert stats["mean_occupancy"] > 1.0


def test_stepper_rejects_unsupported_pipelines():
    pipe = _mk_pipe()
    pipe.dit2_params = pipe.dit_params
    with pytest.raises(ValueError, match="single-expert"):
        WanSlotStepper(pipe, height=H, width=W, num_frames=F)

    import dataclasses
    i2v = _mk_pipe()
    i2v.dit_cfg = dataclasses.replace(CFG, has_image_input=True)
    with pytest.raises(ValueError, match="t2v"):
        WanSlotStepper(i2v, height=H, width=W, num_frames=F)


def test_refilled_slot_uses_its_own_context():
    """A slot freed and refilled while its neighbour stays active keeps
    the slot-index tuple unchanged — the new occupant must still step
    with ITS context (regression: the compact cache was keyed by slot
    indices only and served the previous occupant's context)."""
    pipe = _mk_pipe()
    eng = ContinuousEngine(WanSlotStepper(
        pipe, height=H, width=W, num_frames=F), num_slots=2)
    try:
        r_long = eng.submit(context=_ctx(1), seed=0, num_inference_steps=8,
                            cfg_scale=1.0, output_type="latents")
        r_s1 = eng.submit(context=_ctx(2), seed=1, num_inference_steps=2,
                          cfg_scale=1.0, output_type="latents")
        r_s2 = eng.submit(context=_ctx(3), seed=2, num_inference_steps=2,
                          cfg_scale=1.0, output_type="latents")
        outs = [np.asarray(r.wait(timeout=300))
                for r in (r_long, r_s1, r_s2)]
    finally:
        eng.shutdown()
    for out, (c, seed, n) in zip(outs, ((1, 0, 8), (2, 1, 2), (3, 2, 2))):
        want = np.asarray(pipe(
            context=_ctx(c), seed=seed, height=H, width=W, num_frames=F,
            num_inference_steps=n, cfg_scale=1.0, output_type="latents"))
        np.testing.assert_allclose(out, want, atol=2e-4, rtol=1e-4)


def test_zero_step_request_errors_without_killing_the_scheduler():
    """num_inference_steps=0 must surface as a per-request error (it used
    to ZeroDivisionError the scheduler thread, hanging every request)."""
    pipe = _mk_pipe()
    eng = ContinuousEngine(WanSlotStepper(
        pipe, height=H, width=W, num_frames=F), num_slots=2)
    try:
        bad = eng.submit(context=_ctx(1), num_inference_steps=0,
                         cfg_scale=1.0, output_type="latents")
        with pytest.raises(RuntimeError, match="num_inference_steps"):
            bad.wait(timeout=60)
        ok = eng.submit(context=_ctx(2), seed=5, num_inference_steps=2,
                        cfg_scale=1.0, output_type="latents")
        out = np.asarray(ok.wait(timeout=300))  # engine still serves
    finally:
        eng.shutdown()
    assert out.shape == (1, 16, 2, 4, 4)


def test_slot_parallel_rejects_indivisible_num_slots():
    from fairygen_tpu.core.meshes import make_mesh

    mesh = make_mesh(data=2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="multiple of the mesh"):
        ContinuousEngine(WanSlotStepper(
            pipe=_mk_pipe(), height=H, width=W, num_frames=F,
            slot_mesh=mesh), num_slots=3)


def test_continuous_engine_behind_http_server():
    """ContinuousEngine is a drop-in engine for InferenceServer: the async
    flow (POST async -> poll /status -> GET /result) works unchanged."""
    import json
    import time
    import urllib.request

    from fairygen_tpu.serving import InferenceServer

    class PromptedPipe(WanVideoPipeline):
        # deterministic stand-in for the UMT5 stack: context from the
        # prompt text, so the real prompt-encode admission path runs
        def encode_prompt(self, prompt):
            return _ctx(len(prompt))

    pipe = PromptedPipe(
        dit_params=init_dit_params(jax.random.key(0), CFG), dit_cfg=CFG,
        vae_cfg=WanVAEConfig.wan21_16(), dtype=jnp.float32)
    pipe.tokenizer = object()  # encode_prompt above never touches it

    eng = ContinuousEngine(
        WanSlotStepper(pipe, height=H, width=W, num_frames=F), num_slots=2,
        default_params={"negative_prompt": "bad quality"})

    def encode(r):
        a = np.asarray(r)
        return {"shape": list(a.shape), "mean": float(a.mean())}

    srv = InferenceServer(eng, port=0, encode_result=encode).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        body = json.dumps({
            "prompt": "a pig", "async": True,
            "params": {"num_inference_steps": 3, "cfg_scale": 4.0,
                       "output_type": "latents"}}).encode()
        post = urllib.request.Request(
            base + "/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(post, timeout=10) as r:
            rid = json.load(r)["id"]
        deadline = time.monotonic() + 120
        status = {}
        while time.monotonic() < deadline:
            with urllib.request.urlopen(f"{base}/status/{rid}",
                                        timeout=10) as r:
                status = json.load(r)
            if status["done"]:
                break
            time.sleep(0.05)
        assert status["done"] and status["error"] is None
        with urllib.request.urlopen(f"{base}/result/{rid}", timeout=10) as r:
            result = json.load(r)["result"]
        assert result["shape"] == [1, 16, 2, 4, 4]
    finally:
        srv.stop()

    # the served request matches the dedicated pipeline run
    want = np.asarray(pipe(
        context=_ctx(len("a pig")),
        negative_context=_ctx(len("bad quality")), seed=0, height=H,
        width=W, num_frames=F, num_inference_steps=3, cfg_scale=4.0,
        output_type="latents"))
    assert result["mean"] == pytest.approx(float(want.mean()), abs=1e-4)
