"""BucketRouter: one dispatch surface over per-shape slot engines
(VERDICT r4 #7 — closes the continuous.py scope note's IOU).

Mixed-shape traffic is the normal serving case; the compiled step
programs are shape-static by design, so the router owns one engine per
compile signature, lazily created and LRU-evicted (idle buckets only)
under a budget.  No reference analogue (the reference has no serving
layer)."""
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairygen_tpu.models.flux.dit import FluxDiTConfig, init_flux_dit_params
from fairygen_tpu.pipelines.flux_image import FluxImagePipeline
from fairygen_tpu.serving import (
    BucketRouter,
    ContinuousEngine,
    FluxSlotStepper,
    t2i_bucket_of,
    wan_bucket_of,
)

DIT_CFG = FluxDiTConfig.tiny()


def _mk_pipe():
    return FluxImagePipeline(
        dit_params=init_flux_dit_params(jax.random.key(0), DIT_CFG),
        dit_cfg=DIT_CFG, dtype=jnp.float32)


def _emb(seed, lt=11):
    k1, k2 = jax.random.split(jax.random.key(seed))
    return (jax.random.normal(k1, (1, lt, DIT_CFG.context_dim), jnp.float32),
            jax.random.normal(k2, (1, DIT_CFG.pooled_dim), jnp.float32))


def _router(pipe, max_buckets=2):
    def make_engine(key):
        h, w = key
        return ContinuousEngine(FluxSlotStepper(pipe, height=h, width=w),
                                num_slots=2)

    return BucketRouter(make_engine, bucket_of=t2i_bucket_of,
                        max_buckets=max_buckets)


def test_bucket_of_helpers():
    assert wan_bucket_of({"height": 720, "num_frames": 41}) == (720, 832, 41)
    assert wan_bucket_of({}) == (480, 832, 81)
    assert t2i_bucket_of({"width": 768}) == (1024, 768)


@pytest.mark.slow
def test_mixed_shape_traffic_one_endpoint():
    """Two shapes through ONE router surface: each request lands in its
    bucket's engine and reproduces the dedicated pipeline run."""
    pipe = _mk_pipe()
    router = _router(pipe)
    (pa, ppa), (pb, ppb) = _emb(1), _emb(2)
    try:
        r_a = router.submit(prompt_emb=pa, pooled_prompt_emb=ppa, seed=11,
                            height=64, width=96, num_inference_steps=2,
                            embedded_guidance=3.5, output_type="latent")
        r_b = router.submit(prompt_emb=pb, pooled_prompt_emb=ppb, seed=22,
                            height=64, width=64, num_inference_steps=3,
                            embedded_guidance=1.0, output_type="latent")
        out_a = np.asarray(r_a.wait(timeout=600))
        out_b = np.asarray(r_b.wait(timeout=600))
        # the router's get() resolves ids across buckets
        assert router.get(r_a.id) is r_a
        assert router.get(r_b.id) is r_b
        stats = router.stats()
    finally:
        router.shutdown()
    assert out_a.shape[-2:] == (64 // 8, 96 // 8)
    assert out_b.shape[-2:] == (64 // 8, 64 // 8)
    assert stats["buckets_created"] == 2
    assert set(stats["buckets"]) == {"64x96", "64x64"}

    want_a = np.asarray(pipe(
        prompt_emb=pa, pooled_prompt_emb=ppa, seed=11, height=64, width=96,
        num_inference_steps=2, embedded_guidance=3.5, output_type="latent"))
    want_b = np.asarray(pipe(
        prompt_emb=pb, pooled_prompt_emb=ppb, seed=22, height=64, width=64,
        num_inference_steps=3, embedded_guidance=1.0, output_type="latent"))
    np.testing.assert_allclose(out_a, want_a, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(out_b, want_b, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_lru_eviction_under_budget():
    """A third shape with max_buckets=2 evicts the least-recently-used
    IDLE bucket; same-shape resubmission reuses the surviving engine."""
    pipe = _mk_pipe()
    router = _router(pipe, max_buckets=2)
    (pa, ppa) = _emb(3)
    try:
        shapes = [(64, 96), (64, 64), (64, 32)]
        for h, w in shapes:
            r = router.submit(prompt_emb=pa, pooled_prompt_emb=ppa, seed=5,
                              height=h, width=w, num_inference_steps=1,
                              embedded_guidance=2.0, output_type="latent")
            assert np.asarray(r.wait(timeout=600)).shape[-1] == w // 8
        stats = router.stats()
        assert stats["buckets_created"] == 3
        assert stats["buckets_evicted"] == 1
        assert len(stats["buckets"]) == 2
        assert "64x96" not in stats["buckets"]  # LRU victim
        # resubmit to a surviving bucket: no new engine
        r = router.submit(prompt_emb=pa, pooled_prompt_emb=ppa, seed=6,
                          height=64, width=32, num_inference_steps=1,
                          embedded_guidance=2.0, output_type="latent")
        r.wait(timeout=600)
        assert router.stats()["buckets_created"] == 3
    finally:
        router.shutdown()


def test_router_rejects_after_shutdown_and_bad_budget():
    pipe = _mk_pipe()
    with pytest.raises(ValueError, match="max_buckets"):
        _router(pipe, max_buckets=0)
    router = _router(pipe)
    router.shutdown()
    pa, ppa = _emb(4)
    with pytest.raises(RuntimeError, match="shut down"):
        router.submit(prompt_emb=pa, pooled_prompt_emb=ppa,
                      height=64, width=64)


@pytest.mark.slow
def test_concurrent_submitters_share_one_engine():
    """Two threads racing to the same new bucket build ONE engine (the
    placeholder protocol), and both requests complete."""
    pipe = _mk_pipe()
    router = _router(pipe)
    (pa, ppa), (pb, ppb) = _emb(5), _emb(6)
    results = {}

    def go(name, pe, ppe, seed):
        r = router.submit(prompt_emb=pe, pooled_prompt_emb=ppe, seed=seed,
                          height=64, width=64, num_inference_steps=2,
                          embedded_guidance=2.0, output_type="latent")
        results[name] = np.asarray(r.wait(timeout=600))

    try:
        ts = [threading.Thread(target=go, args=("a", pa, ppa, 1)),
              threading.Thread(target=go, args=("b", pb, ppb, 2))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=600)
        assert router.stats()["buckets_created"] == 1
    finally:
        router.shutdown()
    assert results["a"].shape == results["b"].shape
    assert np.abs(results["a"] - results["b"]).max() > 1e-4


@pytest.mark.slow
def test_wan_mixed_shape_video_routing():
    """The router drives Wan slot engines too (serve_video
    --router_buckets): two (h, w, frames) shapes through one surface."""
    from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
    from fairygen_tpu.models.wan.vae import WanVAEConfig
    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline
    from fairygen_tpu.serving import WanSlotStepper, wan_bucket_of

    cfg = WanDiTConfig(
        dim=96, in_dim=16, ffn_dim=192, out_dim=16, text_dim=64,
        freq_dim=32, patch_size=(1, 2, 2), num_heads=4, num_layers=2)
    params = init_dit_params(jax.random.key(0), cfg)
    pipe = WanVideoPipeline(dit_params=params, dit_cfg=cfg,
                            vae_cfg=WanVAEConfig.wan21_16(),
                            dtype=jnp.float32)
    ctx = jax.random.normal(jax.random.key(1), (1, 6, 64), jnp.float32)

    def make_engine(key):
        h, w, f = key
        return ContinuousEngine(
            WanSlotStepper(pipe, height=h, width=w, num_frames=f),
            num_slots=2)

    router = BucketRouter(make_engine, bucket_of=wan_bucket_of,
                          max_buckets=2)
    try:
        r_a = router.submit(context=ctx, cfg_scale=1.0, seed=3,
                            height=32, width=32, num_frames=5,
                            num_inference_steps=2, output_type="latents")
        r_b = router.submit(context=ctx, cfg_scale=1.0, seed=4,
                            height=32, width=64, num_frames=5,
                            num_inference_steps=2, output_type="latents")
        out_a = np.asarray(r_a.wait(timeout=600))
        out_b = np.asarray(r_b.wait(timeout=600))
        stats = router.stats()
    finally:
        router.shutdown()
    # wan21_16 VAE: 8x spatial factor (patch_size=1)
    assert out_a.shape[-1] == 32 // 8 and out_b.shape[-1] == 64 // 8
    assert stats["buckets_created"] == 2

    want_a = np.asarray(pipe(context=ctx, cfg_scale=1.0, seed=3,
                             height=32, width=32, num_frames=5,
                             num_inference_steps=2,
                             output_type="latents"))
    np.testing.assert_allclose(out_a, want_a, atol=2e-4, rtol=1e-4)
