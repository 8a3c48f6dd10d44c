"""FLUX slot stepper for the continuous-batching engine (serving/t2i_slots.py).

Mirrors test_continuous_batching.py's exactness contract on the t2i side:
a slot's trajectory must equal a dedicated ``FluxImagePipeline`` run (same
seed/steps/guidance) even while sharing the batch with requests on
different schedules — the few-step-Turbo-behind-50-step-dev mixing case
the stepper exists for.  Uses the committed flux_pipeline goldens' tiny
converted weights so the decode tail is exercised with a real VAE.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fairygen_tpu.models.flux.dit import FluxDiTConfig, init_flux_dit_params
from fairygen_tpu.models.flux.vae import (
    AutoencoderKLConfig,
    convert_flux_vae_state_dict,
)
from fairygen_tpu.pipelines.flux_image import FluxImagePipeline
from fairygen_tpu.serving import ContinuousEngine, FluxSlotStepper

DIT_CFG = FluxDiTConfig.tiny()
H, W = 64, 96
LT = 11


def _mk_pipe(vae=False):
    pipe = FluxImagePipeline(
        dit_params=init_flux_dit_params(jax.random.key(0), DIT_CFG),
        dit_cfg=DIT_CFG, dtype=jnp.float32)
    if vae:
        g = np.load("tests/goldens/flux_pipeline.npz")
        vae_cfg = AutoencoderKLConfig(
            latent_channels=4, block_out_channels=(8, 16, 32, 32),
            norm_num_groups=4, scaling_factor=0.3611, shift_factor=0.1159,
            use_quant_conv=False)
        sd = {k[4:]: g[k] for k in g.files if k.startswith("vae.")}
        enc = np.load("tests/goldens/flux_vae.npz")
        sd.update({k[3:]: enc[k] for k in enc.files
                   if k.startswith("sd.encoder.")})
        pipe.vae_params = convert_flux_vae_state_dict(sd, vae_cfg)
        pipe.vae_cfg = vae_cfg
    return pipe


def _emb(seed):
    k1, k2 = jax.random.split(jax.random.key(seed))
    return (jax.random.normal(k1, (1, LT, DIT_CFG.context_dim), jnp.float32),
            jax.random.normal(k2, (1, DIT_CFG.pooled_dim), jnp.float32))


def test_flux_slots_match_dedicated_pipeline_runs():
    """A 3-step high-guidance request and a 7-step guidance-1 request share
    the batch yet each reproduces its dedicated pipeline run (latents)."""
    pipe = _mk_pipe()
    eng = ContinuousEngine(FluxSlotStepper(pipe, height=H, width=W),
                           num_slots=2)
    (pa, ppa), (pb, ppb) = _emb(1), _emb(2)
    try:
        r_a = eng.submit(prompt_emb=pa, pooled_prompt_emb=ppa, seed=11,
                         num_inference_steps=3, embedded_guidance=3.5,
                         output_type="latent")
        r_b = eng.submit(prompt_emb=pb, pooled_prompt_emb=ppb, seed=22,
                         num_inference_steps=7, embedded_guidance=1.0,
                         sigma_shift=6.0, output_type="latent")
        out_a = np.asarray(r_a.wait(timeout=300))
        out_b = np.asarray(r_b.wait(timeout=300))
        stats = eng.stats()
    finally:
        eng.shutdown()

    # zc falls back to in_dim // 4 with no VAE loaded (both sides)
    want_a = np.asarray(pipe(
        prompt_emb=pa, pooled_prompt_emb=ppa, seed=11, height=H, width=W,
        num_inference_steps=3, embedded_guidance=3.5, output_type="latent"))
    want_b = np.asarray(pipe(
        prompt_emb=pb, pooled_prompt_emb=ppb, seed=22, height=H, width=W,
        num_inference_steps=7, embedded_guidance=1.0, sigma_shift=6.0,
        output_type="latent"))
    np.testing.assert_allclose(out_a, want_a, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(out_b, want_b, atol=2e-4, rtol=1e-4)
    assert np.abs(want_a - want_b).max() > 1e-3
    # the requests overlapped: fewer engine ticks than sequential steps
    assert stats["steps"] < 3 + 7
    assert stats["mean_occupancy"] > 1.0


@pytest.mark.slow
def test_flux_slot_decode_matches_pipeline():
    """output_type='np' runs the same fp32 VAE decode tail as the
    dedicated pipeline (goldens' converted tiny VAE)."""
    pipe = _mk_pipe(vae=True)
    eng = ContinuousEngine(FluxSlotStepper(pipe, height=H, width=W),
                           num_slots=2)
    pa, ppa = _emb(3)
    try:
        r = eng.submit(prompt_emb=pa, pooled_prompt_emb=ppa, seed=5,
                       num_inference_steps=2, embedded_guidance=2.0,
                       output_type="np")
        out = np.asarray(r.wait(timeout=300))
    finally:
        eng.shutdown()
    want = np.asarray(pipe(
        prompt_emb=pa, pooled_prompt_emb=ppa, seed=5, height=H, width=W,
        num_inference_steps=2, embedded_guidance=2.0, output_type="np"))
    # uint8 images: identical up to the decode's last-bit rounding
    assert out.shape == want.shape and out.dtype == want.dtype
    assert np.mean(np.abs(out.astype(np.int16) - want.astype(np.int16))) \
        < 0.05


def test_flux_slot_parallel_mesh_matches_single_device():
    """Fixed-mode (mesh) slot serving: the packed pooled-row transport and
    per-slot guidance survive the data-axis sharded batch."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("data",))
    pipe = _mk_pipe()
    eng = ContinuousEngine(
        FluxSlotStepper(pipe, height=H, width=W, slot_mesh=mesh),
        num_slots=2)
    (pa, ppa), (pb, ppb) = _emb(4), _emb(5)
    try:
        r_a = eng.submit(prompt_emb=pa, pooled_prompt_emb=ppa, seed=7,
                         num_inference_steps=2, embedded_guidance=4.0,
                         output_type="latent")
        r_b = eng.submit(prompt_emb=pb, pooled_prompt_emb=ppb, seed=8,
                         num_inference_steps=4, embedded_guidance=1.0,
                         output_type="latent")
        out_a = np.asarray(r_a.wait(timeout=300))
        out_b = np.asarray(r_b.wait(timeout=300))
    finally:
        eng.shutdown()
    want_a = np.asarray(pipe(
        prompt_emb=pa, pooled_prompt_emb=ppa, seed=7, height=H, width=W,
        num_inference_steps=2, embedded_guidance=4.0, output_type="latent"))
    want_b = np.asarray(pipe(
        prompt_emb=pb, pooled_prompt_emb=ppb, seed=8, height=H, width=W,
        num_inference_steps=4, embedded_guidance=1.0, output_type="latent"))
    np.testing.assert_allclose(out_a, want_a, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(out_b, want_b, atol=2e-4, rtol=1e-4)


def test_flux_stepper_rejects_bad_buckets():
    pipe = _mk_pipe()
    with pytest.raises(ValueError, match="/16"):
        FluxSlotStepper(pipe, height=60, width=W)
    st = FluxSlotStepper(pipe, height=H, width=W)
    pa, ppa = _emb(6)
    st.prepare(prompt_emb=pa, pooled_prompt_emb=ppa)  # locks LT
    long_emb = jnp.zeros((1, LT + 4, DIT_CFG.context_dim), jnp.float32)
    with pytest.raises(ValueError, match="context length"):
        st.prepare(prompt_emb=long_emb, pooled_prompt_emb=ppa)
    with pytest.raises(ValueError, match="num_inference_steps"):
        st.prepare(prompt_emb=pa, pooled_prompt_emb=ppa,
                   num_inference_steps=0)


def _mk_flux_lora(seed, cfg, rank=3):
    """Reference-layout FLUX LoRA dict touching double qkv/ff and the
    single-block fused projection (the layers the encoder/patcher dim
    tables name, lora_runtime.DOUBLE/SINGLE_LORA_DIMS)."""
    from fairygen_tpu.models.flux.lora_runtime import (
        DOUBLE_LORA_DIMS, SINGLE_LORA_DIMS, _scaled_dims)

    rng = np.random.default_rng(seed)
    sd = {}

    def put(prefix, n_blocks, dims, suffixes):
        for i in range(n_blocks):
            for sfx in suffixes:
                din, dout = dims[sfx]
                sd[f"{prefix}.{i}.{sfx}.lora_A.weight"] = (
                    rng.normal(size=(rank, din)).astype(np.float32) * 0.05)
                sd[f"{prefix}.{i}.{sfx}.lora_B.weight"] = (
                    rng.normal(size=(dout, rank)).astype(np.float32) * 0.05)

    put("blocks", cfg.num_double_blocks, _scaled_dims(DOUBLE_LORA_DIMS, cfg),
        ("attn.a_to_qkv", "ff_a.0"))
    put("single_blocks", cfg.num_single_blocks,
        _scaled_dims(SINGLE_LORA_DIMS, cfg), ("to_qkv_mlp",))
    return sd


@pytest.mark.slow
def test_flux_slots_per_slot_hot_lora_matches_fused():
    """Mixed-adapter t2i traffic in ONE batched step: requests with
    different hot LoRAs (and none) share the engine, and each reproduces
    a dedicated pipeline with that LoRA FUSED into the weights — the
    FLUX analogue of the Wan engine's per-slot stack (VERDICT r4 #6)."""
    pipe = _mk_pipe()
    sd1, sd2 = _mk_flux_lora(21, DIT_CFG), _mk_flux_lora(22, DIT_CFG)
    eng = ContinuousEngine(
        FluxSlotStepper(pipe, height=H, width=W,
                        loras={"s1": sd1, "s2": sd2}),
        num_slots=2)
    (pa, ppa), (pb, ppb), (pc, ppc) = _emb(31), _emb(32), _emb(33)
    try:
        r_a = eng.submit(prompt_emb=pa, pooled_prompt_emb=ppa, seed=11,
                         num_inference_steps=3, embedded_guidance=3.5,
                         lora="s1", output_type="latent")
        r_b = eng.submit(prompt_emb=pb, pooled_prompt_emb=ppb, seed=22,
                         num_inference_steps=4, embedded_guidance=1.0,
                         output_type="latent")
        r_c = eng.submit(prompt_emb=pc, pooled_prompt_emb=ppc, seed=33,
                         num_inference_steps=2, embedded_guidance=2.0,
                         lora="s2", output_type="latent")
        out_a = np.asarray(r_a.wait(timeout=600))
        out_b = np.asarray(r_b.wait(timeout=600))
        out_c = np.asarray(r_c.wait(timeout=600))
    finally:
        eng.shutdown()

    def hot_ref(sd, pe, ppe, seed, steps, g):
        # dedicated-pipeline reference: the request's LoRA loaded through
        # the golden-tested HOT runtime (load_hot_loras / hot_dense's
        # stacked-n path — a different application path than the
        # per-slot "As"/"Bs" gather under test)
        p2 = _mk_pipe()
        if sd is not None:
            p2.load_hot_loras([sd])
        return np.asarray(p2(
            prompt_emb=pe, pooled_prompt_emb=ppe, seed=seed, height=H,
            width=W, num_inference_steps=steps, embedded_guidance=g,
            output_type="latent"))

    want_a = hot_ref(sd1, pa, ppa, 11, 3, 3.5)
    want_b = hot_ref(None, pb, ppb, 22, 4, 1.0)
    want_c = hot_ref(sd2, pc, ppc, 33, 2, 2.0)
    np.testing.assert_allclose(out_a, want_a, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(out_b, want_b, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(out_c, want_c, atol=5e-4, rtol=1e-3)
    # the adapters actually did something
    assert np.abs(want_a - hot_ref(None, pa, ppa, 11, 3, 3.5)).max() > 1e-4


def test_flux_stepper_rejects_unknown_lora():
    pipe = _mk_pipe()
    st = FluxSlotStepper(pipe, height=H, width=W,
                         loras={"s1": _mk_flux_lora(5, DIT_CFG)})
    pa, ppa = _emb(7)
    with pytest.raises(ValueError, match="unknown hot LoRA"):
        st.prepare(prompt_emb=pa, pooled_prompt_emb=ppa, lora="nope")


def test_flux_slot_parallel_mesh_with_per_slot_lora():
    """Slot-parallel (mesh) mode composes with the per-slot hot-LoRA
    gather: mixed-adapter traffic on the data-sharded batch reproduces
    the dedicated hot-runtime runs."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("data",))
    pipe = _mk_pipe()
    sd1 = _mk_flux_lora(41, DIT_CFG)
    eng = ContinuousEngine(
        FluxSlotStepper(pipe, height=H, width=W, slot_mesh=mesh,
                        loras={"s1": sd1}),
        num_slots=2)
    (pa, ppa), (pb, ppb) = _emb(42), _emb(43)
    try:
        r_a = eng.submit(prompt_emb=pa, pooled_prompt_emb=ppa, seed=7,
                         num_inference_steps=2, embedded_guidance=4.0,
                         lora="s1", output_type="latent")
        r_b = eng.submit(prompt_emb=pb, pooled_prompt_emb=ppb, seed=8,
                         num_inference_steps=3, embedded_guidance=1.0,
                         output_type="latent")
        out_a = np.asarray(r_a.wait(timeout=600))
        out_b = np.asarray(r_b.wait(timeout=600))
    finally:
        eng.shutdown()

    p2 = _mk_pipe()
    p2.load_hot_loras([sd1])
    want_a = np.asarray(p2(
        prompt_emb=pa, pooled_prompt_emb=ppa, seed=7, height=H, width=W,
        num_inference_steps=2, embedded_guidance=4.0,
        output_type="latent"))
    want_b = np.asarray(pipe(
        prompt_emb=pb, pooled_prompt_emb=ppb, seed=8, height=H, width=W,
        num_inference_steps=3, embedded_guidance=1.0,
        output_type="latent"))
    np.testing.assert_allclose(out_a, want_a, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(out_b, want_b, atol=2e-4, rtol=1e-4)
