"""Step-level continuous batching for FLUX text-to-image serving.

Extends the slot engine (``continuous.ContinuousEngine``) from Wan t2v to
the FLUX.1 t2i family: a 4-step Turbo/schnell preview admitted behind a
50-step dev render joins the batch at the next STEP boundary and leaves at
its own step count — the head-of-line blocking that the request-level
``BatchingEngine`` cannot avoid.  ``flux_dit_forward`` is natively batched
with per-sample ``(B,)`` timesteps and ``(B,)`` embedded guidance
(models/flux/dit.py:348-356), so every slot advances on its OWN schedule
(own sigma table, own guidance, own prompt) inside one MXU-saturating
dispatch, exactly like the Wan stepper.

The engine's batch state is the generic (lat, ctx, nctx) triple plus an
opaque cross-kv pytree; FLUX needs two extra per-slot scalars/vectors that
ride existing channels so the SCHEDULER stays untouched:

  - **Pooled CLIP embedding** rides a PACKED final context row:
    ``plan.ctx`` is ``(1, Lt + 1, context_dim)`` with rows ``[0:Lt]`` the
    T5 embedding and row ``Lt`` the pooled vector zero-padded from
    ``pooled_dim`` to ``context_dim`` (same dtype — the split in
    ``_flux_slot_step`` recovers the exact bits).
  - **Per-request embedded guidance** rides the engine's ``cfg`` channel
    (``plan.cfg_scale``).  FLUX.1 dev/schnell/Turbo-LoRA are
    guidance-distilled — the dedicated pipeline's default is
    ``cfg_scale == 1`` with guidance an EMBEDDED conditioning input — so
    the step ignores ``use_cfg``/``nctx`` entirely and feeds the channel
    to the guidance embedder.  True-CFG FLUX (negative prompts) is out of
    scope for slot serving; route it through ``BatchingEngine``.

Scope: one (height, width) + T5-length bucket per stepper (the compiled
program is shape-static, as in the Wan stepper; mixed shapes route via
``serving.BucketRouter``), text conditioning plus per-slot hot LoRAs
(``loras=`` registry, gathered per-sample at admission — mixed-adapter
traffic shares one batched step, models/flux/lora_runtime).  No
ControlNet/IP-Adapter/Kontext extras — those are per-request structured
conditionings, served via the request-level engine.

No reference analogue: the reference (CloudEngineHub/FairyGen) has no
serving layer at all; see continuous.py.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .continuous import _SlotPlan


@functools.partial(jax.jit, static_argnames=("dit_cfg", "use_cfg"),
                   donate_argnums=(1,))
def _flux_slot_step(params, lat, t, ctx, nctx, guidance, dsig, ckv_p, ckv_n,
                    hot=None, *, dit_cfg, use_cfg: bool = True):
    """One batched FLUX Euler step; ``t``/``guidance``/``dsig`` are (B,).

    Same math as the dedicated pipeline's no-CFG step
    (_flux_denoise_chunk, pipelines/flux_image.py): one sweep, Euler
    update cast to the latent dtype.  ``nctx``/``ckv_*``/``use_cfg`` are
    engine-protocol slots FLUX never reads (guidance is embedded, not a
    two-sweep combine).  ``hot``: per-slot adapters in the "As"/"Bs"
    form (models/flux/lora_runtime.select_flux_slot_loras)."""
    del nctx, ckv_p, ckv_n, use_cfg
    from ..models.flux.dit import flux_dit_forward

    emb = ctx[:, :-1]
    pooled = ctx[:, -1, : dit_cfg.pooled_dim]
    v = flux_dit_forward(
        params, dit_cfg, lat, t, emb, pooled,
        guidance if dit_cfg.guidance_embed else None,
        hot_lora=hot)
    return lat + v.astype(lat.dtype) * dsig[:, None, None, None].astype(
        lat.dtype)


class FluxSlotStepper:
    """Adapts a ``FluxImagePipeline`` (text path) to slot-level stepping.

    One stepper == one shape bucket: (height, width) and the T5 context
    length are fixed at construction/first-admission so the batched step
    program compiles exactly once.  Drop-in stepper for
    ``ContinuousEngine`` (duck-typed protocol: prepare / validate_slots /
    init_batch / params_for / cross_kv / step_batch / decode)."""

    def __init__(self, pipe, *, height: int = 1024, width: int = 1024,
                 context_len: Optional[int] = None, slot_mesh=None,
                 loras=None, lora_alphas=None):
        cfg = pipe.dit_cfg
        if cfg.pooled_dim > cfg.context_dim:
            raise ValueError(
                f"pooled_dim {cfg.pooled_dim} > context_dim "
                f"{cfg.context_dim}: the packed-row transport cannot carry "
                "the pooled embedding")
        if height % 16 or width % 16:
            raise ValueError(f"height/width must be /16, got "
                             f"({height}, {width})")
        if getattr(pipe, "mesh", None) is not None:
            # mirrors the Wan stepper's guard (continuous.py): mixing a
            # tensor-parallel pipe with slot serving either re-replicates
            # the TP-sharded 12B weights onto a different mesh (OOM) or
            # silently mixes two sharding schemes
            raise ValueError(
                "FluxSlotStepper does not support a tensor-parallel pipe "
                "(pipe.use_mesh); slot-parallel serving shards the BATCH "
                "via slot_mesh instead")
        if pipe.vae_cfg is not None and \
                cfg.in_dim != 4 * pipe.vae_cfg.latent_channels:
            # Flex/inpaint-style DiTs take extra packed conditioning
            # channels the slot step never injects — without this guard
            # admission dies in an opaque matmul shape error (or, with no
            # VAE, serves garbage noise); route those variants through the
            # request-level BatchingEngine
            raise ValueError(
                f"DiT in_dim {cfg.in_dim} != 4 x latent_channels "
                f"{pipe.vae_cfg.latent_channels}: this variant needs extra "
                "conditioning channels — serve it via BatchingEngine")
        self.pipe = pipe
        self.height, self.width = height, width
        zc = pipe.vae_cfg.latent_channels if pipe.vae_cfg else \
            cfg.in_dim // 4
        self.latent_shape = (zc, height // 8, width // 8)
        # context_len counts the T5 rows only; the packed batch carries +1
        self.context_len = context_len
        self._batch_sharding = None
        self._dit_params = pipe.dit_params
        # per-slot hot LoRA registry, mirroring WanSlotStepper(loras=):
        # stacked (L, K+1, din, r) per touched layer, identity at 0;
        # gathered per-sample at admission (select_flux_slot_loras)
        self._lora_ids = {}
        self._lora_stack = None
        if loras:
            from ..core.io import load_state_dict
            from ..models.flux.lora_runtime import build_flux_slot_lora_stack

            names = sorted(loras)
            sds = [loras[n] if isinstance(loras[n], dict)
                   else load_state_dict(loras[n]) for n in names]
            alphas = [float((lora_alphas or {}).get(n, 1.0)) for n in names]
            self._lora_stack = build_flux_slot_lora_stack(
                sds, cfg, alphas=alphas, dtype=pipe.dtype)
            self._lora_ids = {n: i + 1 for i, n in enumerate(names)}
        if slot_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.data_size = slot_mesh.shape["data"]
            self._batch_sharding = NamedSharding(slot_mesh, P("data"))
            self._dit_params = jax.device_put(
                pipe.dit_params, NamedSharding(slot_mesh, P()))

    # -- per-request ------------------------------------------------------
    def prepare(self, prompt: Optional[str] = None, *, prompt_emb=None,
                pooled_prompt_emb=None, seed: int = 0,
                num_inference_steps: int = 30,
                embedded_guidance: float = 3.5,
                sigma_shift: Optional[float] = None,
                denoising_strength: float = 1.0,
                t5_sequence_length: int = 512,
                lora: Optional[str] = None,
                height: Optional[int] = None, width: Optional[int] = None,
                output_type: str = "np") -> _SlotPlan:
        from ..core.noise import generate_noise
        from ..diffusion.flow_match import FlowMatchScheduler

        pipe = self.pipe
        if num_inference_steps < 1:
            raise ValueError(f"num_inference_steps must be >= 1, got "
                             f"{num_inference_steps}")
        # requests routed through BucketRouter carry their shape params;
        # this stepper IS one (height, width) bucket — accept matching
        # values, reject mismatches loudly (a mis-keyed router)
        if (height is not None and height != self.height) or \
                (width is not None and width != self.width):
            raise ValueError(
                f"request shape ({height}, {width}) != engine bucket "
                f"({self.height}, {self.width}); route mixed shapes via "
                "serving.BucketRouter")
        if prompt_emb is None:
            prompt_emb, pooled_prompt_emb = pipe.encode_prompt(
                prompt, t5_sequence_length)
        if pooled_prompt_emb is None:
            raise ValueError("prompt_emb without pooled_prompt_emb")
        # HTTP-borne requests (client-side embedding caches) arrive as
        # JSON lists; both sides convert identically so the dtype-match
        # guard below stays meaningful
        if not hasattr(prompt_emb, "shape"):
            prompt_emb = jnp.asarray(prompt_emb, jnp.float32)
        if not hasattr(pooled_prompt_emb, "shape"):
            pooled_prompt_emb = jnp.asarray(pooled_prompt_emb, jnp.float32)
        if jnp.asarray(pooled_prompt_emb).dtype != \
                jnp.asarray(prompt_emb).dtype:
            # the packed-row transport casts pooled to prompt_emb.dtype;
            # a wider hand-passed pooled dtype would round and break the
            # docstring's exact-bit recovery claim (encode_prompt always
            # emits matching dtypes)
            raise ValueError(
                f"pooled_prompt_emb dtype {jnp.asarray(pooled_prompt_emb).dtype} "
                f"!= prompt_emb dtype {jnp.asarray(prompt_emb).dtype}: the "
                "packed-row transport requires matching dtypes")
        if self.context_len is None:
            self.context_len = int(prompt_emb.shape[1])
        if prompt_emb.shape[1] != self.context_len:
            raise ValueError(
                f"T5 context length {prompt_emb.shape[1]} != engine bucket "
                f"{self.context_len} (fixed per compiled program)")
        # pack: [T5 rows; pooled row zero-padded to context_dim]
        pd = self.pipe.dit_cfg.pooled_dim
        row = jnp.zeros((1, 1, prompt_emb.shape[2]), prompt_emb.dtype)
        row = row.at[0, 0, :pd].set(
            pooled_prompt_emb[0].astype(prompt_emb.dtype))
        ctx = jnp.concatenate([prompt_emb, row], axis=1)

        lat0 = generate_noise((1,) + self.latent_shape,
                              seed=seed).astype(pipe.dtype)
        sched = FlowMatchScheduler("FLUX.1").set_timesteps(
            num_inference_steps, denoising_strength=denoising_strength,
            shift=sigma_shift)
        # keep sigmas f32 end-to-end so the host-side dsig equals the
        # dedicated pipeline's on-device f32 subtraction bit-for-bit
        sigmas = np.concatenate([np.asarray(sched.sigmas, np.float32),
                                 np.zeros(1, np.float32)])
        lora_id = 0
        if lora:
            if lora not in self._lora_ids:
                raise ValueError(
                    f"unknown hot LoRA {lora!r}; registered: "
                    f"{sorted(self._lora_ids) or '(none)'}")
            lora_id = self._lora_ids[lora]
        return _SlotPlan(
            lat0=lat0, ctx=ctx, nctx=ctx, sigmas=sigmas,
            timesteps=np.asarray(sched.timesteps, np.float32),
            cfg_scale=float(embedded_guidance), output_type=output_type,
            streaming_vae=False, lora_id=lora_id,
        )

    # -- batched ----------------------------------------------------------
    def validate_slots(self, num_slots: int) -> None:
        if self._batch_sharding is not None and num_slots % self.data_size:
            raise ValueError(
                f"num_slots={num_slots} must be a multiple of the mesh "
                f"data axis ({self.data_size}) for slot-parallel serving")

    def init_batch(self, num_slots: int, ctx_proto: jnp.ndarray):
        self.validate_slots(num_slots)
        lat = jnp.zeros((num_slots,) + self.latent_shape, self.pipe.dtype)
        ctx = jnp.zeros((num_slots,) + ctx_proto.shape[1:], ctx_proto.dtype)
        if self._batch_sharding is not None:
            lat = jax.device_put(lat, self._batch_sharding)
            ctx = jax.device_put(ctx, self._batch_sharding)
        return lat, ctx, jnp.zeros_like(ctx)

    def params_for(self, adapter_ids) -> Any:
        """(base params, per-slot hot selection or None): the FLUX hot
        adapters ride ``flux_dit_forward(hot_lora=)`` rather than the
        params tree, so the engine's opaque params channel carries both.
        The gather runs once per occupancy change (engine key), not per
        step."""
        ids = np.asarray(adapter_ids, np.int32)
        if self._lora_stack is None or not ids.any():
            return (self._dit_params, None)
        from ..models.flux.lora_runtime import select_flux_slot_loras

        return (self._dit_params, select_flux_slot_loras(self._lora_stack,
                                                         ids))

    def cross_kv(self, ctx_b, params=None):
        return None  # FLUX joint attention has no hoistable cross k/v

    def step_batch(self, lat, t, ctx_b, nctx_b, cfg, dsig, ckv_p, ckv_n,
                   use_cfg: bool = True, params=None):
        base, hot = (params if isinstance(params, tuple)
                     else (params or self._dit_params, None))
        # pin use_cfg: the FLUX step ignores it, so both scheduler values
        # must map to ONE compiled program (not two cache entries)
        return _flux_slot_step(
            base, lat, jnp.asarray(t, jnp.float32), ctx_b, nctx_b,
            jnp.asarray(cfg, jnp.float32), jnp.asarray(dsig, jnp.float32),
            ckv_p, ckv_n, hot, dit_cfg=self.pipe.dit_cfg, use_cfg=True)

    def decode(self, lat_row, plan: _SlotPlan):
        if self._batch_sharding is not None:
            lat_row = jnp.asarray(np.asarray(lat_row))
        latents = lat_row[None]
        if plan.output_type == "latent":
            return latents
        # mirror the dedicated pipeline's fp32 decode tail
        # (pipelines/flux_image.py:816-832)
        from ..models.flux.vae import vae_decode

        pipe = self.pipe
        z = latents.astype(jnp.float32) / pipe.vae_cfg.scaling_factor \
            + pipe.vae_cfg.shift_factor
        image = vae_decode(
            jax.tree.map(lambda a: a.astype(jnp.float32), pipe.vae_params),
            pipe.vae_cfg, z)
        from ..core.imaging import postprocess_image

        arr = postprocess_image(np.asarray(image[0]))
        if plan.output_type == "pil":
            from PIL import Image

            return Image.fromarray(arr)
        return arr
