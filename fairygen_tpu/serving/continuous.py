"""Step-level continuous batching for diffusion serving.

The batch-bucketed ``BatchingEngine`` (server.py) admits requests only at
*request* boundaries: a 4-step preview stuck behind a 100-sweep flagship
clip waits the full minute.  This module is the TPU-native answer to
vLLM-style continuous batching, adapted from token-level autoregression
to **denoise-step-level** diffusion scheduling:

  - **One compiled program, fixed slots.** The whole service runs a single
    jitted batched denoise step with ``B = num_slots``; static shapes mean
    zero recompilation at admission/eviction.  ``wan_dit_forward`` natively
    takes per-sample ``(B,)`` timesteps, so every slot advances on its OWN
    schedule (own step index, own sigma table, own CFG scale, own prompt
    context) inside one MXU-saturating dispatch.
  - **Step-boundary admission.** A request joins the batch at the next
    step boundary (sub-second at flagship shapes) instead of waiting for
    in-flight requests to finish; it leaves at its own step count.
  - **Occupancy-sized batches.** On a single device the step batch is the
    CONCATENATION of the active slots' latent rows (one compiled program
    per occupancy level): a lone request pays exactly the dedicated
    pipeline's step cost, and joint steps only happen while requests
    genuinely overlap.  In slot-parallel (mesh) mode the batch stays at
    ``num_slots`` sharded over the data axis — idle slots ride with
    ``dsig = 0`` on chips that would otherwise sit idle.
  - **Exactness.** Batch rows are independent in the DiT (per-sample
    norms/attention/timestep-modulation), so each request's trajectory is
    the same math as a dedicated ``WanVideoPipeline`` run of the text-only
    path, including the per-prompt cross-attention k/v hoist.

  - **Per-slot hot LoRAs.** Register adapters at construction
    (``WanSlotStepper(loras={name: path})``); each request selects one via
    ``lora=name``.  The stacked registry is gathered into per-sample
    ``(B, in, r)`` adapter leaves at admission (``select_slot_loras``) so
    two requests with DIFFERENT adapters denoise in the same batched step
    — no bucket swap, no retrace (the round-3 engine forced mixed-adapter
    traffic through the request-level engine's swap path).

Scope: the text-to-video conditioning path of ``WanVideoPipeline`` with a
single DiT expert, one latent-shape bucket per engine — mixed-shape
traffic routes through ``router.BucketRouter``, which owns one engine per
(height, width, frames) compile signature under a slot budget — and
two DiT sweeps per step (slots with ``cfg_scale == 1`` reuse the positive
context for the negative sweep, which keeps the program uniform).

No reference analogue: the reference (CloudEngineHub/FairyGen) ships only
a one-request-at-a-time Gradio demo (stylization app.py); serving is this
framework's own deployment story.
"""
from __future__ import annotations

import functools
import threading
from collections import deque
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .server import Request


@functools.partial(jax.jit, static_argnames=("dit_cfg", "use_cfg"),
                   donate_argnums=(1,))
def _slot_step(params, lat, t, ctx, nctx, cfg, dsig, ckv_p, ckv_n, *,
               dit_cfg, use_cfg: bool = True):
    """One batched denoise step; ``t``/``cfg``/``dsig`` are per-slot (B,).

    Same math as the dedicated pipeline's CFG step (_denoise_chunk,
    pipelines/wan_video.py: two sweeps, f32 CFG combine, Euler update cast
    to the latent dtype).  ``use_cfg=False`` (every active slot at
    cfg_scale == 1) compiles the single-sweep program — the combine with
    cfg == 1 is exactly ``v_posi``, so skipping the negative sweep is
    mathematically identical and halves the step for distilled/Turbo
    few-step workloads."""
    from ..models.wan.dit import wan_dit_forward

    v_posi = wan_dit_forward(params, dit_cfg, lat, t, ctx, cross_kv=ckv_p)
    if use_cfg:
        v_nega = wan_dit_forward(params, dit_cfg, lat, t, nctx,
                                 cross_kv=ckv_n)
        v = v_nega + cfg[:, None, None, None, None] * (v_posi - v_nega)
    else:
        v = v_posi
    return lat + v.astype(lat.dtype) * dsig[:, None, None, None, None].astype(
        lat.dtype)


@dataclass
class _SlotPlan:
    """Everything a request needs once admitted to a slot."""
    lat0: jnp.ndarray        # (1, C, F, H, W) initial noise
    ctx: jnp.ndarray         # (1, L, text_dim)
    nctx: jnp.ndarray        # (1, L, text_dim) negative (== ctx if no CFG)
    sigmas: np.ndarray       # (n + 1,) f32, trailing 0.0 appended
    timesteps: np.ndarray    # (n,) f32
    cfg_scale: float
    output_type: str
    streaming_vae: bool
    lora_id: int = 0         # 0 = none; i+1 = stepper's i-th hot LoRA


class _Idle(Exception):
    """Scheduler-internal: no active slots this tick — wait for work."""


@dataclass
class _Slot:
    req: Request
    plan: _SlotPlan
    step: int = 0
    lat: Optional[jnp.ndarray] = None  # (1, C, F, H, W); compact mode only

    @property
    def n(self) -> int:
        return len(self.plan.timesteps)

    @property
    def done(self) -> bool:
        return self.step >= self.n


class WanSlotStepper:
    """Adapts a ``WanVideoPipeline`` (t2v path) to slot-level stepping.

    One stepper == one shape bucket: (height, width, num_frames) and the
    context length are fixed at construction so the batched step program
    compiles exactly once."""

    def __init__(self, pipe, *, height: int = 480, width: int = 832,
                 num_frames: int = 81, context_len: Optional[int] = None,
                 slot_mesh=None, loras: Optional[Dict[str, Any]] = None,
                 lora_alphas: Optional[Dict[str, float]] = None):
        if pipe.dit2_params is not None:
            raise ValueError(
                "continuous batching supports single-expert pipelines only "
                "(slots at different steps would straddle the dit/dit2 "
                "boundary); serve two-expert models via BatchingEngine")
        if pipe.mesh is not None:
            raise ValueError(
                "pass the mesh as slot_mesh= instead: slot stepping shards "
                "the BATCH over the data axis (pipe.mesh would shard each "
                "slot's token axis, mixing the two schemes)")
        if pipe.dit_cfg.has_image_input:
            raise ValueError(
                "continuous batching serves the t2v conditioning path only "
                "(this DiT patchifies a y/mask conditioning stream that "
                "_slot_step does not carry); serve i2v via BatchingEngine")
        self.pipe = pipe
        self.height, self.width, self.num_frames = height, width, num_frames
        self.latent_shape = pipe._latent_shape(height, width, num_frames)[1:]
        self.context_len = context_len
        # mirror the dedicated pipeline's use_ckv gate (text-only path)
        self.use_ckv = not pipe.dit_cfg.has_image_input
        # slot-parallel serving: slots ride the mesh's data axis (weights
        # replicated, batch sharded — per-slot math is unchanged, so N
        # chips serve N independent schedules in one SPMD program)
        self._batch_sharding = None
        self._dit_params = pipe.dit_params
        if slot_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.data_size = slot_mesh.shape["data"]
            self._batch_sharding = NamedSharding(slot_mesh, P("data"))
            self._dit_params = jax.device_put(
                pipe.dit_params, NamedSharding(slot_mesh, P()))
        # Per-slot hot LoRAs: a stacked registry gathered by slot id at
        # ADMISSION time (select_slot_loras) so mixed-adapter traffic
        # shares one compiled batched step instead of forcing bucket
        # swaps (round-3 engine limitation).  Index 0 = no adapter.
        self._lora_ids: Dict[str, int] = {}
        self._lora_stack = None
        if loras:
            from ..core.io import load_state_dict
            from ..models.adapters import build_hot_lora_stack

            names = sorted(loras)
            sds = [loras[n] if isinstance(loras[n], dict)
                   else load_state_dict(loras[n]) for n in names]
            alphas = [float((lora_alphas or {}).get(n, 1.0)) for n in names]
            self._lora_stack = build_hot_lora_stack(
                self._dit_params, sds, alphas, dtype=pipe.dtype)
            self._lora_ids = {n: i + 1 for i, n in enumerate(names)}

    # -- per-request ------------------------------------------------------
    def prepare(self, prompt: Optional[str] = None, *, context=None,
                negative_prompt: str = "", negative_context=None,
                seed: int = 0, num_inference_steps: int = 50,
                cfg_scale: float = 5.0, sigma_shift: float = 5.0,
                output_type: str = "quantized",
                streaming_vae: bool = False,
                height: Optional[int] = None, width: Optional[int] = None,
                num_frames: Optional[int] = None,
                lora: Optional[str] = None) -> _SlotPlan:
        from ..core.noise import generate_noise
        from ..diffusion.flow_match import FlowMatchScheduler

        pipe = self.pipe
        if num_inference_steps < 1:
            raise ValueError(f"num_inference_steps must be >= 1, got "
                             f"{num_inference_steps}")
        # requests routed through BucketRouter carry their shape params;
        # this stepper IS one (height, width, frames) bucket
        want = (height or self.height, width or self.width,
                num_frames or self.num_frames)
        if want != (self.height, self.width, self.num_frames):
            raise ValueError(
                f"request shape {want} != engine bucket "
                f"({self.height}, {self.width}, {self.num_frames}); route "
                "mixed shapes via serving.BucketRouter")
        lora_id = 0
        if lora:
            if lora not in self._lora_ids:
                raise ValueError(
                    f"unknown hot LoRA {lora!r}; registered: "
                    f"{sorted(self._lora_ids) or '(none)'}")
            lora_id = self._lora_ids[lora]
        if context is None:
            context = pipe.encode_prompt(prompt)
        if cfg_scale != 1.0 and negative_context is None:
            if pipe.tokenizer is None:
                raise ValueError(
                    "cfg_scale != 1 with no text encoder loaded: pass "
                    "negative_context= explicitly")
            negative_context = pipe.encode_prompt(negative_prompt)
        if self.context_len is None:
            self.context_len = int(context.shape[1])
        if context.shape[1] != self.context_len:
            raise ValueError(
                f"context length {context.shape[1]} != engine bucket "
                f"{self.context_len} (fixed per compiled program)")
        if cfg_scale == 1.0:
            negative_context = context  # uniform program; combine is a no-op

        lat0 = generate_noise((1,) + self.latent_shape, seed=seed,
                              dtype=pipe.dtype)
        sched = FlowMatchScheduler("Wan").set_timesteps(
            num_inference_steps, shift=sigma_shift)
        return _SlotPlan(
            lat0=lat0, ctx=context,
            nctx=negative_context.astype(context.dtype),
            sigmas=np.append(np.asarray(sched.sigmas, np.float32), 0.0),
            timesteps=np.asarray(sched.timesteps, np.float32),
            cfg_scale=float(cfg_scale), output_type=output_type,
            streaming_vae=streaming_vae, lora_id=lora_id,
        )

    # -- batched ------------------------------------------------------------
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
        """Per-slot adapter selection: gather each occupant's hot LoRA from
        the stack into per-sample (B, in, r)/(B, r, out) leaves.  Runs at
        admission/eviction (occupancy-key change), never per step.  All-0
        ids (or no registry) return the base params — the LoRA-free
        program."""
        ids = np.asarray(adapter_ids, np.int32)
        if self._lora_stack is None or not ids.any():
            return self._dit_params
        from ..models.adapters import select_slot_loras

        return select_slot_loras(self._dit_params, self._lora_stack, ids)

    def cross_kv(self, ctx_b, params=None):
        if not self.use_ckv:
            return None
        from ..pipelines.wan_video import _cross_kv

        return _cross_kv(self._dit_params if params is None else params,
                         ctx_b, dit_cfg=self.pipe.dit_cfg)

    def step_batch(self, lat, t, ctx_b, nctx_b, cfg, dsig, ckv_p, ckv_n,
                   use_cfg: bool = True, params=None):
        return _slot_step(self._dit_params if params is None else params,
                          lat,
                          jnp.asarray(t, jnp.float32), ctx_b, nctx_b,
                          jnp.asarray(cfg, jnp.float32),
                          jnp.asarray(dsig, jnp.float32), ckv_p, ckv_n,
                          dit_cfg=self.pipe.dit_cfg, use_cfg=use_cfg)

    def decode(self, lat_row, plan: _SlotPlan):
        if self._batch_sharding is not None:
            # pull the slot's shard back to the VAE's (single) device
            lat_row = jnp.asarray(np.asarray(lat_row))
        return self.pipe._decode_output(
            lat_row[None], output_type=plan.output_type,
            streaming_vae=plan.streaming_vae)


class ContinuousEngine:
    """Slot scheduler: admits queued requests into free slots at step
    boundaries and drives one batched denoise step per iteration.

    The denoise loop never blocks on admission (prepare/encode runs on the
    scheduler thread between steps), and with ``decode_async`` (default) a
    finished slot's VAE decode — ~8% of a clip at flagship shapes, host-
    blocking for its full device time because the result must materialize
    — runs on a dedicated decode thread: the slot frees immediately, the
    scheduler admits and dispatches the next steps while the decode
    executes, and the request completes when its video lands.  Decodes of
    one engine are serialized with each other (one worker), preserving
    submission-order completion among simultaneous finishes."""

    def __init__(self, stepper: WanSlotStepper, *, num_slots: int = 2,
                 default_params: Optional[Dict[str, Any]] = None,
                 max_finished: int = 256, max_inflight_steps: int = 2,
                 decode_async: bool = True):
        self.stepper = stepper
        self.num_slots = num_slots
        stepper.validate_slots(num_slots)  # fail at construction, not admit
        self.default_params = default_params or {}
        self.max_finished = max_finished
        self._queue: deque = deque()
        self._requests: Dict[str, Request] = {}  # id -> live/finished
        self._finished: deque = deque()  # finished ids, oldest first
        self._lock = threading.Condition()
        self._stop = False
        self._stats = {"requests": 0, "completed": 0, "errors": 0,
                       "steps": 0, "slot_steps": 0}
        self._compact_cache: Dict[str, Any] = {}
        # Backpressure: without it the scheduler thread enqueues EVERY
        # remaining step of the current occupancy before a new request can
        # influence anything — admission would happen on the dispatch
        # timeline while the device executes the old schedule (the async
        # dispatch queue is unbounded).  Bounding in-flight steps keeps
        # step boundaries real: dispatch step k, then force step
        # k - max_inflight to retire (scalar fetch) before the next
        # admission decision.  W=2 keeps the device busy across the
        # sync round-trip.
        self.max_inflight_steps = max_inflight_steps
        self._inflight: deque = deque()
        self.decode_async = decode_async
        self._decode_thread = None
        if decode_async:
            import queue as _queue

            self._decode_q: Any = _queue.Queue()
            self._decode_thread = threading.Thread(
                target=self._decode_worker, daemon=True,
                name="fairygen-decode")
            self._decode_thread.start()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="fairygen-continuous")
        self._thread.start()

    # -- client side -----------------------------------------------------
    def submit(self, prompt: Optional[str] = None, **params) -> Request:
        req = Request(prompt=prompt, params={**self.default_params, **params})
        with self._lock:
            if self._stop:
                raise RuntimeError("engine is shut down")
            self._queue.append(req)
            self._stats["requests"] += 1
            self._requests[req.id] = req
            self._lock.notify()
        return req

    def get(self, request_id: str) -> Optional[Request]:
        with self._lock:
            return self._requests.get(request_id)

    def stats(self) -> Dict[str, Any]:
        with self._lock:
            out = dict(self._stats)
        out["mean_occupancy"] = (out["slot_steps"] / out["steps"]
                                 if out["steps"] else 0.0)
        return out

    def idle(self) -> bool:
        """No queued or in-flight requests (async decodes included) —
        the router's spin-down eligibility test."""
        with self._lock:
            s = self._stats
            return (not self._queue
                    and s["requests"] == s["completed"] + s["errors"])

    def shutdown(self, timeout: float = 30.0):
        import time as _time

        t0 = _time.monotonic()
        with self._lock:
            self._stop = True
            self._lock.notify()
        self._thread.join(timeout)
        if self._decode_thread is not None:
            # drain pending decodes: the worker exits on the sentinel,
            # which the scheduler thread can no longer enqueue behind
            self._decode_q.put(None)
            self._decode_thread.join(
                max(0.0, timeout - (_time.monotonic() - t0)))

    def _decode_worker(self):
        """Dedicated VAE-decode thread: finished slots hand off
        (request, latent row, plan) so the scheduler keeps stepping the
        remaining occupancy during the decode."""
        while True:
            job = self._decode_q.get()
            if job is None:
                return
            req, lat_row, plan = job
            try:
                req.result = self.stepper.decode(lat_row, plan)
            except Exception as e:  # noqa: BLE001 - surfaced per-request
                req.error = f"{type(e).__name__}: {e}"
            req.progress = 1.0
            self._finish(req)

    # -- scheduler thread --------------------------------------------------
    def _finish(self, req: Request):
        """Mark done + bound the finished-request index (results can be
        whole decoded videos; mirror BatchingEngine's eviction window)."""
        req._done.set()
        with self._lock:
            key = "errors" if req.error is not None else "completed"
            self._stats[key] += 1
            self._finished.append(req.id)
            while len(self._finished) > self.max_finished:
                self._requests.pop(self._finished.popleft(), None)

    def _admit(self, slots: List[Optional[_Slot]], state):
        """Fill free slots from the queue; returns the updated device state.

        In slot-parallel (mesh) mode ``state`` is the fixed-size
        (lat, ctx_b, nctx_b, ckv_p, ckv_n) batch (None before the first
        admission); in compact mode each slot carries its own latent row
        and ``state`` stays None."""
        fixed = self.stepper._batch_sharding is not None
        refreshed = False
        for j in range(self.num_slots):
            if slots[j] is not None:
                continue
            with self._lock:
                req = self._queue.popleft() if self._queue else None
            if req is None:
                break
            try:
                plan = self.stepper.prepare(req.prompt, **req.params)
                if fixed:
                    if state is None:
                        state = self.stepper.init_batch(
                            self.num_slots, plan.ctx) + (None, None, None)
                    lat, ctx_b, nctx_b, ckv_p, ckv_n, sel = state
                    # rows go in as host arrays: uncommitted operands
                    # adopt the batch's sharding (slot-parallel shards
                    # over 'data').  Inside the try: a failure here must
                    # error THIS request, not vanish (the crash guard
                    # only covers requests already in slots).
                    lat = lat.at[j].set(np.asarray(plan.lat0[0]))
                    ctx_b = ctx_b.at[j].set(np.asarray(plan.ctx[0]))
                    nctx_b = nctx_b.at[j].set(np.asarray(plan.nctx[0]))
                    state = (lat, ctx_b, nctx_b, ckv_p, ckv_n, sel)
            except Exception as e:  # noqa: BLE001 - surfaced per-request
                req.error = f"{type(e).__name__}: {e}"
                self._finish(req)
                continue
            slots[j] = _Slot(req=req, plan=plan, lat=plan.lat0)
            refreshed = True
        if fixed and refreshed:
            lat, ctx_b, nctx_b, _, _, _ = state
            # idle slots keep adapter id 0 (identity rows in the stack)
            sel = self.stepper.params_for(
                [0 if s is None else s.plan.lora_id for s in slots])
            ckv_p = self.stepper.cross_kv(ctx_b, params=sel)
            if all(s is None or s.plan.cfg_scale == 1.0 for s in slots):
                # same dead-negative skip as the compact path: while every
                # occupant runs use_cfg=False the nctx side is never read,
                # so admissions shouldn't stall all slots for a second
                # full-batch cross-KV pass (nctx rows == ctx rows here)
                ckv_n = ckv_p
            else:
                ckv_n = self.stepper.cross_kv(nctx_b, params=sel)
            state = (lat, ctx_b, nctx_b, ckv_p, ckv_n, sel)
        return state

    def _run(self):
        slots: List[Optional[_Slot]] = [None] * self.num_slots
        state = None
        while True:
            try:
                state = self._tick(slots, state)
            except _Idle:
                with self._lock:
                    if self._stop and not self._queue:
                        return
                    if not self._queue:
                        self._lock.wait(timeout=0.1)
            except Exception as e:  # noqa: BLE001 - keep the server alive
                # a batched-step/cross-kv failure (OOM, bad checkpoint...)
                # cannot be attributed to one request: fail every active
                # slot and reset, rather than silently killing the
                # scheduler thread (which would hang all future requests)
                for j, s in enumerate(slots):
                    if s is None:
                        continue
                    s.req.error = f"{type(e).__name__}: {e}"
                    slots[j] = None
                    self._finish(s.req)
                state = None
                self._compact_cache = {}
                self._inflight.clear()

    def _tick(self, slots, state):
        state = self._admit(slots, state)
        if not any(s is not None for s in slots):
            raise _Idle
        if self.stepper._batch_sharding is not None:
            return self._tick_fixed(slots, state)
        self._tick_compact(slots)
        return None

    def _backpressure(self, stepped):
        """Queue a 1-element probe of this step's output; force the probe
        from ``max_inflight_steps`` ago to materialize (which retires that
        step and everything before it — the device stream is in-order).
        The probe is its own tiny buffer, so later donation of the stepped
        array never invalidates it."""
        self._inflight.append(stepped[(0,) * stepped.ndim])
        while len(self._inflight) > self.max_inflight_steps:
            np.asarray(self._inflight.popleft())

    def _bookkeep(self, slots, order, lat_of):
        """Advance per-slot counters after a step; decode + free finished
        slots.  ``lat_of(j)`` returns slot j's (C, F, H, W) latent row."""
        with self._lock:
            self._stats["steps"] += 1
            self._stats["slot_steps"] += len(order)
        for j in order:
            s = slots[j]
            s.step += 1
            s.req.progress = min(s.step / s.n, 1.0)
            if not s.done:
                continue
            if self.decode_async:
                # the sliced row is its own buffer: later donation of the
                # batched latent array cannot invalidate it
                self._decode_q.put((s.req, lat_of(j), s.plan))
                slots[j] = None
                continue
            try:
                s.req.result = self.stepper.decode(lat_of(j), s.plan)
            except Exception as e:  # noqa: BLE001
                s.req.error = f"{type(e).__name__}: {e}"
            s.req.progress = 1.0
            slots[j] = None
            self._finish(s.req)

    def _schedule(self, slots, order):
        """Per-slot step inputs for the slots in ``order``; t/dsig/cfg
        length len(order).  Idle entries never appear (order is active)."""
        t = np.array([slots[j].plan.timesteps[slots[j].step]
                      for j in order], np.float32)
        dsig = np.array(
            [slots[j].plan.sigmas[slots[j].step + 1]
             - slots[j].plan.sigmas[slots[j].step] for j in order],
            np.float32)
        cfg = np.array([slots[j].plan.cfg_scale for j in order], np.float32)
        # all-cfg==1 steps (distilled/Turbo workloads) skip the negative
        # sweep — exactly v_posi, half the compute (both variants are
        # shape-static programs)
        return t, dsig, cfg, bool((cfg != 1.0).any())

    def _tick_compact(self, slots):
        """Single-device path: the batch is OCCUPANCY-sized — active slots'
        latent rows concatenate into a (P, ...) batch, so a lone request
        pays exactly the dedicated-pipeline step cost and joint steps only
        happen while requests genuinely overlap.  Compiles one program per
        occupancy level (≤ num_slots, typically 2-4)."""
        order = tuple(j for j, s in enumerate(slots)
                      if s is not None and not s.done)
        if not order:
            raise _Idle
        c = self._compact_cache
        # key by REQUEST identity, not just slot indices: a freed slot
        # refilled while its neighbour stays active leaves the index tuple
        # unchanged, but the new occupant must not step with the previous
        # occupant's context
        key = tuple((j, slots[j].req.id) for j in order)
        if c.get("key") != key:
            # per-slot hot-LoRA selection rides the same key: the gather
            # happens once per occupancy change, and cross-KV below uses
            # the SELECTED params (cross_attn k/v may carry adapters)
            params = self.stepper.params_for(
                [slots[j].plan.lora_id for j in order])
            ctx = jnp.concatenate([slots[j].plan.ctx for j in order])
            ckv_p = self.stepper.cross_kv(ctx, params=params)
            if all(slots[j].plan.cfg_scale == 1.0 for j in order):
                # every step under this key runs use_cfg=False and never
                # reads the negative side — alias it (nctx == ctx per
                # prepare) instead of precomputing a dead ckv pytree
                nctx, ckv_n = ctx, ckv_p
            else:
                nctx = jnp.concatenate([slots[j].plan.nctx for j in order])
                ckv_n = self.stepper.cross_kv(nctx, params=params)
            c = self._compact_cache = {
                "key": key, "ctx": ctx, "nctx": nctx,
                "ckv_p": ckv_p, "ckv_n": ckv_n, "params": params}
        lat_p = (slots[order[0]].lat if len(order) == 1 else
                 jnp.concatenate([slots[j].lat for j in order]))
        t, dsig, cfg, use_cfg = self._schedule(slots, order)
        lat_p = self.stepper.step_batch(lat_p, t, c["ctx"], c["nctx"], cfg,
                                        dsig, c["ckv_p"], c["ckv_n"],
                                        use_cfg=use_cfg, params=c["params"])
        self._backpressure(lat_p)
        for i, j in enumerate(order):
            slots[j].lat = lat_p[i:i + 1]
        self._bookkeep(slots, order, lambda j: lat_p[order.index(j)])

    def _tick_fixed(self, slots, state):
        """Slot-parallel (mesh) path: fixed num_slots batch sharded over
        the data axis — idle slots ride along (their chips would be idle
        anyway), dsig=0 freezes their rows."""
        lat, ctx_b, nctx_b, ckv_p, ckv_n, sel = state
        order = tuple(j for j, s in enumerate(slots)
                      if s is not None and not s.done)
        if not order:
            raise _Idle
        t = np.zeros((self.num_slots,), np.float32)
        dsig = np.zeros((self.num_slots,), np.float32)
        cfg = np.ones((self.num_slots,), np.float32)
        t_o, dsig_o, cfg_o, use_cfg = self._schedule(slots, order)
        for i, j in enumerate(order):
            t[j], dsig[j], cfg[j] = t_o[i], dsig_o[i], cfg_o[i]
        lat = self.stepper.step_batch(lat, t, ctx_b, nctx_b, cfg, dsig,
                                      ckv_p, ckv_n, use_cfg=use_cfg,
                                      params=sel)
        self._backpressure(lat)
        self._bookkeep(slots, order, lambda j: lat[j])
        return (lat, ctx_b, nctx_b, ckv_p, ckv_n, sel)
