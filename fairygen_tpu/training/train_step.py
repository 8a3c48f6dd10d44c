"""SPMD training step for the Wan DiT.

Replaces the reference's accelerate/DDP wiring
(``animation/diffsynth/diffusion/runner.py:8-47``; NCCL all-reduce via
``accelerator.backward``) with a pjit-compiled step over a
(data, seq, tensor) mesh: batch is sharded over ``data``, the flattened
token axis is sharding-constrained over ``seq`` (XLA inserts the Ulysses-
style collectives), and gradient psum over ``data`` falls out of the
sharding propagation — no process groups, no hooks.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.meshes import AXES
from ..diffusion.flow_match import FlowMatchScheduler
from ..models.wan.dit import WanDiTConfig, wan_dit_forward
from .losses import flow_match_sft_loss


def _donate():
    """donate_argnums for the train-step jits: donating the TrainState
    halves peak param+opt-state memory per step (the old state is dead
    the moment the new one exists).  CPU has no donation — returning ()
    there avoids a warning per compile in the test suite."""
    return () if jax.default_backend() == "cpu" else (0,)


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


def make_wan_sft_train_step(
    dit_cfg: WanDiTConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    *,
    num_train_timesteps: int = 1000,
    sigma_shift: float = 5.0,
    remat: bool = True,
    first_frame_clean: Optional[bool] = None,
    trainable_filter: Optional[Callable] = None,
    lora_b_dropout: Optional[tuple] = None,  # ("B", 0.8) stage-1 / ("B2", 0.5) stage-2
    gradient_accumulation_steps: int = 1,
    pp_microbatches: Optional[int] = None,  # GPipe over a 'pipe' mesh axis
):
    """Build (init_state, train_step). Batch: {latents, context}.

    trainable_filter(path_tuple) -> bool restricts updates to a subset
    (LoRA adapters); frozen params get zero updates via optax.masked.
    """
    scheduler = FlowMatchScheduler("Wan").set_timesteps(
        num_train_timesteps, training=True, shift=sigma_shift
    )
    sigmas = scheduler.sigmas
    timesteps = scheduler.timesteps
    weights = scheduler.linear_timesteps_weights
    if first_frame_clean is None:
        first_frame_clean = dit_cfg.fuse_vae_embedding_in_latents

    pp = (mesh is not None and AXES.pipe in mesh.axis_names
          and mesh.shape[AXES.pipe] > 1)

    def model_fn(params, noisy, timestep, context):
        if mesh is not None:
            noisy = jax.lax.with_sharding_constraint(
                noisy, NamedSharding(mesh, P(AXES.data))
            )
            context = jax.lax.with_sharding_constraint(
                context, NamedSharding(mesh, P(AXES.data))
            )
        return wan_dit_forward(
            params, dit_cfg, noisy, timestep, context,
            fuse_vae_embedding_in_latents=first_frame_clean,
            remat=remat,
            pp_mesh=mesh if pp else None,
            pp_microbatches=pp_microbatches,
        )

    def loss_fn(params, batch, rng):
        if lora_b_dropout is not None:
            # stage-wise element dropout on B/B2 as a parameter transform
            # (training_module.py:233-242, 338-346)
            from ..models.adapters import dropout_lora_b

            which, p_drop = lora_b_dropout
            rng, sub = jax.random.split(rng)
            params = dropout_lora_b(params, sub, p_drop, which=which)
        return flow_match_sft_loss(
            model_fn, params, batch["latents"], batch["context"], rng,
            sigmas=sigmas, timesteps=timesteps, weights=weights,
            first_frame_clean=first_frame_clean,
        )

    if trainable_filter is not None:
        optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: "train" if trainable_filter(path) else "freeze", params
            ),
        )
    if gradient_accumulation_steps > 1:
        # replaces accelerate's gradient_accumulation_steps (runner.py:31)
        optimizer = optax.MultiSteps(optimizer, gradient_accumulation_steps)

    def init_state(params):
        return TrainState(params=params, opt_state=optimizer.init(params),
                          step=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, donate_argnums=_donate())
    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_state, train_step


def make_wan_distill_train_step(
    dit_cfg: WanDiTConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    *,
    method: str = "direct",  # "direct" | "trajectory"
    num_inference_steps: int = 4,
    num_teacher_steps: int = 50,
    sigma_shift: float = 5.0,
    remat: bool = True,
    first_frame_clean: Optional[bool] = None,
    trainable_filter: Optional[Callable] = None,
    perceptual_fn: Optional[Callable] = None,
    decode_fn: Optional[Callable] = None,
):
    """Few-step distillation step — the reference's ``--task direct_distill``
    (train.py:59-61 -> DirectDistillLoss, diffusion/loss.py:24-33) and the
    TrajectoryImitationLoss variant (loss.py:36-119).

    method="direct": the student rolls out its own few-step trajectory from
    noise and matches the batch's clean latents (teacher-free; the teacher
    signal is the data, as in the reference).
    method="trajectory": the student's per-step velocities match finite
    differences of a frozen teacher's many-step rollout; pass the teacher
    params as ``train_step(state, batch, rng, teacher_params=...)``.

    This is the recipe that buys >1 img/s SDXL / <30 s clips: distill the
    50-step sampler into ``num_inference_steps`` student steps, then run
    the pipeline with that step count.
    """
    from .losses import direct_distill_loss, trajectory_imitation_loss

    if first_frame_clean is None:
        first_frame_clean = dit_cfg.fuse_vae_embedding_in_latents

    def model_fn(params, noisy, timestep, context):
        if mesh is not None:
            noisy = jax.lax.with_sharding_constraint(
                noisy, NamedSharding(mesh, P(AXES.data))
            )
            context = jax.lax.with_sharding_constraint(
                context, NamedSharding(mesh, P(AXES.data))
            )
        return wan_dit_forward(
            params, dit_cfg, noisy, timestep, context,
            fuse_vae_embedding_in_latents=first_frame_clean,
            remat=remat,
        )

    def loss_fn(params, batch, rng, teacher_params):
        if method == "direct":
            return direct_distill_loss(
                model_fn, params, batch["latents"], batch["context"], rng,
                num_inference_steps=num_inference_steps,
                sigma_shift=sigma_shift,
            )
        # a fixed noise pool (batch["noise"]) lets experiments revisit the
        # same teacher trajectories across steps; otherwise draw fresh
        noise = batch.get("noise")
        if noise is None:
            noise = jax.random.normal(rng, batch["latents"].shape,
                                      batch["latents"].dtype)
        return trajectory_imitation_loss(
            model_fn,
            lambda lat, t, ctx: model_fn(teacher_params, lat, t, ctx),
            params, noise, batch["context"],
            num_student_steps=num_inference_steps,
            num_teacher_steps=num_teacher_steps,
            sigma_shift=sigma_shift,
            perceptual_fn=perceptual_fn, decode_fn=decode_fn,
        )

    if trainable_filter is not None:
        optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: "train" if trainable_filter(path) else "freeze",
                params,
            ),
        )

    def init_state(params):
        return TrainState(params=params, opt_state=optimizer.init(params),
                          step=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, donate_argnums=_donate())
    def train_step(state: TrainState, batch, rng, teacher_params=None):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch, rng, teacher_params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), loss)

    return init_state, train_step
