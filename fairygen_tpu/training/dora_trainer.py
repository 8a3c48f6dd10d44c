"""Style-DoRA trainer for the SDXL stylization path.

Port of ``stylization/dora_training/train.py`` (the single-image masked
style-adapter finetune):

  * DoRA adapters (r=32, α=r) on every attention projection
    to_q/to_k/to_v/to_out (train.py:762-776); the ``add_*_proj`` targets in
    the reference config never match SDXL's blocks and are no-ops;
  * the adapter update is mask-gated per token (make_new_forward,
    train.py:63-139) — realised through the mask_latents argument of
    unet2d_forward;
  * ε-prediction DDPM objective with the MASKED MSE loss
    ``sum(mse·mask)/clamp(mask.sum(),1)`` (train.py:1290-1296) and the
    optional min-SNR-γ weighting (train.py:1297-1312);
  * SDXL micro-conditioning time_ids (original+crop+target, train.py:1243).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.ddpm import DDPMScheduler
from ..models.adapters import init_lora, lora_trainable_filter
from ..models.sdxl.unet2d import UNet2DConfig, unet2d_forward
from .train_step import TrainState, _donate

DORA_TARGETS = ("to_q", "to_k", "to_v", "to_out")


def add_dora_to_sdxl_unet(params, key, rank: int = 32, alpha: Optional[float] = None,
                          targets=DORA_TARGETS, dtype=jnp.float32):
    """Inject DoRA adapters into every transformer attention projection."""
    keys = iter(jax.random.split(key, 4096))

    def inject_attn(attn):
        out = dict(attn)
        for t in targets:
            if t not in out:
                continue
            layer = dict(out[t])
            w = layer["w"]
            layer["lora"] = init_lora(
                next(keys), w.shape[0], w.shape[1], rank, alpha=alpha,
                dora=True, base_w=w, dtype=dtype,
            )
            out[t] = layer
        return out

    def inject_tblock(blk):
        blk = dict(blk)
        for name in ("attn1", "attn2"):
            if name in blk:
                blk[name] = inject_attn(blk[name])
        return blk

    def inject_transformer(tr):
        tr = dict(tr)
        tr["blocks"] = [inject_tblock(b) for b in tr["blocks"]]
        return tr

    params = dict(params)
    for section in ("down_blocks", "up_blocks"):
        new = []
        for stage in params.get(section, []):
            stage = dict(stage)
            if "attentions" in stage:
                stage["attentions"] = [inject_transformer(t) for t in stage["attentions"]]
            new.append(stage)
        params[section] = new
    if "mid_block" in params and params["mid_block"].get("attentions"):
        mb = dict(params["mid_block"])
        mb["attentions"] = [
            inject_transformer(t) if "blocks" in t else t for t in mb["attentions"]
        ]
        params["mid_block"] = mb
    return params


def masked_mse_loss(pred, target, mask_latents):
    """sum(mse·mask)/clamp(mask.sum(),1) — train.py:1290-1296.

    mask_latents: (B, 1, h, w) on the latent grid; broadcast over channels.
    """
    mask = jnp.broadcast_to(mask_latents.astype(jnp.float32), pred.shape)
    se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    return jnp.sum(se * mask) / jnp.clip(jnp.sum(mask), 1.0, None)


def make_sdxl_dora_train_step(
    unet_cfg: UNet2DConfig,
    optimizer: optax.GradientTransformation,
    *,
    scheduler: Optional[DDPMScheduler] = None,
    snr_gamma: Optional[float] = None,
    resolution: int = 1024,
):
    """Build (init_state, train_step) for the masked style-DoRA finetune.

    Batch: {latents (B,4,h,w) scaled, mask_latents (B,1,h,w),
            prompt_embeds (B,77,2048), pooled (B,1280),
            original_size (B,2), crop_top_left (B,2)}.
    """
    sched = scheduler or DDPMScheduler()

    def loss_fn(params, batch, rng):
        latents = batch["latents"]
        b = latents.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        timesteps = jax.random.randint(rng_t, (b,), 0, sched.num_train_timesteps)
        noise = jax.random.normal(rng_n, latents.shape, latents.dtype)
        noisy = sched.add_noise(latents, noise, timesteps)

        time_ids = jnp.concatenate(
            [
                batch["original_size"].astype(jnp.float32),
                batch["crop_top_left"].astype(jnp.float32),
                jnp.full((b, 2), resolution, jnp.float32),
            ],
            axis=-1,
        )
        pred = unet2d_forward(
            params, unet_cfg, noisy, timesteps.astype(jnp.float32),
            batch["prompt_embeds"],
            text_embeds=batch["pooled"], time_ids=time_ids,
            mask_latents=batch["mask_latents"],
        )
        target = noise  # ε-prediction
        if snr_gamma is None:
            return masked_mse_loss(pred, target, batch["mask_latents"])
        # min-SNR-γ (reference train.py:1297-1312) weights each SAMPLE's
        # loss by its own timestep's weight before averaging — a pooled
        # loss times mean(w) would let one sample's weight scale another
        # sample's gradient.  (We keep the mask inside the per-sample
        # loss; the reference's snr branch drops it — an upstream quirk,
        # not behavior worth preserving.)
        mask = jnp.broadcast_to(
            batch["mask_latents"].astype(jnp.float32), pred.shape)
        se = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        axes = tuple(range(1, pred.ndim))
        per_sample = (jnp.sum(se * mask, axis=axes)
                      / jnp.clip(jnp.sum(mask, axis=axes), 1.0, None))
        snr = sched.snr(timesteps)
        w = jnp.minimum(snr, snr_gamma) / jnp.clip(snr, 1e-8, None)
        return jnp.mean(per_sample * w)

    opt = optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "train"
            if lora_trainable_filter(("A", "B", "mag"))(path)
            else "freeze",
            params,
        ),
    )

    def init_state(params):
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, donate_argnums=_donate())
    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_state, train_step


def sdxl_dora_state_dict(params) -> dict:
    """Adapter weights in the diffusers save_lora_weights layout:
    'unet.<path>.lora_{A,B}.weight' + '.lora_magnitude_vector.weight'."""
    out = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            if "lora" in tree:
                ap = tree["lora"]
                base = "unet." + ".".join(path)
                out[base + ".lora_A.weight"] = np.asarray(ap["A"], np.float32).T
                out[base + ".lora_B.weight"] = np.asarray(ap["B"], np.float32).T
                if "mag" in ap:
                    out[base + ".lora_magnitude_vector.weight"] = np.asarray(
                        ap["mag"], np.float32
                    )
            for k, v in tree.items():
                if k != "lora":
                    walk(v, path + [str(k)])
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(v, path + [str(i)])

    walk(params, [])
    return out


def load_sdxl_dora_state_dict(params, sd: dict, scale: float = 1.0):
    """Inverse of :func:`sdxl_dora_state_dict`: re-inject saved adapters
    into a UNet param tree as runtime DoRA/LoRA modules (the dense layers
    apply them when a "lora" entry exists — models/adapters.py).

    ``scale`` is the inference-time lora weight (the reference passes
    ``cross_attention_kwargs={"scale": 0.66}``, test_brushnet_sdxl.py:158).
    Returns (params, n_adapters).
    """
    import jax.numpy as jnp

    groups = {}
    for k, v in sd.items():
        if ".lora_A.weight" in k:
            groups.setdefault(k[: -len(".lora_A.weight")], {})["A"] = v
        elif ".lora_B.weight" in k:
            groups.setdefault(k[: -len(".lora_B.weight")], {})["B"] = v
        elif ".lora_magnitude_vector.weight" in k:
            base = k[: -len(".lora_magnitude_vector.weight")]
            groups.setdefault(base, {})["mag"] = v

    n = 0
    for base, g in groups.items():
        path = base.split(".")
        if path[0] == "unet":
            path = path[1:]
        node = params
        parents = []
        ok = True
        for tok in path:
            parents.append(node)
            if isinstance(node, (list, tuple)):
                idx = int(tok)
                if idx >= len(node):
                    ok = False
                    break
                node = node[idx]
            elif isinstance(node, dict) and tok in node:
                node = node[tok]
            else:
                ok = False
                break
        if not ok or not isinstance(node, dict) or "w" not in node:
            print(f"[dora] no target layer for {base!r}; skipped")
            continue
        lora = {
            "A": jnp.asarray(np.asarray(g["A"], np.float32).T),
            "B": jnp.asarray(np.asarray(g["B"], np.float32).T),
            "scale": float(scale),
        }
        if "mag" in g:
            lora["mag"] = jnp.asarray(np.asarray(g["mag"], np.float32))
        node["lora"] = lora
        n += 1
    return params, n
