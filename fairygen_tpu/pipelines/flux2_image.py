"""FLUX.2 text-to-image pipeline.

Port of the reference ``Flux2ImagePipeline``
(``animation/diffsynth/pipelines/flux2_image.py:19-129``): Mistral-3
chat-template prompt -> stacked hidden layers (10, 20, 30) as a
(B, L, 15360) embedding, FlowMatch "FLUX.2" template with dynamic shift,
embedded guidance (no CFG), token-sequence latents through the
pack+BatchNorm VAE, img2img start.

TPU-native: chunked module-scope-jitted denoise loop.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.noise import generate_noise
from ..diffusion.flow_match import FlowMatchScheduler
from ..models.flux2.dit import (
    Flux2DiTConfig,
    flux2_dit_forward,
    prepare_image_ids,
)
from ..models.flux2.vae import (
    AutoencoderKLConfig,
    flux2_vae_decode,
    flux2_vae_encode,
)

SYSTEM_MESSAGE = (
    "You are an AI that reasons about image descriptions. You give "
    "structured responses focusing on object relationships, object "
    "attribution and actions without speculation."
)
TEXT_ENCODER_OUT_LAYERS: Tuple[int, ...] = (10, 20, 30)


@functools.partial(jax.jit, static_argnames=("dit_cfg", "length", "hw"))
def _flux2_denoise_chunk(params, lat, prompt_emb, guidance, timesteps,
                         sigmas, start,
                         *, dit_cfg: Flux2DiTConfig, length: int, hw):
    img_ids = prepare_image_ids(*hw)

    def step(i, x):
        t = jnp.broadcast_to(timesteps[i] / 1000.0, (x.shape[0],))
        v = flux2_dit_forward(params, dit_cfg, x, t, prompt_emb, guidance,
                              img_ids=img_ids)
        return x + v.astype(x.dtype) * (sigmas[i + 1] - sigmas[i]).astype(x.dtype)

    return jax.lax.fori_loop(start, start + length, step, lat)


@dataclasses.dataclass
class Flux2ImagePipeline:
    dit_params: Any = None
    dit_cfg: Flux2DiTConfig = None
    vae_params: Any = None
    vae_cfg: AutoencoderKLConfig = None
    te_params: Any = None
    te_cfg: Any = None
    tokenizer: Any = None
    mesh: Any = None  # jax.sharding.Mesh for tensor-parallel weights
    dtype: Any = jnp.bfloat16
    steps_per_dispatch: int = 10

    def use_mesh(self, mesh):
        """Shard the 32B DiT weights over the mesh's ``tensor`` axis
        (head-aligned q/k/v + SwiGLU col/row splits,
        parallel/tensor_parallel.py) — 32B bf16 does not fit ANY single
        v5e chip; this is the mandatory scale-out path."""
        from ..parallel.tensor_parallel import (
            shard_flux2_dit_params,
            shard_vl_text_params,
        )

        self.mesh = mesh
        self.dit_params = shard_flux2_dit_params(
            self.dit_params, mesh, num_heads=self.dit_cfg.num_heads)
        if self.te_params is not None:
            # the Mistral-Small encoder is 24B — shard it too
            self.te_params = shard_vl_text_params(
                self.te_params, mesh, self.te_cfg.num_heads,
                self.te_cfg.num_kv_heads)
        return self

    def quantize(self):
        """Swap the double/single-block projections to W8A8 int8
        (ops/quant.py — the TPU port of the reference's FP8 linear,
        ``core/vram/layers.py:321-357``); also halves the 32B DiT's
        weight footprint.  Embedders/modulation/head stay bf16."""
        from ..ops.quant import quantize_image_dit_params

        self.dit_params = quantize_image_dit_params(self.dit_params,
                                                    consume=True)
        return self

    @classmethod
    def from_pretrained(cls, model_paths, tokenizer_path=None,
                        dtype=jnp.bfloat16, hints=None):
        from ..core.model_pool import ModelPool

        pool = ModelPool().load(model_paths, dtype=dtype, hints=hints)
        dit = pool.fetch_model("flux2_dit")
        vae = pool.fetch_model("flux2_vae")
        te = pool.fetch_model("flux2_text_encoder")
        pipe = cls(
            dit_params=dit[0] if dit else None,
            dit_cfg=dit[1] if dit else None,
            vae_params=vae[0] if vae else None,
            vae_cfg=vae[1] if vae else None,
            te_params=te[0] if te else None,
            te_cfg=te[1] if te else None,
            dtype=dtype,
        )
        if tokenizer_path is not None:
            from transformers import AutoTokenizer

            pipe.tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)
        return pipe

    def encode_prompt(self, prompt: str, max_sequence_length: int = 512):
        """Mistral-3 chat template -> hidden layers (10, 20, 30) stacked to
        (1, L, 3*dim) (reference get_mistral_3_small_prompt_embeds,
        flux2_image.py:170-222)."""
        from ..models.qwen.text_encoder import qwen_vl_text_encode

        assert self.tokenizer is not None
        messages = [
            {"role": "system", "content": SYSTEM_MESSAGE},
            {"role": "user", "content": prompt.replace("[IMG]", "")},
        ]
        enc = self.tokenizer.apply_chat_template(
            messages, add_generation_prompt=False, tokenize=True,
            return_dict=True, return_tensors="np", padding="max_length",
            truncation=True, max_length=max_sequence_length)
        hs = qwen_vl_text_encode(
            self.te_params, self.te_cfg, jnp.asarray(enc["input_ids"]),
            attention_mask=jnp.asarray(enc["attention_mask"]),
            hidden_state_indices=TEXT_ENCODER_OUT_LAYERS)
        # stack (B, n, L, D) -> (B, L, n*D)
        out = jnp.stack(hs, axis=1)
        b, n, l, d = out.shape
        return out.transpose(0, 2, 1, 3).reshape(b, l, n * d).astype(
            self.dtype)

    def __call__(
        self,
        prompt: Optional[str] = None,
        embedded_guidance: float = 4.0,
        input_image=None,
        denoising_strength: float = 1.0,
        height: int = 1024,
        width: int = 1024,
        seed: Optional[int] = None,
        num_inference_steps: int = 28,
        prompt_emb=None,
        latents=None,
        output_type: str = "np",
    ):
        assert height % 16 == 0 and width % 16 == 0, (height, width)
        sched = FlowMatchScheduler("FLUX.2").set_timesteps(
            num_inference_steps, denoising_strength=denoising_strength,
            dynamic_shift_len=(height // 16) * (width // 16))
        timesteps = jnp.asarray(sched.timesteps, jnp.float32)
        sigmas = jnp.asarray(np.append(sched.sigmas, 0.0), jnp.float32)

        if prompt_emb is None:
            prompt_emb = self.encode_prompt(prompt)

        ht, wt = height // 16, width // 16
        if latents is not None:
            noise = jnp.asarray(latents, self.dtype)
        else:
            packed = self.dit_cfg.in_channels
            noise = generate_noise((1, packed, ht, wt),
                                   seed=0 if seed is None else seed)
            noise = noise.reshape(1, packed, ht * wt).transpose(0, 2, 1)
            noise = noise.astype(self.dtype)
        if input_image is not None:
            from ..core.imaging import preprocess_image

            arr = jnp.asarray(preprocess_image(input_image)[None],
                              jnp.float32)
            z0 = flux2_vae_encode(
                jax.tree.map(lambda a: a.astype(jnp.float32),
                             self.vae_params), self.vae_cfg, arr
            ).astype(self.dtype)
            lat = sched.add_noise(z0, noise, 0).astype(self.dtype)
        else:
            lat = noise

        guidance = jnp.full((1,), embedded_guidance, jnp.float32)
        n = len(sched.timesteps)
        s = 0
        while s < n:
            ln = min(self.steps_per_dispatch, n - s)
            lat = _flux2_denoise_chunk(
                self.dit_params, lat, prompt_emb, guidance, timesteps,
                sigmas, jnp.int32(s),
                dit_cfg=self.dit_cfg, length=ln, hw=(ht, wt),
            )
            s += ln

        if output_type == "latent":
            return lat
        image = flux2_vae_decode(
            jax.tree.map(lambda a: a.astype(jnp.float32), self.vae_params),
            self.vae_cfg, lat.astype(jnp.float32), ht, wt)
        from ..core.imaging import postprocess_image

        arr = postprocess_image(np.asarray(image[0]))
        if output_type == "pil":
            from PIL import Image

            return Image.fromarray(arr)
        return arr
