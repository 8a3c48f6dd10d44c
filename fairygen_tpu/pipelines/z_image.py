"""Z-Image (Turbo) text-to-image pipeline.

Port of the reference ``ZImagePipeline``
(``animation/diffsynth/pipelines/z_image.py:19-257``): Qwen3 chat-template
prompt -> penultimate hidden states (unpadded), FlowMatch "Z-Image"
template, the model_fn's timestep inversion ``(1000-t)/1000`` and output
negation, optional true CFG (Turbo default 1.0), img2img start, FLUX VAE
encode/decode (Z-Image ships with the FLUX.1 16-channel VAE).

TPU-native: chunked module-scope-jitted denoise loop.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.noise import generate_noise
from ..diffusion.flow_match import FlowMatchScheduler
from ..models.flux.vae import AutoencoderKLConfig, vae_decode, vae_encode
from ..models.z_image.dit import ZImageDiTConfig, z_image_dit_forward


@functools.partial(jax.jit, static_argnames=("dit_cfg", "length", "do_cfg"))
def _z_denoise_chunk(params, lat, prompt_emb, neg_prompt_emb, timesteps,
                     sigmas, cfg_scale, start,
                     *, dit_cfg: ZImageDiTConfig, length: int, do_cfg: bool):
    def sweep(x, t, ctx):
        # model_fn_z_image (z_image.py:247-256): t -> (1000-t)/1000, -out
        tt = (1000.0 - t) / 1000.0
        return -z_image_dit_forward(params, dit_cfg, x, tt, ctx)

    def step(i, x):
        t = jnp.broadcast_to(timesteps[i], (x.shape[0],))
        v = sweep(x, t, prompt_emb)
        if do_cfg:
            v_n = sweep(x, t, neg_prompt_emb)
            v = v_n + cfg_scale.astype(v.dtype) * (v - v_n)
        return x + v.astype(x.dtype) * (sigmas[i + 1] - sigmas[i]).astype(x.dtype)

    return jax.lax.fori_loop(start, start + length, step, lat)


@dataclasses.dataclass
class ZImagePipeline:
    dit_params: Any = None
    dit_cfg: ZImageDiTConfig = None
    vae_params: Any = None
    vae_cfg: AutoencoderKLConfig = None
    te_params: Any = None
    te_cfg: Any = None
    tokenizer: Any = None
    dtype: Any = jnp.bfloat16
    steps_per_dispatch: int = 10

    @classmethod
    def from_pretrained(cls, model_paths, tokenizer_path=None,
                        dtype=jnp.bfloat16, hints=None):
        from ..core.model_pool import ModelPool

        pool = ModelPool().load(model_paths, dtype=dtype, hints=hints)
        dit = pool.fetch_model("z_image_dit")
        vae = pool.fetch_model("flux_vae_encoder")
        te = pool.fetch_model("z_image_text_encoder")
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

    def quantize(self):
        """Swap the DiT layers' + refiners' projections to W8A8 int8
        (ops/quant.py — the TPU port of the reference's FP8 linear,
        ``core/vram/layers.py:321-357``).  adaln/embedders/head stay
        bf16.  Pairs with the Turbo few-step path for fastest t2i."""
        from ..ops.quant import quantize_image_dit_params

        self.dit_params = quantize_image_dit_params(self.dit_params,
                                                    consume=True)
        return self

    def encode_prompt(self, prompt: str, max_sequence_length: int = 512):
        """Qwen3 chat template (enable_thinking) -> penultimate hidden,
        unpadded (reference ZImageUnit_PromptEmbedder, z_image.py:152-195)."""
        from ..models.qwen.text_encoder import qwen_vl_text_encode

        assert self.tokenizer is not None
        text = self.tokenizer.apply_chat_template(
            [{"role": "user", "content": prompt}], tokenize=False,
            add_generation_prompt=True, enable_thinking=True)
        enc = self.tokenizer(text, max_length=max_sequence_length,
                             truncation=True, return_tensors="np")
        hidden = qwen_vl_text_encode(self.te_params, self.te_cfg,
                                     jnp.asarray(enc.input_ids),
                                     hidden_state_index=-2)
        return hidden.astype(self.dtype)

    def _encode_image(self, image):
        from ..core.imaging import preprocess_image

        arr = jnp.asarray(preprocess_image(image)[None], jnp.float32)
        mean = vae_encode(self.vae_params, self.vae_cfg, arr)
        z = (mean - self.vae_cfg.shift_factor) * self.vae_cfg.scaling_factor
        return z.astype(self.dtype)

    def __call__(
        self,
        prompt: Optional[str] = None,
        negative_prompt: str = "",
        cfg_scale: float = 1.0,  # Z-Image-Turbo is guidance-distilled
        input_image=None,
        denoising_strength: float = 1.0,
        height: int = 1024,
        width: int = 1024,
        seed: Optional[int] = None,
        num_inference_steps: int = 8,
        prompt_emb=None,
        negative_prompt_emb=None,
        latents=None,
        output_type: str = "np",
    ):
        assert height % 16 == 0 and width % 16 == 0, (height, width)
        sched = FlowMatchScheduler("Z-Image").set_timesteps(
            num_inference_steps, denoising_strength=denoising_strength)
        timesteps = jnp.asarray(sched.timesteps, jnp.float32)
        sigmas = jnp.asarray(np.append(sched.sigmas, 0.0), jnp.float32)

        if prompt_emb is None:
            prompt_emb = self.encode_prompt(prompt)
        do_cfg = cfg_scale != 1.0
        if do_cfg and negative_prompt_emb is None:
            negative_prompt_emb = self.encode_prompt(negative_prompt)

        zc = self.vae_cfg.latent_channels if self.vae_cfg else \
            self.dit_cfg.in_channels
        if latents is not None:
            noise = jnp.asarray(latents, self.dtype)
        else:
            noise = generate_noise((1, zc, height // 8, width // 8),
                                   seed=0 if seed is None else seed
                                   ).astype(self.dtype)
        if input_image is not None:
            z0 = self._encode_image(input_image)
            lat = sched.add_noise(z0, noise, 0).astype(self.dtype)
        else:
            lat = noise

        cfg_t = jnp.float32(cfg_scale)
        n = len(sched.timesteps)
        s = 0
        while s < n:
            ln = min(self.steps_per_dispatch, n - s)
            lat = _z_denoise_chunk(
                self.dit_params, lat, prompt_emb, negative_prompt_emb,
                timesteps, sigmas, cfg_t, jnp.int32(s),
                dit_cfg=self.dit_cfg, length=ln, do_cfg=do_cfg,
            )
            s += ln

        if output_type == "latent":
            return lat
        z = lat.astype(jnp.float32) / self.vae_cfg.scaling_factor \
            + self.vae_cfg.shift_factor
        image = vae_decode(
            jax.tree.map(lambda a: a.astype(jnp.float32), self.vae_params),
            self.vae_cfg, z)
        from ..core.imaging import postprocess_image

        arr = postprocess_image(np.asarray(image[0]))
        if output_type == "pil":
            from PIL import Image

            return Image.fromarray(arr)
        return arr
