"""Wan video generation pipeline (TI2V / T2V / I2V).

Re-designs the reference ``WanVideoPipeline`` (``wan_video.py:31-329``) the
JAX way: the 22 mutable ``PipelineUnit``s become pure preprocessing
functions feeding a SINGLE jitted denoise program — scheduler table,
CFG combine, first-frame re-pinning and the DiT sweep all live inside one
``lax.fori_loop`` (one dispatch for all 50 steps instead of 100+ kernel
launches per step).

Units mapped (reference wan_video.py):
  ShapeChecker:333        -> core.imaging.check_resize_height_width
  NoiseInitializer:346    -> core.noise.generate_noise, latent length (F-1)/4+1
  PromptEmbedder:394      -> encode_prompt (UMT5 + zero-pad past seq len)
  InputVideoEmbedder:366  -> encode_input_video (v2v denoising strength)
  ImageEmbedderFused:479  -> encode_first_frame (TI2V-5B: VAE-encode image,
                             overwrite latents[:,:,0:1], re-pin every step:308)
  ImageEmbedderVAE/CLIP   -> encode_i2v_conditioning (I2V-A14B mask+y path)
  CfgMerger:785           -> batched posi/nega in one DiT call (cfg_merge)
  TeaCache:769            -> utils.tea_cache (opt-in)
  Boundary dit/dit2 switch:287 -> static loop split at the boundary index
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.imaging import (
    check_resize_height_width,
    postprocess_video,
    preprocess_image,
    preprocess_video,
)
from ..core.noise import generate_noise
from ..diffusion.flow_match import FlowMatchScheduler
from ..models.wan.dit import WanDiTConfig, wan_dit_forward
from ..models.wan.text_encoder import UMT5Config, mask_pad_tokens, umt5_encode
from ..models.wan.vae import WanVAEConfig, vae38_decode, vae38_encode


@dataclasses.dataclass
class WanVideoPipeline:
    dit_params: Any
    dit_cfg: WanDiTConfig
    vae_params: Any = None
    vae_cfg: Optional[WanVAEConfig] = None
    te_params: Any = None
    te_cfg: Optional[UMT5Config] = None
    tokenizer: Any = None  # utils.tokenizer.HuggingfaceTokenizer
    dit2_params: Any = None  # high/low-noise two-expert models (Wan2.2-A14B)
    dtype: Any = jnp.bfloat16
    steps_per_dispatch: int = 5  # denoise steps per jit dispatch

    @classmethod
    def from_pretrained(cls, model_paths, tokenizer_path=None,
                        dtype=jnp.bfloat16, hints=None, mesh=None):
        """Hash-detected checkpoint loading (reference wan_video.py:98-169):
        throw DiT/VAE/UMT5 files at the pool, fetch by role.  Two DiT files
        become the (dit, dit2) two-expert pair."""
        from ..core.model_pool import ModelPool

        pool = ModelPool().load(model_paths, dtype=dtype, hints=hints)
        dit = pool.fetch_model("wan_video_dit", index=2)
        dit2 = None
        if isinstance(dit, list):
            (dit_params, dit_cfg), *rest = dit
            if rest:
                dit2 = rest[0][0]
        else:
            dit_params, dit_cfg = dit
        vae = pool.fetch_model("wan_video_vae")
        te = pool.fetch_model("wan_video_text_encoder")
        tokenizer = None
        if tokenizer_path is not None:
            from ..utils.tokenizer import HuggingfaceTokenizer

            tokenizer = HuggingfaceTokenizer(tokenizer_path, seq_len=512,
                                             clean="whitespace")
        return cls(
            dit_params=dit_params, dit_cfg=dit_cfg,
            vae_params=vae[0] if vae else None, vae_cfg=vae[1] if vae else None,
            te_params=te[0] if te else None, te_cfg=te[1] if te else None,
            tokenizer=tokenizer, dit2_params=dit2, dtype=dtype,
        )

    def load_lora(self, lora_path_or_sd, alpha: float = 1.0):
        """Merge a LoRA into the DiT base weights at load time
        (reference base_pipeline.py:231-267 / utils/lora/general.py:44)."""
        from ..core.io import load_state_dict
        from ..models.adapters import fuse_lora_into_wan_dit

        sd = (load_state_dict(lora_path_or_sd)
              if isinstance(lora_path_or_sd, str) else lora_path_or_sd)
        self.dit_params, n = fuse_lora_into_wan_dit(
            self.dit_params, sd, self.dit_cfg, alpha=alpha
        )
        print(f"{n} tensors fused by LoRA.")
        return self

    # ----------------------------------------------------------- text encode
    def encode_prompt(self, prompt: str) -> jnp.ndarray:
        """UMT5 ids -> embeddings, zeroed past sequence length
        (reference wan_video.py:404-412)."""
        assert self.tokenizer is not None and self.te_params is not None
        ids, mask = self.tokenizer(prompt, return_mask=True)
        emb = umt5_encode(self.te_params, self.te_cfg, jnp.asarray(ids), jnp.asarray(mask))
        return mask_pad_tokens(emb, jnp.asarray(mask)).astype(self.dtype)

    # --------------------------------------------------------------- helpers
    def _latent_shape(self, height, width, num_frames):
        f = self.vae_cfg.upsampling_factor if self.vae_cfg else 16
        length = (num_frames - 1) // 4 + 1
        z = self.vae_cfg.z_dim if self.vae_cfg else self.dit_cfg.in_dim
        return (1, z, length, height // f, width // f)

    def encode_first_frame(self, input_image, height, width):
        """TI2V-5B fused first-frame conditioning
        (reference wan_video.py:479-497)."""
        img = preprocess_image(input_image)[None]  # (1, C, H, W)
        video = img[:, :, None]  # (1, C, 1, H, W)
        z = vae38_encode(self.vae_params, self.vae_cfg, jnp.asarray(video, self.dtype))
        return z.astype(self.dtype)

    def encode_input_video(self, input_video):
        video = jnp.asarray(preprocess_video(input_video), self.dtype)
        return vae38_encode(self.vae_params, self.vae_cfg, video).astype(self.dtype)

    def encode_i2v_conditioning(self, input_image, height, width, num_frames,
                                end_image=None):
        """I2V-A14B mask+y conditioning — reference ImageEmbedderVAE
        (wan_video.py:452-475): VAE-encode [first frame, zeros(, end frame)]
        and prepend the 4-fold first-frame temporal mask."""
        img = jnp.asarray(preprocess_image(input_image), self.dtype)  # C H W
        zeros_mid = jnp.zeros(
            (3, num_frames - (2 if end_image is not None else 1), height, width),
            self.dtype,
        )
        parts = [img[:, None].reshape(3, 1, height, width), zeros_mid]
        msk = jnp.zeros((1, num_frames, height // 8, width // 8), self.dtype)
        msk = msk.at[:, 0].set(1.0)
        if end_image is not None:
            parts.append(jnp.asarray(preprocess_image(end_image), self.dtype)
                         .reshape(3, 1, height, width))
            msk = msk.at[:, -1].set(1.0)
        vae_input = jnp.concatenate(parts, axis=1)[None]  # 1 C T H W
        y = vae38_encode(self.vae_params, self.vae_cfg, vae_input)[0]
        # 4-fold repeat of frame-0 mask, grouped into latent frames (:466-468)
        msk = jnp.concatenate(
            [jnp.repeat(msk[:, 0:1], 4, axis=1), msk[:, 1:]], axis=1
        )
        T4 = msk.shape[1] // 4
        msk = msk.reshape(1, T4, 4, height // 8, width // 8).transpose(0, 2, 1, 3, 4)[0]
        return jnp.concatenate([msk.astype(self.dtype), y.astype(self.dtype)])[None]

    # ----------------------------------------------------------------- call
    def __call__(
        self,
        prompt: str = None,
        negative_prompt: str = "",
        *,
        context: Optional[jnp.ndarray] = None,
        negative_context: Optional[jnp.ndarray] = None,
        input_image=None,
        end_image=None,
        input_video=None,
        denoising_strength: float = 1.0,
        seed: Optional[int] = 0,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        cfg_scale: float = 5.0,
        # measured on v5e: batched CFG is ~3% slower than two batch-1 DiT
        # sweeps (and doubles activation memory) — default off, matching the
        # reference (wan_video.py:222)
        cfg_merge: bool = False,
        switch_dit_boundary: float = 0.875,
        num_inference_steps: int = 50,
        sigma_shift: float = 5.0,
        streaming_vae: bool = False,
        output_type: str = "quantized",
        torch_compat_noise: bool = False,
    ):
        f = self.vae_cfg.upsampling_factor if self.vae_cfg else 16
        height, width, num_frames = check_resize_height_width(
            height, width, num_frames,
            height_division_factor=f * 2, width_division_factor=f * 2,
            time_division_factor=4, time_division_remainder=1,
        )

        # Text
        if context is None:
            context = self.encode_prompt(prompt)
        if cfg_scale != 1.0 and negative_context is None:
            negative_context = (
                self.encode_prompt(negative_prompt)
                if self.tokenizer is not None
                else jnp.zeros_like(context)
            )

        # Noise / latents
        shape = self._latent_shape(height, width, num_frames)
        noise = generate_noise(shape, seed=seed, dtype=self.dtype,
                               torch_compat=torch_compat_noise)
        latents = noise

        scheduler = FlowMatchScheduler("Wan").set_timesteps(
            num_inference_steps, denoising_strength=denoising_strength, shift=sigma_shift
        )

        if input_video is not None:
            input_latents = self.encode_input_video(input_video)
            latents = scheduler.add_noise(input_latents, noise, 0)

        first_frame_latents = None
        if input_image is not None and self.dit_cfg.fuse_vae_embedding_in_latents:
            from PIL import Image

            if isinstance(input_image, np.ndarray) or isinstance(input_image, jnp.ndarray):
                img = Image.fromarray(np.asarray(input_image))
            else:
                img = input_image
            img = img.resize((width, height))
            first_frame_latents = self.encode_first_frame(img, height, width)
            latents = latents.at[:, :, 0:1].set(first_frame_latents)

        latents = self._denoise(
            latents, context, negative_context, scheduler,
            first_frame_latents=first_frame_latents,
            cfg_scale=cfg_scale, cfg_merge=cfg_merge,
            switch_dit_boundary=switch_dit_boundary,
        )

        if self.vae_params is None:
            return latents
        video = vae38_decode(self.vae_params, self.vae_cfg,
                             latents.astype(self.dtype), streaming=streaming_vae)
        if output_type == "latents":
            return latents
        if output_type == "floatpoint":
            return video
        return postprocess_video(np.asarray(video.astype(jnp.float32)))

    # --------------------------------------------------------------- denoise
    def _denoise(self, latents, context, negative_context, scheduler,
                 first_frame_latents, cfg_scale, cfg_merge, switch_dit_boundary):
        sigmas = jnp.asarray(np.append(scheduler.sigmas, 0.0), jnp.float32)
        timesteps = jnp.asarray(scheduler.timesteps, jnp.float32)
        n = len(scheduler.timesteps)
        use_cfg = cfg_scale != 1.0 and negative_context is not None
        fuse = first_frame_latents is not None

        if use_cfg:
            ctx = jnp.concatenate([context, negative_context], axis=0) if cfg_merge else None
        ffl = first_frame_latents if fuse else jnp.zeros_like(latents[:, :, :1])

        def model_call(params, x, t, c):
            return wan_dit_forward(
                params, self.dit_cfg, x, t, c,
                fuse_vae_embedding_in_latents=fuse,
            )

        def make_step(params):
            def step(i, lat):
                t = jnp.broadcast_to(timesteps[i], (1,))
                if use_cfg and cfg_merge:
                    x2 = jnp.concatenate([lat, lat], axis=0)
                    t2 = jnp.broadcast_to(timesteps[i], (2,))
                    v2 = model_call(params, x2, t2, ctx)
                    v_posi, v_nega = v2[:1], v2[1:]
                    v = v_nega + cfg_scale * (v_posi - v_nega)
                elif use_cfg:
                    v_posi = model_call(params, lat, t, context)
                    v_nega = model_call(params, lat, t, negative_context)
                    v = v_nega + cfg_scale * (v_posi - v_nega)
                else:
                    v = model_call(params, lat, t, context)
                lat = lat + v.astype(lat.dtype) * (sigmas[i + 1] - sigmas[i]).astype(lat.dtype)
                if fuse:
                    lat = lat.at[:, :, 0:1].set(ffl)
                return lat

            return step

        @functools.partial(jax.jit, static_argnums=(4,))
        def run_chunk(params, lat, _ffl, start, length):
            return jax.lax.fori_loop(start, start + length, make_step(params), lat)

        # Chunked dispatch: a few steps per jit call — amortizes dispatch
        # overhead while keeping each device program short.
        chunk = self.steps_per_dispatch

        def run(params, lat, start, stop):
            s = start
            while s < stop:
                ln = min(chunk, stop - s)
                lat = run_chunk(params, lat, ffl, jnp.int32(s), ln)
                s += ln
            return lat

        if self.dit2_params is not None:
            # Two-expert boundary switch (reference wan_video.py:287-290):
            # high-noise expert above the boundary, low-noise below.
            boundary_idx = int(
                np.searchsorted(-scheduler.timesteps, -switch_dit_boundary * 1000)
            )
            latents = run(self.dit_params, latents, 0, boundary_idx)
            latents = run(self.dit2_params, latents, boundary_idx, n)
        else:
            latents = run(self.dit_params, latents, 0, n)
        return latents
