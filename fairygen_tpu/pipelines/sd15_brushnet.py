"""SD1.5 + BrushNet inpainting pipeline.

Port of the reference ``StableDiffusionBrushNetPipeline``
(``src/diffusers/pipelines/brushnet/pipeline_brushnet.py:836-1280``) and its
entry point ``examples/brushnet/test_brushnet.py``:

  * single CLIP ViT-L text encoder (final-layer-norm hidden states);
  * mask binarized ``sum(channels) < 0`` after [-1,1] normalization (:1100);
  * ``conditioning_latents = VAE(masked_image)·sf ⊕ nearest-resized mask``
    (:1121-1129);
  * per-step BrushNet → UNet with per-sub-block add samples;
  * UniPC sampler (test_brushnet.py:31 swaps the DDPM config into
    ``UniPCMultistepScheduler``);
  * optional ``blended`` pixel paste: Gaussian-blurred mask composite of the
    original image outside the inpainting region (test_brushnet.py:55-67).

Same jitted-chunk design as pipelines/sdxl_brushnet.py: the whole denoise
loop is a few ``lax.fori_loop`` dispatches reused across prompts and seeds.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.noise import generate_noise
from ..diffusion.unipc import UniPCMultistepScheduler as _UniPC
from ..models.sdxl.clip import CLIPTextConfig, clip_text_encode
from ..models.sdxl.unet2d import UNet2DConfig, brushnet_forward, unet2d_forward
from ..models.sdxl.vae import AutoencoderKLConfig, vae_decode, vae_encode
from .sdxl_brushnet import _nearest_resize, _to_nchw_pm1

_vae_decode_jit = jax.jit(vae_decode, static_argnums=(1,))
_vae_encode_jit = jax.jit(vae_encode, static_argnums=(1, 3))


@functools.partial(
    jax.jit,
    static_argnames=("unet_cfg", "bn_cfg", "length", "do_cfg", "dtype"),
)
def _sd15_denoise_chunk(
    unet_params, bn_params, latents, state, ehs, cond_lat, keep_sched,
    guidance_scale, bn_scale, tables, start,
    *, unet_cfg, bn_cfg, length, do_cfg, dtype,
):
    use_bn = bn_params is not None and cond_lat is not None

    def step(i, carry):
        lat, st = carry
        t = tables["timesteps"][i]
        x_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
        kwargs = {}
        if use_bn:
            down, mid, up = brushnet_forward(
                bn_params, bn_cfg, x_in.astype(dtype), t, ehs.astype(dtype),
                cond_lat.astype(dtype),
                conditioning_scale=bn_scale * keep_sched[i],
            )
            kwargs = dict(
                down_block_add_samples=list(down),
                mid_block_add_sample=mid,
                up_block_add_samples=list(up),
            )
        noise_pred = unet2d_forward(
            unet_params, unet_cfg, x_in.astype(dtype), t, ehs.astype(dtype),
            **kwargs,
        ).astype(jnp.float32)
        if do_cfg:
            uncond, text = jnp.split(noise_pred, 2, axis=0)
            noise_pred = uncond + guidance_scale * (text - uncond)
        lat, st = _UniPC.step_from_tables(tables, st, noise_pred, i, lat)
        return (lat, st)

    return jax.lax.fori_loop(start, start + length, step, (latents, state))


@dataclasses.dataclass
class SD15BrushNetPipeline:
    unet_params: Any
    unet_cfg: UNet2DConfig
    vae_params: Any
    vae_cfg: AutoencoderKLConfig
    brushnet_params: Any = None
    brushnet_cfg: Optional[UNet2DConfig] = None
    te_params: Any = None
    te_cfg: Optional[CLIPTextConfig] = None
    tokenizer: Any = None
    dtype: Any = jnp.float32
    steps_per_dispatch: int = 10

    def encode_prompt(self, prompt: str):
        """SD1.5 text embedding: FINAL layer-norm hidden states (unlike
        SDXL's penultimate) — pipeline_brushnet.py encode_prompt."""
        ids = jnp.asarray(self.tokenizer(prompt))
        out = clip_text_encode(self.te_params, self.te_cfg, ids)
        return out["last_hidden_state"]

    def __call__(
        self,
        prompt: str = None,
        negative_prompt: str = "",
        *,
        prompt_embeds=None,  # (1, 77, 768)
        negative_prompt_embeds=None,
        image=None,  # masked init image, [0,1] HWC or (B,3,H,W) [-1,1]
        mask=None,  # [0,1], 1 = inpaint region
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        brushnet_conditioning_scale: float = 1.0,
        control_guidance_start: float = 0.0,
        control_guidance_end: float = 1.0,
        seed: int = 0,
        blended: bool = False,
        original_image=None,  # unmasked source (for blended paste)
        output_type: str = "np",
        torch_compat_noise: bool = False,
    ):
        do_cfg = guidance_scale > 1.0
        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(prompt)
        if do_cfg and negative_prompt_embeds is None:
            negative_prompt_embeds = self.encode_prompt(negative_prompt)

        sf = self.vae_cfg.scaling_factor
        sched = _UniPC(steps_offset=1)
        sched.set_timesteps(num_inference_steps)

        f = self.vae_cfg.downscale_factor
        latents = generate_noise(
            (1, self.vae_cfg.latent_channels, height // f, width // f),
            seed=seed, dtype=jnp.float32, torch_compat=torch_compat_noise,
        )

        use_brushnet = self.brushnet_params is not None and image is not None
        cond = None
        if use_brushnet:
            img = _to_nchw_pm1(image)
            msk = _to_nchw_pm1(mask, channels=None)
            original_mask = (jnp.sum(msk, axis=1, keepdims=True) < 0).astype(jnp.float32)
            cond_lat = _vae_encode_jit(self.vae_params, self.vae_cfg,
                                       img.astype(self.dtype))
            cond_lat = cond_lat.astype(jnp.float32) * sf
            m = _nearest_resize(original_mask, cond_lat.shape[-2], cond_lat.shape[-1])
            cond = jnp.concatenate([cond_lat, m], axis=1)
            if do_cfg:
                cond = jnp.concatenate([cond] * 2, axis=0)

        ehs = (jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
               if do_cfg else prompt_embeds)

        n = num_inference_steps
        keep_sched = jnp.asarray(
            [1.0 - float(i / n < control_guidance_start
                         or (i + 1) / n > control_guidance_end)
             for i in range(n)],
            jnp.float32,
        )
        state = sched.init_state(latents.shape)
        tables = sched.tables()
        bn_params = self.brushnet_params if use_brushnet else None
        s = 0
        while s < n:
            ln = min(self.steps_per_dispatch, n - s)
            latents, state = _sd15_denoise_chunk(
                self.unet_params, bn_params, latents, state, ehs, cond,
                keep_sched, jnp.asarray(guidance_scale, jnp.float32),
                jnp.asarray(brushnet_conditioning_scale, jnp.float32),
                tables, jnp.int32(s),
                unet_cfg=self.unet_cfg, bn_cfg=self.brushnet_cfg,
                length=ln, do_cfg=do_cfg, dtype=self.dtype,
            )
            s += ln

        if output_type == "latent":
            return latents
        image_out = _vae_decode_jit(
            self.vae_params, self.vae_cfg, (latents / sf).astype(jnp.float32)
        )
        if blended and original_image is not None and mask is not None:
            image_out = blend_with_original(image_out, original_image, mask)
        if output_type == "np_pm1":
            return image_out
        from ..core.imaging import postprocess_image

        return [postprocess_image(np.asarray(fr)) for fr in image_out]


def blend_with_original(image_pm1, original_image, mask,
                        blur_kernel: int = 21):
    """Gaussian-blurred mask paste (test_brushnet.py:55-67): keep the
    original pixels outside the (blur-softened) inpaint mask."""
    img = np.asarray(image_pm1.astype(jnp.float32))  # (B, 3, H, W) [-1,1]
    orig = np.asarray(_to_nchw_pm1(original_image), np.float32)
    m = np.asarray(_to_nchw_pm1(mask, channels=None), np.float32)
    m = (m.sum(1, keepdims=True) > 0).astype(np.float32)  # 1 = inpaint region

    # separable Gaussian blur, sigma from kernel size (cv2 convention:
    # sigma = 0.3*((k-1)*0.5 - 1) + 0.8)
    k = blur_kernel
    sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
    xs = np.arange(k) - (k - 1) / 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g /= g.sum()
    pad = k // 2
    mb = np.pad(m, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    mb = np.apply_along_axis(lambda a: np.convolve(a, g, mode="valid"), 2, mb)
    mb = np.apply_along_axis(lambda a: np.convolve(a, g, mode="valid"), 3, mb)
    m_soft = 1.0 - (1.0 - m) * (1.0 - mb)
    out = orig * (1.0 - m_soft) + img * m_soft
    return jnp.asarray(out)
