"""Qwen-Image text-to-image pipeline (t2i / img2img / Edit).

Port of the reference ``QwenImagePipeline``
(``animation/diffsynth/pipelines/qwen_image.py``) core path: chat-template
prompt encoding through Qwen2.5-VL (drop the 34 template tokens,
:348-358), seeded noise, FlowMatch "Qwen-Image" template with dynamic
shift from the latent token count, true CFG (default 4.0), optional
input-image start, Qwen-Image-Edit reference images as extra packed
latents, fp32 VAE decode.

TPU-native: chunked module-scope-jitted denoise loop (one compiled
program per resolution).  Blockwise ControlNet, EliGen entity control,
inpaint blending, layered generation, zero_cond_t, context images,
Image2LoRA, and edit rope interpolation all ride the same jitted sweep.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.noise import generate_noise
from ..diffusion.flow_match import FlowMatchScheduler
from ..models.qwen.dit import QwenImageDiTConfig, qwen_image_dit_forward
from ..models.qwen.vae import (
    WanVAEConfig,
    qwen_image_vae_decode,
    qwen_image_vae_encode,
)

PROMPT_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, shape, "
    "size, texture, quantity, text, spatial relationships of the objects "
    "and background:<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
    "<|im_start|>assistant\n"
)
TEMPLATE_DROP_IDX = 34  # reference qwen_image.py:350
EDIT_PROMPT_TEMPLATE = (
    "<|im_start|>system\nDescribe the key features of the input image "
    "(color, shape, size, texture, objects, background), then explain how "
    "the user's text instruction should alter or modify the image. "
    "Generate a new image that meets the user's requirements while "
    "maintaining consistency with the original input where appropriate."
    "<|im_end|>\n<|im_start|>user\n<|vision_start|><|image_pad|>"
    "<|vision_end|>{}<|im_end|>\n<|im_start|>assistant\n"
)
EDIT_TEMPLATE_DROP_IDX = 64  # reference qwen_image.py:362
EDIT_MULTI_TEMPLATE = (
    "<|im_start|>system\nDescribe the key features of the input image "
    "(color, shape, size, texture, objects, background), then explain how "
    "the user's text instruction should alter or modify the image. "
    "Generate a new image that meets the user's requirements while "
    "maintaining consistency with the original input where appropriate."
    "<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
)  # multi-image variant: "Picture i:" slots prepended (qwen_image.py:371)


@functools.partial(
    jax.jit, static_argnames=("dit_cfg", "length", "do_cfg", "n_edit",
                              "cn_scales", "layered", "zero_cond_t",
                              "edit_rope_interpolation"),
)
def _qwen_denoise_chunk(
    params, lat, prompt_emb, neg_prompt_emb, edit_latents, timesteps, sigmas,
    cfg_scale, start, cn_blocks=(), cn_conds=(), entity_embs=(),
    entity_embs_neg=(), entity_masks=None, input_latents=None,
    inpaint_mask=None,
    *, dit_cfg: QwenImageDiTConfig, length: int, do_cfg: bool, n_edit: int,
    cn_scales: tuple = (), layered: bool = False, zero_cond_t: bool = False,
    edit_rope_interpolation: bool = False,
):
    edits = list(edit_latents) if n_edit else None
    bw = tuple(zip(cn_blocks, cn_conds, cn_scales))

    def sweep(x, t, ctx, ents):
        return qwen_image_dit_forward(
            params, dit_cfg, x, t, ctx, edit_latents=edits,
            blockwise_controlnet=bw, layered=layered,
            zero_cond_t=zero_cond_t,
            edit_rope_interpolation=edit_rope_interpolation,
            entity_prompt_embs=list(ents) if ents else None,
            entity_masks=entity_masks if ents else None)

    def step(i, x):
        t = jnp.broadcast_to(timesteps[i], (1,))
        v = sweep(x, t, prompt_emb, entity_embs)
        if do_cfg:
            v_n = sweep(x, t, neg_prompt_emb, entity_embs_neg)
            v = v_n + cfg_scale.astype(v.dtype) * (v - v_n)
        if inpaint_mask is not None:
            # BasePipeline.step inpaint blend (base_pipeline.py:209-215):
            # masked-out regions follow the velocity returning to the
            # input latents exactly
            v_exp = (x - input_latents.astype(x.dtype)) \
                / sigmas[i].astype(x.dtype)
            m = inpaint_mask.astype(x.dtype)
            v = v_exp * (1 - m) + v * m
        return x + v.astype(x.dtype) * (sigmas[i + 1] - sigmas[i]).astype(x.dtype)

    return jax.lax.fori_loop(start, start + length, step, lat)


@dataclasses.dataclass
class QwenImagePipeline:
    dit_params: Any = None
    dit_cfg: QwenImageDiTConfig = None
    vae_params: Any = None
    vae_cfg: WanVAEConfig = None
    te_params: Any = None
    te_cfg: Any = None
    vision_params: Any = None  # Qwen2.5-VL vision tower (Edit prompts)
    vision_cfg: Any = None
    tokenizer: Any = None  # transformers Qwen2 tokenizer (local path)
    blockwise_controlnets: Any = None  # list of (params, cfg)
    siglip2_image_encoder: Any = None  # (params, SiglipVisionConfig)
    dinov3_image_encoder: Any = None  # (params, DINOv3Config)
    image2lora_style: Any = None  # (params, QwenImage2LoRAConfig)
    image2lora_coarse: Any = None
    image2lora_fine: Any = None
    mesh: Any = None  # jax.sharding.Mesh for tensor-parallel weights
    te_offload: bool = False  # text/vision towers live in host RAM,
    # onloaded per encode_prompt* call (core/offload.py — the reference's
    # VRAM onload/offload per pipeline unit, base_pipeline.py:146-168)
    dtype: Any = jnp.bfloat16
    steps_per_dispatch: int = 10

    def use_mesh(self, mesh):
        """Shard the 20B DiT weights over the mesh's ``tensor`` axis
        (head-aligned q/k/v + Megatron MLP splits,
        parallel/tensor_parallel.py) — the fit path on 16 GB v5e chips."""
        from ..parallel.tensor_parallel import (
            shard_qwen_image_dit_params,
            shard_vl_text_params,
        )

        self.mesh = mesh
        self.dit_params = shard_qwen_image_dit_params(
            self.dit_params, mesh, num_heads=self.dit_cfg.num_heads)
        if self.te_params is not None and \
                self.te_cfg.num_heads % mesh.shape["tensor"] == 0:
            self.te_params = shard_vl_text_params(
                self.te_params, mesh, self.te_cfg.num_heads,
                self.te_cfg.num_kv_heads)
        return self

    def quantize(self):
        """Swap the 60 MMDiT blocks' projections to W8A8 int8
        (ops/quant.py — the TPU port of the reference's FP8 linear,
        ``core/vram/layers.py:321-357``).  img_mod/txt_mod and the
        embedders/head stay bf16.  Call AFTER load_lora."""
        from ..ops.quant import quantize_image_dit_params

        self.dit_params = quantize_image_dit_params(self.dit_params,
                                                    consume=True)
        return self

    @classmethod
    def from_pretrained(cls, model_paths, tokenizer_path=None,
                        dtype=jnp.bfloat16, hints=None, quantize=False,
                        offload_text_encoder: bool = False):
        """quantize: False | True (quality skip list — modulation linears
        stay bf16) | "fit" (quantize them too: the ~19.2B-param DiT
        -> ~19 GiB int8 — still beyond one 16 GB v5e, so pair "fit" with
        ``use_mesh`` TP over >=2 chips, or one >=24 GB chip (v6e/v5p)).
        offload_text_encoder: keep the 8B VL tower in host RAM, onloaded
        per encode_prompt call (the reference needs its FP8+offload VRAM
        machinery for the same reason, core/vram/layers.py)."""
        from ..core.model_pool import ModelPool
        from ..core.offload import host_load_context, to_accelerator

        host = bool(quantize) or offload_text_encoder
        with host_load_context(host):
            pool = ModelPool().load(model_paths, dtype=dtype, hints=hints)
        dit = pool.fetch_model("qwen_image_dit")
        vae = pool.fetch_model("qwen_image_vae")
        te = pool.fetch_model("qwen_image_text_encoder")
        te_params, te_cfg = (te[0], te[1]) if te else (None, None)
        vis_params = vis_cfg = None
        if isinstance(te_params, dict) and "vision" in te_params:
            vis_params = te_params["vision"]
            te_params = te_params["text"]
            te_cfg, vis_cfg = te_cfg
        pipe = cls(
            dit_params=dit[0] if dit else None,
            dit_cfg=dit[1] if dit else None,
            vae_params=vae[0] if vae else None,
            vae_cfg=vae[1] if vae else None,
            te_params=te_params, te_cfg=te_cfg,
            vision_params=vis_params, vision_cfg=vis_cfg,
            blockwise_controlnets=pool.fetch_model(
                "qwen_image_blockwise_controlnet", index="all"),
            siglip2_image_encoder=pool.fetch_model("siglip2_image_encoder"),
            dinov3_image_encoder=pool.fetch_model("dinov3_image_encoder"),
            image2lora_style=pool.fetch_model("qwen_image_image2lora_style"),
            image2lora_coarse=pool.fetch_model(
                "qwen_image_image2lora_coarse"),
            image2lora_fine=pool.fetch_model("qwen_image_image2lora_fine"),
            te_offload=offload_text_encoder,
            dtype=dtype,
        )
        if quantize and pipe.dit_params is not None:
            from ..ops.quant import _FIT_SKIP, quantize_image_dit_params

            kw = {"skip_substrings": _FIT_SKIP} if quantize == "fit" else {}
            pipe.dit_params = quantize_image_dit_params(
                pipe.dit_params, consume=True, **kw)
        if host:
            pipe.dit_params = to_accelerator(pipe.dit_params)
            pipe.vae_params = to_accelerator(pipe.vae_params)
            if not offload_text_encoder:
                pipe.te_params = to_accelerator(pipe.te_params)
                pipe.vision_params = to_accelerator(pipe.vision_params)
        if tokenizer_path is not None:
            from transformers import AutoTokenizer

            pipe.tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)
        return pipe

    def _te(self):
        """Text-tower params for one encode call — onloaded to HBM and
        freed afterwards when te_offload is set (core/offload.py)."""
        from ..core.offload import StagedParams

        if self.te_offload:
            return StagedParams(self.te_params).use()
        import contextlib

        return contextlib.nullcontext(self.te_params)

    def _vision(self):
        """Vision-tower params for one encode call (same onload/offload
        contract as ``_te``)."""
        from ..core.offload import StagedParams

        if self.te_offload:
            return StagedParams(self.vision_params).use()
        import contextlib

        return contextlib.nullcontext(self.vision_params)

    def encode_prompt(self, prompt: str):
        """Chat template -> Qwen2.5-VL final hidden -> drop the 34 template
        tokens (reference encode_prompt, qwen_image.py:348-358)."""
        from ..models.qwen.text_encoder import qwen_vl_text_encode

        assert self.tokenizer is not None and self.te_params is not None
        txt = PROMPT_TEMPLATE.format(prompt)
        ids = self.tokenizer(txt, max_length=4096 + TEMPLATE_DROP_IDX,
                             truncation=True, return_tensors="np").input_ids
        with self._te() as te_params:
            hidden = qwen_vl_text_encode(te_params, self.te_cfg,
                                         jnp.asarray(ids))
            hidden = jax.block_until_ready(
                hidden[:, TEMPLATE_DROP_IDX:].astype(self.dtype))
        return hidden

    @staticmethod
    def _area_resize(image, target_area: int, factor: int = 32):
        """calculate_dimensions + resize (reference qwen_image.py:337-346,
        537-548): fit the aspect ratio into ``target_area`` pixels with
        /32-rounded sides."""
        import math

        ratio = image.size[0] / image.size[1]
        w = math.sqrt(target_area * ratio)
        h = w / ratio
        return image.resize((round(w / factor) * factor,
                             round(h / factor) * factor))

    def encode_prompt_edit(self, prompt: str, edit_image,
                           auto_resize: bool = True):
        """Image-conditioned Edit prompt: vision tower features spliced at
        the <|image_pad|> tokens with mRoPE positions, drop the 64
        template tokens (reference encode_prompt_edit,
        qwen_image.py:360-368)."""
        from ..models.qwen.text_encoder import (
            qwen_vl_rope_index,
            qwen_vl_text_encode,
        )
        from ..models.qwen.vision import (
            preprocess_image_for_vl,
            qwen_vl_vision_encode,
        )

        assert self.tokenizer is not None and self.vision_params is not None
        if auto_resize:
            # the VL prompt sees the image at ~384x384 area (resize_image,
            # reference qwen_image.py:344-346, applied at :376); Image2LoRA
            # residual streams pass their own crops (auto_resize=False)
            edit_image = self._area_resize(edit_image, 384 * 384)
        patches, grid = preprocess_image_for_vl(edit_image, self.vision_cfg)
        merged = grid[0] * (grid[1] // self.vision_cfg.spatial_merge_size) \
            * (grid[2] // self.vision_cfg.spatial_merge_size)
        txt = EDIT_PROMPT_TEMPLATE.format(prompt).replace(
            "<|image_pad|>", "<|image_pad|>" * merged)
        ids = self.tokenizer(txt, return_tensors="np").input_ids
        with self._vision() as vp:
            vis = jax.block_until_ready(qwen_vl_vision_encode(
                vp, self.vision_cfg, jnp.asarray(patches), [grid]))
        pos = qwen_vl_rope_index(
            ids[0], [grid], self.te_cfg,
            spatial_merge_size=self.vision_cfg.spatial_merge_size)
        with self._te() as te_params:
            hidden = qwen_vl_text_encode(te_params, self.te_cfg,
                                         jnp.asarray(ids), image_embeds=vis,
                                         position_ids=pos)
            hidden = jax.block_until_ready(
                hidden[:, EDIT_TEMPLATE_DROP_IDX:].astype(self.dtype))
        return hidden

    def encode_prompt_edit_multi(self, prompt: str, edit_images):
        """Multi-image Edit prompt: "Picture i:" vision slots per image
        (reference encode_prompt_edit_multi, qwen_image.py:370-382)."""
        from ..models.qwen.text_encoder import (
            qwen_vl_rope_index,
            qwen_vl_text_encode,
        )
        from ..models.qwen.vision import (
            preprocess_image_for_vl,
            qwen_vl_vision_encode,
        )

        assert self.tokenizer is not None and self.vision_params is not None
        m = self.vision_cfg.spatial_merge_size
        imgs = [self._area_resize(im, 384 * 384) for im in edit_images]
        pats, grids = zip(*[preprocess_image_for_vl(im, self.vision_cfg)
                            for im in imgs])
        base = "".join(
            "Picture {}: <|vision_start|>".format(i + 1)
            + "<|image_pad|>" * (g[0] * (g[1] // m) * (g[2] // m))
            + "<|vision_end|>"
            for i, g in enumerate(grids))
        txt = EDIT_MULTI_TEMPLATE.format(base + prompt)
        ids = self.tokenizer(txt, return_tensors="np").input_ids
        with self._vision() as vp:
            vis = jax.block_until_ready(qwen_vl_vision_encode(
                vp, self.vision_cfg,
                jnp.asarray(np.concatenate(pats, 0)), list(grids)))
        pos = qwen_vl_rope_index(ids[0], list(grids), self.te_cfg,
                                 spatial_merge_size=m)
        with self._te() as te_params:
            hidden = qwen_vl_text_encode(te_params, self.te_cfg,
                                         jnp.asarray(ids), image_embeds=vis,
                                         position_ids=pos)
            hidden = jax.block_until_ready(
                hidden[:, EDIT_TEMPLATE_DROP_IDX:].astype(self.dtype))
        return hidden

    def _encode_image(self, image):
        from ..core.imaging import preprocess_image

        arr = jnp.asarray(preprocess_image(image)[None], jnp.float32)
        return qwen_image_vae_encode(
            jax.tree.map(lambda a: a.astype(jnp.float32), self.vae_params),
            self.vae_cfg, arr).astype(self.dtype)

    def load_lora(self, lora_path_or_sd, alpha: float = 1.0):
        """Fuse a diffusers/peft-layout Qwen-Image LoRA into the DiT."""
        from ..core.io import load_state_dict
        from ..models.qwen.lora import load_qwen_image_lora

        sd = lora_path_or_sd
        if isinstance(sd, str):
            sd = load_state_dict(sd)
        self.dit_params = load_qwen_image_lora(
            jax.tree.map(lambda a: a, self.dit_params), sd, alpha=alpha)
        return self

    def image2lora(self, images):
        """QwenImageUnit_Image2LoRAEncode/Decode (reference qwen_image.py:
        570-678): encode reference images with SigLIP2 ‖ DINOv3 (+
        Qwen2.5-VL residual streams for the coarse/fine variants), run the
        loaded Image2LoRA heads, and return the rank-concat-merged LoRA."""
        from ..data.operators import ImageCropAndResize
        from ..models.dinov3 import dinov3_forward, preprocess_dinov3
        from ..models.qwen.image2lora import (
            image2lora_forward,
            merge_image2lora,
        )
        from ..models.siglip import siglip_vision_forward

        assert self.siglip2_image_encoder and self.dinov3_image_encoder, \
            "siglip2/dinov3 encoders not loaded"
        if not isinstance(images, (list, tuple)):
            images = [images]
        crop_hi = ImageCropAndResize(height=1024, width=1024)
        crop_lo = ImageCropAndResize(height=28 * 8, width=28 * 8)

        def pooled(image):
            from ..core.imaging import preprocess_image

            sp, scfg = self.siglip2_image_encoder
            im = crop_hi(image).resize((scfg.image_size, scfg.image_size))
            s_emb, _ = siglip_vision_forward(
                sp, scfg,
                jnp.asarray(preprocess_image(im)[None], self.dtype))
            dp, dcfg = self.dinov3_image_encoder
            d_emb, _ = dinov3_forward(
                dp, dcfg,
                jnp.asarray(preprocess_dinov3(crop_hi(image), dcfg),
                            self.dtype))
            return jnp.concatenate([s_emb, d_emb], axis=-1)

        def residual(image, highres):
            im = crop_hi(image) if highres else crop_lo(image)
            emb = self.encode_prompt_edit("", im, auto_resize=False)
            return emb.reshape(1, -1)

        loras = []
        for image in images:
            x = pooled(image)
            if self.image2lora_style is not None:
                p, cfg = self.image2lora_style
                loras.append(image2lora_forward(p, cfg, x))
            if self.image2lora_coarse is not None:
                p, cfg = self.image2lora_coarse
                loras.append(image2lora_forward(p, cfg, x,
                                                residual(image, False)))
            if self.image2lora_fine is not None:
                p, cfg = self.image2lora_fine
                loras.append(image2lora_forward(p, cfg, x,
                                                residual(image, True)))
        return merge_image2lora(loras, alpha=1.0 / len(images))

    def _encode_controlnet_cond(self, ci, height, width):
        """QwenImageUnit_BlockwiseControlNet (reference qwen_image.py:
        484-525): VAE-encode the control image; inpaint variants black out
        masked pixels and append an inverted latent-res mask channel."""
        from ..core.imaging import preprocess_image

        image = ci.image
        if getattr(ci, "processor_id", None):
            # reference Annotator front end (utils/controlnet/annotator.py):
            # canny + depth (Depth-Anything) run natively; tile/none/inpaint
            # pass through
            from ..utils.annotator import Annotator

            image = Annotator(
                ci.processor_id,
                model_path=getattr(ci, "annotator_model_path", ""))(image)
        image = image.convert("RGB").resize((width, height))
        arr = preprocess_image(image)
        if ci.inpaint_mask is not None:
            mask = preprocess_image(
                ci.inpaint_mask.convert("RGB").resize(image.size))
            arr = np.where(mask.mean(axis=0)[None] > 0, 0.0, arr)
        z = qwen_image_vae_encode(
            jax.tree.map(lambda a: a.astype(jnp.float32), self.vae_params),
            self.vae_cfg, jnp.asarray(arr[None], jnp.float32)
        ).astype(self.dtype)
        if ci.inpaint_mask is not None:
            m = (preprocess_image(
                ci.inpaint_mask.convert("RGB").resize(image.size)) + 1) / 2
            m = m.mean(axis=0)
            lh, lw = z.shape[2], z.shape[3]
            ys = np.arange(lh) * m.shape[0] // lh
            xs = np.arange(lw) * m.shape[1] // lw
            m = 1.0 - m[np.ix_(ys, xs)]
            z = jnp.concatenate(
                [z, jnp.asarray(m[None, None], self.dtype)], axis=1)
        return z

    def __call__(
        self,
        prompt: Optional[str] = None,
        negative_prompt: str = "",
        cfg_scale: float = 4.0,
        input_image=None,
        denoising_strength: float = 1.0,
        height: int = 1328,
        width: int = 1328,
        seed: Optional[int] = None,
        num_inference_steps: int = 30,
        exponential_shift_mu: Optional[float] = None,
        edit_images=None,  # Qwen-Image-Edit reference image(s)
        edit_image_auto_resize: bool = True,  # ~1MP /32-rounded resize
        context_image=None,  # in-context conditioning image
        blockwise_controlnet_inputs=None,  # list[ControlNetInput]
        image2lora_images=None,  # style/subject reference image(s)
        layer_num: Optional[int] = None,  # layered generation: N layers
        layer_input_image=None,  # layered mode input image
        zero_cond_t: bool = False,  # Edit-Plus conditioning-at-t=0
        edit_rope_interpolation: bool = False,
        eligen_entity_prompts=None,  # list[str] or list of emb arrays
        eligen_entity_masks=None,  # list[PIL] or (1, N, 1, h/8, w/8)
        eligen_enable_on_negative: bool = False,
        inpaint_mask=None,  # PIL mask (requires input_image)
        inpaint_blur_size: Optional[int] = None,
        inpaint_blur_sigma: Optional[float] = None,
        prompt_emb=None,
        negative_prompt_emb=None,
        latents=None,
        output_type: str = "np",
    ):
        assert height % 16 == 0 and width % 16 == 0, (height, width)
        sched = FlowMatchScheduler("Qwen-Image").set_timesteps(
            num_inference_steps, denoising_strength=denoising_strength,
            dynamic_shift_len=(height // 16) * (width // 16),
            exponential_shift_mu=exponential_shift_mu)
        timesteps = jnp.asarray(sched.timesteps, jnp.float32)
        sigmas = jnp.asarray(np.append(sched.sigmas, 0.0), jnp.float32)

        edit_list = None
        if edit_images is not None:
            edit_list = (list(edit_images) if isinstance(
                edit_images, (list, tuple)) else [edit_images])

        def enc(p):
            # reference PromptEmbedder dispatch (qwen_image.py:384-393):
            # single image -> edit template, several -> "Picture i:" multi
            if edit_list is None or self.vision_params is None:
                return self.encode_prompt(p)
            if len(edit_list) == 1:
                return self.encode_prompt_edit(p, edit_list[0])
            return self.encode_prompt_edit_multi(p, edit_list)

        if prompt_emb is None:
            prompt_emb = enc(prompt)
        do_cfg = cfg_scale != 1.0
        if do_cfg and negative_prompt_emb is None:
            negative_prompt_emb = enc(negative_prompt)

        zc = self.vae_cfg.z_dim if self.vae_cfg else 16
        nb = 1 if layer_num is None else layer_num + 1
        if latents is not None:
            noise = jnp.asarray(latents, self.dtype)
        else:
            noise = generate_noise((nb, zc, height // 8, width // 8),
                                   seed=0 if seed is None else seed
                                   ).astype(self.dtype)
        input_latents = None
        if input_image is not None:
            input_latents = self._encode_image(input_image)
            lat = sched.add_noise(input_latents, noise, 0).astype(self.dtype)
        else:
            lat = noise

        edit_latents = ()
        if context_image is not None:
            # context latents ride the sequence before any edit latents
            # (QwenImageUnit_ContextImageEmbedder + model_fn_qwen_image
            # :737-745: main, context, edit token order)
            edit_latents += (self._encode_image(
                context_image.resize((width, height))),)
        if edit_images is not None:
            if not isinstance(edit_images, (list, tuple)):
                edit_images = [edit_images]
            if edit_image_auto_resize:
                # QwenImageUnit_EditImageEmbedder auto-resize (reference
                # qwen_image.py:546-548): ~1MP area, /32-rounded sides
                edit_images = [self._area_resize(im, 1024 * 1024)
                               for im in edit_images]
            edit_latents += tuple(self._encode_image(im)
                                  for im in edit_images)
        if layer_input_image is not None:
            # layered-mode input rides the sequence LAST
            # (QwenImageUnit_LayerInputImageEmbedder + model_fn:746-750)
            edit_latents += (self._encode_image(layer_input_image),)

        mask_lat = None
        if inpaint_mask is not None:
            # QwenImageUnit_Inpaint (qwen_image.py:301-316): latent-res
            # mean mask in [0, 1], optional gaussian blur
            assert input_latents is not None, "inpaint needs input_image"
            from ..core.imaging import preprocess_image

            m = preprocess_image(
                inpaint_mask.convert("RGB").resize(
                    (width // 8, height // 8)), min_value=0, max_value=1)
            m = m.mean(axis=0)[None, None]
            if inpaint_blur_size is not None and inpaint_blur_sigma:
                k = np.arange(-inpaint_blur_size, inpaint_blur_size + 1)
                kern = np.exp(-0.5 * (k / inpaint_blur_sigma) ** 2)
                kern /= kern.sum()
                from scipy.ndimage import convolve1d  # in-image scipy

                m[0, 0] = convolve1d(convolve1d(m[0, 0], kern, axis=0,
                                                mode="nearest"),
                                     kern, axis=1, mode="nearest")
            mask_lat = jnp.asarray(m, self.dtype)

        entity_embs, entity_embs_neg, entity_masks = (), (), None
        if eligen_entity_prompts is not None:
            # QwenImageUnit_EntityControl semantics, mirroring the FLUX
            # unit: entity prompts at their own lengths; optional nega
            # entities repeat the negative prompt
            entity_embs = tuple(
                (jnp.asarray(e, self.dtype) if hasattr(e, "shape")
                 else self.encode_prompt(e))
                for e in eligen_entity_prompts)
            if hasattr(eligen_entity_masks, "shape"):
                entity_masks = jnp.asarray(eligen_entity_masks, self.dtype)
            else:
                from ..core.imaging import preprocess_image
                from PIL import Image as _Image

                ms = [preprocess_image(m.convert("RGB").resize(
                    (width // 8, height // 8),
                    resample=_Image.NEAREST)).mean(axis=0) > 0
                    for m in eligen_entity_masks]
                entity_masks = jnp.asarray(np.stack(ms)[None, :, None],
                                           self.dtype)
            if eligen_enable_on_negative and do_cfg:
                entity_embs_neg = tuple(
                    negative_prompt_emb for _ in entity_embs)

        dit_params = self.dit_params
        if image2lora_images is not None:
            # per-call fused copy — the pipeline's base weights stay clean
            from ..models.qwen.lora import load_qwen_image_lora

            lora = self.image2lora(image2lora_images)
            dit_params = load_qwen_image_lora(
                jax.tree.map(lambda a: a, self.dit_params), lora)

        cn_conds = []
        if blockwise_controlnet_inputs:
            assert self.blockwise_controlnets, \
                "no qwen_image_blockwise_controlnet checkpoints loaded"
            from ..models.qwen.controlnet import qwen_blockwise_cond_embed
            from ..models.qwen.dit import patchify as _patchify

            for ci in blockwise_controlnet_inputs:
                p_cn, cfg_cn = self.blockwise_controlnets[ci.controlnet_id]
                z = self._encode_controlnet_cond(ci, height, width)
                cn_conds.append(qwen_blockwise_cond_embed(
                    p_cn, cfg_cn, _patchify(z)))

        def active_set(i):
            """QwenImageBlockwiseMultiControlNet gating with its 1e-4
            tolerance (reference qwen_image.py:215-224)."""
            if not blockwise_controlnet_inputs:
                return ()
            progress = (n - 1 - i) / max(n - 1, 1)
            return tuple(
                j for j, ci in enumerate(blockwise_controlnet_inputs)
                if not (progress > ci.start + 1e-4
                        or progress < ci.end - 1e-4))

        cfg_t = jnp.float32(cfg_scale)
        n = len(sched.timesteps)
        s = 0
        while s < n:
            ln = min(self.steps_per_dispatch, n - s)
            act = active_set(s)
            # split dispatches at gate transitions — check EVERY step in
            # the chunk, not just the endpoint: a start/end window shorter
            # than the chunk and fully interior to it would otherwise be
            # silently skipped (or applied outside its window)
            for k in range(1, ln):
                if active_set(s + k) != act:
                    ln = k
                    break
            blocks, conds, scales = (), (), ()
            for j in act:
                ci = blockwise_controlnet_inputs[j]
                blocks += (self.blockwise_controlnets[
                    ci.controlnet_id][0]["blocks"],)
                conds += (cn_conds[j],)
                scales += (float(ci.scale),)
            lat = _qwen_denoise_chunk(
                dit_params, lat, prompt_emb, negative_prompt_emb,
                edit_latents, timesteps, sigmas, cfg_t, jnp.int32(s),
                blocks, conds, entity_embs, entity_embs_neg, entity_masks,
                input_latents, mask_lat,
                dit_cfg=self.dit_cfg, length=ln, do_cfg=do_cfg,
                n_edit=len(edit_latents), cn_scales=scales,
                layered=layer_num is not None, zero_cond_t=zero_cond_t,
                edit_rope_interpolation=edit_rope_interpolation,
            )
            s += ln

        if output_type == "latent":
            return lat
        image = qwen_image_vae_decode(
            jax.tree.map(lambda a: a.astype(jnp.float32), self.vae_params),
            self.vae_cfg, lat.astype(jnp.float32))
        from ..core.imaging import postprocess_image

        if layer_num is not None:
            # one output image per layer (reference qwen_image.py:187-189)
            arrs = [postprocess_image(np.asarray(image[i]))
                    for i in range(image.shape[0])]
            if output_type == "pil":
                from PIL import Image

                return [Image.fromarray(a) for a in arrs]
            return arrs
        arr = postprocess_image(np.asarray(image[0]))
        if output_type == "pil":
            from PIL import Image

            return Image.fromarray(arr)
        return arr
