"""FLUX.1 text-to-image pipeline (t2i / img2img / Kontext).

Port of the reference ``FluxImagePipeline``
(``animation/diffsynth/pipelines/flux_image.py:56-296``) core path:
prompt embedding (CLIP pooled + T5 sequence), seeded noise, optional
input-image start (flow-match add_noise at denoising_strength), optional
Kontext reference latents, embedded guidance (dev), true CFG
(``cfg_scale``), FlowMatch Euler denoise, fp32 VAE decode with the
(shift, scale) latent normalization.

TPU-native: the whole denoise loop runs in chunked jitted dispatches
(module-scope jit like pipelines/wan_video.py — compiled once per
resolution, reused across prompts/seeds); RoPE tables are host-side
constants baked per compile.  ControlNet (MultiControlNet scale/sum +
progress gating, ``flux_image.py:22-53``) runs inside the jitted sweep
with dispatches split at gate transitions so gated-off ranges pay
nothing.
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
from ..models.flux.controlnet import (
    FluxControlNetConfig,
    align_controlnet_res,
    flux_controlnet_forward,
)
from ..models.flux.dit import (
    FluxDiTConfig,
    flux_dit_forward,
    patchify,
    prepare_image_ids,
)
from ..models.flux.vae import AutoencoderKLConfig, vae_decode, vae_encode


@dataclasses.dataclass
class ControlNetInput:
    """Reference ControlNetInput
    (utils/controlnet/controlnet_input.py:5-13): ``start``/``end`` gate the
    controlnet to the sigma-progress window [end, start] (1.0 = first
    step)."""
    controlnet_id: int = 0
    scale: float = 1.0
    start: float = 1.0
    end: float = 0.0
    image: Any = None
    inpaint_mask: Any = None
    processor_id: Optional[str] = None
    # local checkpoint for model-based annotators (e.g. Depth-Anything for
    # processor_id="depth"); canny/tile/none/inpaint need none
    annotator_model_path: str = ""


def _tile_tasks(H: int, W: int, tile_size: int, tile_stride: int):
    """FastTileWorker task split (reference flux_image.py:980-989); tile
    sizes clamp to the latent extent per axis (one dim may be small)."""
    th, tw = min(tile_size, H), min(tile_size, W)
    tasks = []
    for h in range(0, H, tile_stride):
        for w in range(0, W, tile_stride):
            if (h - tile_stride >= 0 and h - tile_stride + th >= H) \
                    or (w - tile_stride >= 0 and w - tile_stride + tw >= W):
                continue
            h_, w_ = h + th, w + tw
            if h_ > H:
                h, h_ = H - th, H
            if w_ > W:
                w, w_ = W - tw, W
            tasks.append((h, h_, w, w_))
    return tasks


def _tile_mask(h: int, w: int, is_bound):
    """Feather blend mask (FastTileWorker.build_mask,
    flux_image.py:955-970) — host-side fp32 constant."""
    hh = np.arange(h)[:, None] * np.ones((1, w))
    ww = np.arange(w)[None, :] * np.ones((h, 1))
    border = (h + w) // 4
    pad = np.full((h, w), border)
    mask = np.stack([
        pad if is_bound[0] else hh + 1,
        pad if is_bound[1] else h - hh,
        pad if is_bound[2] else ww + 1,
        pad if is_bound[3] else w - ww,
    ]).min(axis=0)
    return (np.clip(mask, 1, border) / border).astype(np.float32)[None, None]


@functools.partial(
    jax.jit,
    static_argnames=("dit_cfg", "length", "do_cfg", "kontext_hws",
                     "tea_opts", "cn_specs", "ip_scale",
                     "kontext_id_offset", "s1x_cfg", "txt_ids",
                     "tile_opts"),
)
def _flux_denoise_chunk(
    params, lat, prompt_emb, pooled, neg_prompt_emb, neg_pooled, guidance,
    kontext_latents, timesteps, sigmas, cfg_scale, tea_state, start,
    cn_params=(), cn_conds=(), ip_params=None, ip_tokens=None,
    ip_tokens_neg=None, entity_emb=None, entity_masks=None,
    entity_emb_neg=None, id_tokens=None, iy_guidance=None, s1x_params=None,
    s1x_emb=None, s1x_mask=None, s1x_emb_neg=None, s1x_mask_neg=None,
    hot_lora=None, flex_condition=None, flex_uncondition=None,
    flex_stop_t=None,
    *, dit_cfg: FluxDiTConfig, length: int, do_cfg: bool,
    kontext_hws: Optional[tuple] = None,
    tea_opts: Optional[tuple] = None,
    cn_specs: tuple = (),  # ((FluxControlNetConfig, processor_id, scale),..)
    ip_scale: float = 1.0,
    kontext_id_offset: int = 1,  # 1 = Kontext; 0 = Step1x reference latents
    s1x_cfg=None,  # Step1xConnectorConfig (static)
    txt_ids: Optional[tuple] = None,  # static ((f,h,w),...) fractional ids
    tile_opts: Optional[tuple] = None,  # (tile_size, tile_stride) latent px
):
    tids_np = np.asarray(txt_ids, np.float64) if txt_ids is not None else None
    kid = None
    if kontext_hws is not None:
        parts = []
        for hw in kontext_hws:
            ids = prepare_image_ids(*hw)
            # reference Kontext unit: ids[..., 0] = 1; Step1x references
            # keep offset 0 (model_fn_flux_image:1121-1124)
            ids[:, 0] += kontext_id_offset
            parts.append(ids)
        kid = np.concatenate(parts, axis=0)

    tea_kw = {}
    if tea_opts is not None:
        tea_kw["tea_cache_opts"] = dict(
            rel_l1_thresh=tea_opts[0], num_inference_steps=tea_opts[1])

    def controlnet_res(x, t, ctx, pl, conds=None):
        """MultiControlNet scale+sum (flux_image.py:40-53) + the reference's
        hard-coded 19/38 alignment == the main dit's block counts.
        InfiniteYou overrides the controlnet's prompt and guidance with the
        identity tokens (model_fn_flux_image, flux_image.py:1087-1090)."""
        cn_ctx, cn_guid = ctx, guidance
        if id_tokens is not None:
            cn_ctx, cn_guid = id_tokens, iy_guidance
        acc = [None, None]
        for (cn_cfg, pid, scale), p_cn, cond_cn in zip(
                cn_specs, cn_params, conds if conds is not None else cn_conds):
            r, sr = flux_controlnet_forward(
                p_cn, cn_cfg, x, cond_cn, t, cn_ctx, pl,
                cn_guid if cn_cfg.guidance_embed else None,
                processor_id=pid)
            for i, (rr, nb) in enumerate(
                    ((r, dit_cfg.num_double_blocks),
                     (sr, dit_cfg.num_single_blocks))):
                rr = align_controlnet_res(rr, nb)
                if rr is not None:
                    rr = rr * jnp.asarray(scale, rr.dtype)
                    acc[i] = rr if acc[i] is None else acc[i] + rr
        return acc

    def tiled_sweep(x, t, ctx, pl):
        """FastTileWorker.tiled_forward over the DENOISER (reference
        model_fn_flux_image tiled branch, :1038-1063): static spatial
        tiles with feather-blended overlaps; per-tile image ids;
        controlnet conditionings sliced per tile.  The extras that the
        reference's tiled branch drops are unsupported here too."""
        ts_, st_ = tile_opts
        B, C, H, W = x.shape
        values = jnp.zeros((B, C, H, W), jnp.float32)
        weight = jnp.zeros((1, 1, H, W), jnp.float32)
        for hl, hr, wl, wr in _tile_tasks(H, W, ts_, st_):
            xt = x[:, :, hl:hr, wl:wr]
            cn_r = cn_sr = None
            if cn_specs:
                conds = tuple(c[:, :, hl:hr, wl:wr] for c in cn_conds)
                cn_r, cn_sr = controlnet_res(xt, t, ctx, pl, conds)
            out = flux_dit_forward(
                params, dit_cfg, xt, t, ctx, pl,
                guidance if dit_cfg.guidance_embed else None,
                controlnet_res=cn_r, controlnet_single_res=cn_sr,
                hot_lora=hot_lora,
            ).astype(jnp.float32)
            mask = jnp.asarray(_tile_mask(
                hr - hl, wr - wl, (hl == 0, hr >= H, wl == 0, wr >= W)))
            values = values.at[:, :, hl:hr, wl:wr].add(out * mask)
            weight = weight.at[:, :, hl:hr, wl:wr].add(mask)
        return (values / weight).astype(x.dtype)

    def sweep(x, t, ctx, pl, tc=None, ip_tok=None, ip_sc=1.0, ent=None,
              tids=None):
        if tile_opts is not None:
            return tiled_sweep(x, t, ctx, pl)
        cn_r, cn_sr = controlnet_res(x, t, ctx, pl) if cn_specs else (None,
                                                                      None)
        ip = (ip_params, ip_tok, ip_sc) if ip_tok is not None else None
        flex = None
        if flex_condition is not None:
            # Flex control switches off past flex_control_stop
            # (model_fn_flux_image:1095-1100)
            flex = jnp.where(t[0] >= flex_stop_t, flex_condition,
                             flex_uncondition)
        return flux_dit_forward(
            params, dit_cfg, x, t, ctx, pl,
            guidance if dit_cfg.guidance_embed else None,
            kontext_latents=kontext_latents, kontext_image_ids=kid,
            tea_cache_state=tc, controlnet_res=cn_r,
            controlnet_single_res=cn_sr, ipadapter=ip,
            entity_prompt_emb=ent, entity_masks=(
                entity_masks if ent is not None else None),
            hot_lora=hot_lora, flex_condition=flex, txt_ids=tids, **tea_kw,
        )

    def branch_ctx(t, ctx, pl, emb, msk):
        """Step1x swaps prompt/pooled for the per-step connector outputs
        (model_fn_flux_image:1103-1106)."""
        if emb is None:
            return ctx, pl
        from ..models.flux.step1x import step1x_connector_forward

        return step1x_connector_forward(s1x_params, s1x_cfg, emb,
                                        t / 1000.0, msk)

    def step(i, carry):
        x, tc = carry
        t = jnp.broadcast_to(timesteps[i], (x.shape[0],))
        ctx_p, pl_p = branch_ctx(t, prompt_emb, pooled, s1x_emb, s1x_mask)
        if tea_opts is not None:
            v, tc = sweep(x, t, ctx_p, pl_p, tc, ip_tokens, ip_scale,
                          entity_emb, tids_np)
        else:
            v = sweep(x, t, ctx_p, pl_p, None, ip_tokens, ip_scale,
                      entity_emb, tids_np)
        if do_cfg:
            # the reference runs the nega sweep with zero-embed ip tokens
            # at scale 1.0 (FluxImageUnit_IPAdapter, flux_image.py:518-520)
            ctx_n, pl_n = branch_ctx(t, neg_prompt_emb, neg_pooled,
                                     s1x_emb_neg, s1x_mask_neg)
            # tids (custom NexusGen text ids) deliberately stays None here:
            # it positions the POSITIVE (generated) embedding; the negative
            # prompt is a plain text encoding whose correct ids are the
            # standard zeros computed from its own length
            v_n = sweep(x, t, ctx_n, pl_n,
                        ip_tok=ip_tokens_neg, ent=entity_emb_neg)
            v = v_n + cfg_scale.astype(v.dtype) * (v - v_n)
        x = x + v.astype(x.dtype) * (sigmas[i + 1] - sigmas[i]).astype(x.dtype)
        return x, tc

    return jax.lax.fori_loop(start, start + length, step, (lat, tea_state))


@dataclasses.dataclass
class FluxImagePipeline:
    dit_params: Any = None
    dit_cfg: FluxDiTConfig = None
    vae_params: Any = None
    vae_cfg: AutoencoderKLConfig = None
    te_clip_params: Any = None
    te_clip_cfg: Any = None
    te_t5_params: Any = None
    te_t5_cfg: Any = None
    tokenizer_clip: Any = None
    tokenizer_t5: Any = None
    controlnets: Any = None  # list of (params, FluxControlNetConfig)
    ipadapter: Any = None  # (params, FluxIpAdapterConfig)
    ipadapter_image_encoder: Any = None  # (params, SiglipVisionConfig)
    value_controllers: Any = None  # list of (params, SingleValueEncoderConfig)
    infiniteyou_projector: Any = None  # (params, InfiniteYouProjectorConfig)
    step1x_connector: Any = None  # (params, Step1xConnectorConfig)
    lora_encoder: Any = None  # (params, FluxLoRAEncoderConfig)
    lora_patcher: Any = None  # (merger params by layer name, None)
    hot_lora: Any = None  # stacked unfused LoRAs (load_hot_loras)
    mesh: Any = None  # jax.sharding.Mesh for tensor-parallel weights
    dtype: Any = jnp.bfloat16
    steps_per_dispatch: int = 10

    def use_mesh(self, mesh):
        """Shard the 12B DiT weights over the mesh's ``tensor`` axis
        (Megatron col/row FFN splits + head-aligned qkv sharding —
        parallel/tensor_parallel.py) so FLUX.1 fits and scales on v5e
        chips.  Idempotent; activations stay replicated (batch-1
        denoise)."""
        from ..parallel.tensor_parallel import shard_flux_dit_params

        self.mesh = mesh
        self.dit_params = shard_flux_dit_params(
            self.dit_params, mesh, num_heads=self.dit_cfg.num_heads)
        return self

    @classmethod
    def from_pretrained(cls, model_paths, tokenizer_clip=None,
                        tokenizer_t5=None, dtype=jnp.bfloat16, hints=None):
        """Hash-detected loading, same contract as WanVideoPipeline
        (reference FluxImagePipeline.from_pretrained, flux_image.py:118)."""
        from ..core.model_pool import ModelPool

        pool = ModelPool().load(model_paths, dtype=dtype, hints=hints)
        dit = pool.fetch_model("flux_dit")
        vae = pool.fetch_model("flux_vae") or pool.fetch_model(
            "flux_vae_encoder")
        clip = pool.fetch_model("flux_text_encoder_clip")
        t5 = pool.fetch_model("flux_text_encoder_t5")
        controlnets = pool.fetch_model("flux_controlnet", index="all")
        pipe = cls(
            dit_params=dit[0] if dit else None,
            dit_cfg=dit[1] if dit else None,
            controlnets=controlnets,
            ipadapter=pool.fetch_model("flux_ipadapter"),
            ipadapter_image_encoder=pool.fetch_model("siglip_vision_model"),
            value_controllers=pool.fetch_model("flux_value_controller",
                                               index="all"),
            infiniteyou_projector=pool.fetch_model(
                "infiniteyou_image_projector"),
            step1x_connector=pool.fetch_model("step1x_connector"),
            lora_encoder=pool.fetch_model("flux_lora_encoder"),
            lora_patcher=pool.fetch_model("flux_lora_patcher"),
            vae_params=vae[0] if vae else None,
            vae_cfg=vae[1] if vae else None,
            te_clip_params=clip[0] if clip else None,
            te_clip_cfg=clip[1] if clip else None,
            te_t5_params=t5[0] if t5 else None,
            te_t5_cfg=t5[1] if t5 else None,
            dtype=dtype,
        )
        if tokenizer_clip is not None:
            from ..utils.tokenizer import CLIPTokenizerWrapper

            pipe.tokenizer_clip = CLIPTokenizerWrapper(tokenizer_clip)
        if tokenizer_t5 is not None:
            from ..utils.tokenizer import HuggingfaceTokenizer

            pipe.tokenizer_t5 = HuggingfaceTokenizer(tokenizer_t5,
                                                     seq_len=512)
        return pipe

    def quantize(self):
        """Swap the double/single-block projections to W8A8 int8 (the
        reference's FP8-linear capability, ``core/vram/layers.py:321-357``,
        as the TPU-native int8 port — ops/quant.py).  Embedders,
        modulation linears, and the output head stay bf16.  Call AFTER
        load_lora (LoRA fuses into bf16 weights); validate quality on
        your weights before production use."""
        from ..ops.quant import quantize_image_dit_params

        self.dit_params = quantize_image_dit_params(self.dit_params,
                                                    consume=True)
        return self

    def load_lora(self, lora_path_or_sd, alpha: float = 1.0):
        """Fuse a FLUX LoRA (diffusers or civitai layout) into the DiT
        weights at load time (reference FluxLoRALoader,
        utils/lora/flux.py)."""
        from ..core.io import load_state_dict
        from ..models.flux.lora import load_flux_lora

        sd = lora_path_or_sd
        if isinstance(sd, str):
            sd = load_state_dict(sd)
        self.dit_params = load_flux_lora(self.dit_params, self.dit_cfg, sd,
                                         alpha=alpha)
        return self

    # ------------------------------------------------------------- prompts
    def encode_prompt(self, prompt: str, t5_sequence_length: int = 512):
        """-> (prompt_emb (1, L, 4096), pooled (1, 768)) — reference
        FluxImageUnit_PromptEmbedder.encode_prompt (flux_image.py:552-567):
        CLIP pooled at 77 tokens, T5 sequence at t5_sequence_length."""
        from ..models.flux.text_encoders import flux_encode_prompt_clip
        from ..models.wan.text_encoder import umt5_encode

        assert self.tokenizer_clip is not None and self.tokenizer_t5 is not None
        ids1 = self.tokenizer_clip(prompt)
        pooled = flux_encode_prompt_clip(
            self.te_clip_params, self.te_clip_cfg, jnp.asarray(ids1))
        self.tokenizer_t5.seq_len = t5_sequence_length
        ids2 = self.tokenizer_t5(prompt)
        emb = umt5_encode(self.te_t5_params, self.te_t5_cfg,
                          jnp.asarray(ids2))
        return emb.astype(self.dtype), pooled.astype(self.dtype)

    # -------------------------------------------------------------- images
    def _encode_image(self, image):
        from ..core.imaging import preprocess_image

        arr = jnp.asarray(preprocess_image(image)[None], jnp.float32)
        mean = vae_encode(self.vae_params, self.vae_cfg, arr)
        z = (mean - self.vae_cfg.shift_factor) * self.vae_cfg.scaling_factor
        return z.astype(self.dtype)

    def load_hot_loras(self, lora_sds_or_paths, use_merger: bool = False):
        """Load LoRAs UNFUSED so they can be gated per layer.  With
        ``use_merger=True`` the flux_lora_patcher's learned LoraMerger
        combines them (reference ``enable_lora_merger``,
        flux_image.py:107-115); without, they sum like the plain hot path
        (core/vram/layers.py:418-420)."""
        from ..core.io import load_state_dict
        from ..models.flux.lora_runtime import (
            normalize_flux_lora_to_reference,
            stack_hot_lora,
        )

        sds = []
        for s in lora_sds_or_paths:
            if isinstance(s, str):
                s = load_state_dict(s)
            sds.append(normalize_flux_lora_to_reference(s))
        patcher = None
        if use_merger:
            assert self.lora_patcher, "no flux_lora_patcher loaded"
            patcher = self.lora_patcher[0]
        self.hot_lora = stack_hot_lora(sds, self.dit_cfg, patcher=patcher,
                                       dtype=self.dtype)
        return self

    def encode_loras(self, lora_sds_or_paths, scale=None):
        """FluxImageUnit_LoRAEncode (reference flux_image.py:846-900):
        encode LoRA checkpoints into prompt tokens."""
        from ..core.io import load_state_dict
        from ..models.flux.lora_runtime import (
            flux_lora_encoder_forward,
            normalize_flux_lora_to_reference,
        )

        assert self.lora_encoder, "no flux_lora_encoder loaded"
        p, cfg = self.lora_encoder
        embs = []
        for s in lora_sds_or_paths:
            if isinstance(s, str):
                s = load_state_dict(s)
            embs.append(flux_lora_encoder_forward(
                p, cfg, normalize_flux_lora_to_reference(s)))
        emb = jnp.concatenate(embs, axis=1)
        if scale is not None:
            emb = emb * scale
        return emb.astype(self.dtype)

    def _encode_controlnet_cond(self, ci: ControlNetInput, height, width):
        """FluxImageUnit_ControlNet (reference flux_image.py:450-489):
        VAE-encode the control image; inpaint models additionally black out
        the masked pixels and append an inverted latent-res mask channel."""
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
        arr = preprocess_image(image)[None]  # (1, C, H, W) in [-1, 1]
        if ci.inpaint_mask is not None:
            mask = preprocess_image(
                ci.inpaint_mask.convert("RGB").resize(image.size))
            arr = np.where(mask.mean(axis=0)[None, None] > 0, 0.0, arr)
        z = vae_encode(self.vae_params, self.vae_cfg,
                       jnp.asarray(arr, jnp.float32))
        z = ((z - self.vae_cfg.shift_factor)
             * self.vae_cfg.scaling_factor).astype(self.dtype)
        if ci.inpaint_mask is not None:
            m = (preprocess_image(
                ci.inpaint_mask.convert("RGB").resize(image.size)) + 1) / 2
            m = m.mean(axis=0)  # (H, W)
            lh, lw = z.shape[2], z.shape[3]
            ys = (np.arange(lh) * m.shape[0] // lh)
            xs = (np.arange(lw) * m.shape[1] // lw)
            m = 1.0 - m[np.ix_(ys, xs)]  # nearest, inverted
            z = jnp.concatenate(
                [z, jnp.asarray(m[None, None], self.dtype)], axis=1)
        return z

    def __call__(
        self,
        prompt: Optional[str] = None,
        negative_prompt: str = "",
        cfg_scale: float = 1.0,
        embedded_guidance: float = 3.5,
        t5_sequence_length: int = 512,
        input_image=None,
        denoising_strength: float = 1.0,
        height: int = 1024,
        width: int = 1024,
        seed: Optional[int] = None,
        sigma_shift: Optional[float] = None,
        num_inference_steps: int = 30,
        tea_cache_l1_thresh: Optional[float] = None,
        kontext_images=None,
        controlnet_inputs: Optional[List[ControlNetInput]] = None,
        ipadapter_images=None,  # PIL image(s) for the image prompt
        ipadapter_scale: float = 1.0,
        eligen_entity_prompts=None,  # list[str] or (B, N, Lt, ctx) array
        eligen_entity_masks=None,  # list[PIL] or (B, N, 1, h/8, w/8) array
        eligen_enable_on_negative: bool = False,
        value_controller_inputs=None,  # scalar(s) for the value encoders
        infiniteyou_id_embedding=None,  # precomputed arcface 512-d embed
        infinityou_guidance: float = 1.0,
        step1x_llm_embedding=None,  # (1, L, in_ch) Qwen2.5-VL embedding
        step1x_mask=None,  # (1, L) 0/1
        step1x_llm_embedding_neg=None,
        step1x_mask_neg=None,
        step1x_reference_image=None,  # PIL edit source image
        lora_encoder_inputs=None,  # LoRA state dicts / paths to encode
        lora_encoder_scale: Optional[float] = None,
        prompt_txt_ids=None,  # (Lt, 3) custom text ids (NexusGen editing)
        flex_inpaint_image=None,  # Flex models (in_dim 196)
        flex_inpaint_mask=None,
        flex_control_image=None,
        flex_control_strength: float = 0.5,  # reference defaults
        flex_control_stop: float = 0.5,
        tiled: bool = False,  # FastTileWorker spatial tiling (latent px)
        tile_size: int = 128,
        tile_stride: int = 64,
        hot_lora_scales=None,  # (n,) per-LoRA weights on the hot stack
        # precomputed embeddings (tests / cached 2-phase mode)
        prompt_emb=None,
        pooled_prompt_emb=None,
        negative_prompt_emb=None,
        negative_pooled_prompt_emb=None,
        latents=None,  # initial noise override (reproducibility / tests)
        output_type: str = "np",
    ):
        assert height % 16 == 0 and width % 16 == 0, (height, width)
        sched = FlowMatchScheduler("FLUX.1").set_timesteps(
            num_inference_steps, denoising_strength=denoising_strength,
            shift=sigma_shift)
        timesteps = jnp.asarray(sched.timesteps, jnp.float32)
        sigmas = jnp.asarray(np.append(sched.sigmas, 0.0), jnp.float32)

        step1x = step1x_llm_embedding is not None
        if step1x:
            # the connector substitutes prompt/pooled per step; the T5/CLIP
            # embeddings are unused placeholders
            assert self.step1x_connector, "no step1x_connector loaded"
            prompt_emb = jnp.zeros((1, 1, self.dit_cfg.context_dim),
                                   self.dtype)
            pooled_prompt_emb = jnp.zeros((1, self.dit_cfg.pooled_dim),
                                          self.dtype)
            negative_prompt_emb = prompt_emb
            negative_pooled_prompt_emb = pooled_prompt_emb
        if prompt_emb is None:
            prompt_emb, pooled_prompt_emb = self.encode_prompt(
                prompt, t5_sequence_length)
        do_cfg = cfg_scale != 1.0
        if do_cfg and negative_prompt_emb is None:
            negative_prompt_emb, negative_pooled_prompt_emb = \
                self.encode_prompt(negative_prompt, t5_sequence_length)

        zc = self.vae_cfg.latent_channels if self.vae_cfg else \
            self.dit_cfg.in_dim // 4
        lh, lw = height // 8, width // 8
        if latents is not None:
            noise = jnp.asarray(latents, self.dtype)
        else:
            noise = generate_noise((1, zc, lh, lw),
                                   seed=0 if seed is None else seed
                                   ).astype(self.dtype)
        if input_image is not None:
            z0 = self._encode_image(input_image)
            latents = sched.add_noise(z0, noise, 0).astype(self.dtype)
        else:
            latents = noise

        kontext_latents, kontext_hws = None, None
        if kontext_images is not None:
            if not isinstance(kontext_images, (list, tuple)):
                kontext_images = [kontext_images]
            packed, hws = [], []
            for im in kontext_images:
                z = self._encode_image(im)
                hws.append((z.shape[2], z.shape[3]))
                packed.append(patchify(z))
            kontext_latents = jnp.concatenate(packed, axis=1)
            kontext_hws = tuple(hws)

        kontext_id_offset = 1
        if step1x_reference_image is not None:
            # Step1x reference latents ride the kontext slot with ids at
            # offset 0 (model_fn_flux_image:1121-1126)
            assert kontext_images is None, "step1x + kontext unsupported"
            z = self._encode_image(step1x_reference_image)
            kontext_latents = patchify(z)
            kontext_hws = ((z.shape[2], z.shape[3]),)
            kontext_id_offset = 0

        flex_condition = flex_uncondition = flex_stop_t = None
        if self.dit_cfg.in_dim == (3 * zc + 1) * 4:  # 196 for FLEX.2
            # FluxImageUnit_Flex (flux_image.py:708-744): 16ch inpaint
            # latents + 1ch mask + 16ch control latents alongside the 16
            # noise channels (49ch -> 196 packed)
            lh, lw = height // 8, width // 8
            if flex_inpaint_image is not None:
                fi = self._encode_image(flex_inpaint_image)
            else:
                fi = jnp.zeros((1, zc, lh, lw), self.dtype)
            if flex_inpaint_mask is not None:
                from ..core.imaging import preprocess_image

                m = preprocess_image(
                    flex_inpaint_mask.convert("RGB").resize((lw, lh)))
                fm = jnp.asarray((m[0:1] + 1) / 2, self.dtype)[None]
            else:
                fm = jnp.ones((1, 1, lh, lw), self.dtype)
            fi = fi * (1 - fm)
            if flex_control_image is not None:
                fc = self._encode_image(flex_control_image) \
                    * flex_control_strength
            else:
                fc = jnp.zeros((1, zc, lh, lw), self.dtype)
            flex_condition = jnp.concatenate([fi, fm, fc], axis=1)
            flex_uncondition = jnp.concatenate(
                [fi, fm, jnp.zeros_like(fc)], axis=1)
            flex_stop_t = jnp.float32(sched.timesteps[
                int(flex_control_stop * (len(sched.timesteps) - 1))])

        guidance = jnp.full((1,), embedded_guidance, jnp.float32)
        cfg_t = jnp.float32(cfg_scale)
        n = len(sched.timesteps)
        tea_opts, tea_state = None, jnp.zeros(())
        if tea_cache_l1_thresh is not None and tiled:
            # the tiled sweep has per-tile hidden states — no single cache
            # to gate on (and the chunk would try to unpack a (v, state)
            # pair the tiled path never returns)
            raise ValueError(
                "tea_cache_l1_thresh and tiled are mutually exclusive")
        if tea_cache_l1_thresh is not None:
            # reference flux TeaCache shares one gate across CFG branches
            # (unit output lives in inputs_shared); we support the FLUX-dev
            # default (cfg 1) exactly and skip the gate on the nega sweep
            from ..utils.tea_cache import init_tea_cache_state

            tea_opts = (float(tea_cache_l1_thresh), n)
            lt = (height // 16) * (width // 16)
            if kontext_latents is not None:
                lt += kontext_latents.shape[1]
            hidden = (latents.shape[0], lt, self.dit_cfg.dim)
            tea_state = init_tea_cache_state(hidden, hidden, jnp.float32)

        if lora_encoder_inputs is not None:
            # LoRA tokens append to the POSITIVE prompt only
            # (FluxImageUnit_LoRAEncode, flux_image.py:890-899)
            if not isinstance(lora_encoder_inputs, (list, tuple)):
                lora_encoder_inputs = [lora_encoder_inputs]
            lora_emb = self.encode_loras(lora_encoder_inputs,
                                         scale=lora_encoder_scale)
            prompt_emb = jnp.concatenate([prompt_emb, lora_emb], axis=1)

        if value_controller_inputs is not None:
            # FluxImageUnit_ValueControl (flux_image.py:764-790): value
            # tokens appended to BOTH CFG branches' prompt embeddings
            assert self.value_controllers, \
                "no flux_value_controller checkpoints loaded"
            assert eligen_entity_prompts is None, \
                "value control + EliGen is unsupported (mismatched prompt "\
                "lengths break the entity mask, as in the reference)"
            from ..models.flux.value_control import multi_value_encode

            if not isinstance(value_controller_inputs, (list, tuple)):
                value_controller_inputs = [value_controller_inputs]
            v_emb = multi_value_encode(self.value_controllers,
                                       value_controller_inputs
                                       ).astype(self.dtype)
            prompt_emb = jnp.concatenate([prompt_emb, v_emb], axis=1)
            if negative_prompt_emb is not None:
                negative_prompt_emb = jnp.concatenate(
                    [negative_prompt_emb, v_emb], axis=1)

        id_tokens, iy_guidance = None, None
        if infiniteyou_id_embedding is not None:
            assert self.infiniteyou_projector, \
                "no infiniteyou_image_projector checkpoint loaded"
            from ..models.flux.infiniteyou import infiniteyou_project

            iy_p, iy_cfg = self.infiniteyou_projector
            emb = jnp.asarray(infiniteyou_id_embedding, self.dtype).reshape(
                1, -1, iy_cfg.embedding_dim)
            id_tokens = infiniteyou_project(iy_p, iy_cfg, emb)
            iy_guidance = jnp.full((1,), infinityou_guidance, jnp.float32)

        entity_emb, entity_masks, entity_emb_neg = None, None, None
        if eligen_entity_prompts is not None:
            # FluxImageUnit_EntityControl (reference flux_image.py:522-613)
            if hasattr(eligen_entity_prompts, "shape"):
                entity_emb = jnp.asarray(eligen_entity_prompts, self.dtype)
            else:
                entity_emb = jnp.stack(
                    [self.encode_prompt(p, t5_sequence_length)[0]
                     for p in eligen_entity_prompts], axis=1)
            if hasattr(eligen_entity_masks, "shape"):
                entity_masks = jnp.asarray(eligen_entity_masks, self.dtype)
            else:
                from ..core.imaging import preprocess_image
                from PIL import Image as _Image

                ms = []
                for m in eligen_entity_masks:
                    m = m.convert("RGB").resize(
                        (width // 8, height // 8), resample=_Image.NEAREST)
                    ms.append(preprocess_image(m).mean(axis=0) > 0)
                entity_masks = jnp.asarray(
                    np.stack(ms)[None, :, None], self.dtype)
            if eligen_enable_on_negative and cfg_scale != 1.0:
                # nega entities: the negative prompt repeated per entity
                entity_emb_neg = jnp.repeat(
                    negative_prompt_emb[:, None], entity_emb.shape[1],
                    axis=1)

        ip_params, ip_tokens, ip_tokens_neg = None, None, None
        if ipadapter_images is not None:
            assert self.ipadapter and self.ipadapter_image_encoder, \
                "flux_ipadapter / siglip_vision_model checkpoints not loaded"
            from ..core.imaging import preprocess_image
            from ..models.flux.ipadapter import flux_ipadapter_project
            from ..models.siglip import siglip_vision_forward

            if not isinstance(ipadapter_images, (list, tuple)):
                ipadapter_images = [ipadapter_images]
            enc_p, enc_cfg = self.ipadapter_image_encoder
            size = enc_cfg.image_size
            # reference: resize(384, resample=3 bicubic) then [-1, 1]
            # (FluxImageUnit_IPAdapter, flux_image.py:510-513)
            arr = np.stack([preprocess_image(
                im.convert("RGB").resize((size, size), resample=3))
                for im in ipadapter_images])
            pooled_emb, _ = siglip_vision_forward(
                enc_p, enc_cfg, jnp.asarray(arr, self.dtype))
            ip_params, ip_cfg = self.ipadapter
            ip_tokens = flux_ipadapter_project(ip_params, ip_cfg, pooled_emb)
            if cfg_scale != 1.0:
                ip_tokens_neg = flux_ipadapter_project(
                    ip_params, ip_cfg, jnp.zeros_like(pooled_emb))

        cn_conds = []
        if controlnet_inputs:
            assert self.controlnets, "no flux_controlnet checkpoints loaded"
            for ci in controlnet_inputs:
                cn_conds.append(self._encode_controlnet_cond(ci, height,
                                                            width))

        def active_set(i):
            """MultiControlNet progress gating (flux_image.py:43-45)."""
            if not controlnet_inputs:
                return ()
            progress = (n - 1 - i) / max(n - 1, 1)
            return tuple(
                j for j, ci in enumerate(controlnet_inputs)
                if not (progress > ci.start or progress < ci.end))

        hot_lora = self.hot_lora
        if hot_lora_scales is not None:
            if hot_lora is None:
                raise ValueError("hot_lora_scales given but no hot LoRAs "
                                 "loaded — call load_hot_loras first")
            from ..models.flux.lora_runtime import scale_hot_lora

            # traced (n,) weights on the stacked unfused LoRAs: selecting /
            # blending adapters per request without recompiling
            hot_lora = scale_hot_lora(hot_lora, hot_lora_scales)

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
            specs, cps, ccs = (), (), ()
            for j in act:
                ci = controlnet_inputs[j]
                p_cn, cfg_cn = self.controlnets[ci.controlnet_id]
                specs += ((cfg_cn, ci.processor_id, float(ci.scale)),)
                cps += (p_cn,)
                ccs += (cn_conds[j],)
            latents, tea_state = _flux_denoise_chunk(
                self.dit_params, latents, prompt_emb, pooled_prompt_emb,
                negative_prompt_emb, negative_pooled_prompt_emb, guidance,
                kontext_latents, timesteps, sigmas, cfg_t, tea_state,
                jnp.int32(s), cps, ccs, ip_params, ip_tokens, ip_tokens_neg,
                entity_emb, entity_masks, entity_emb_neg, id_tokens,
                iy_guidance,
                self.step1x_connector[0] if step1x else None,
                (jnp.asarray(step1x_llm_embedding, self.dtype)
                 if step1x else None),
                jnp.asarray(step1x_mask) if step1x else None,
                (jnp.asarray(step1x_llm_embedding_neg, self.dtype)
                 if step1x and step1x_llm_embedding_neg is not None
                 else None),
                (jnp.asarray(step1x_mask_neg)
                 if step1x and step1x_mask_neg is not None else None),
                hot_lora, flex_condition, flex_uncondition,
                flex_stop_t,
                dit_cfg=self.dit_cfg, length=ln, do_cfg=do_cfg,
                kontext_hws=kontext_hws, tea_opts=tea_opts, cn_specs=specs,
                ip_scale=float(ipadapter_scale),
                kontext_id_offset=kontext_id_offset,
                s1x_cfg=self.step1x_connector[1] if step1x else None,
                txt_ids=(tuple(map(tuple, np.asarray(prompt_txt_ids)))
                         if prompt_txt_ids is not None else None),
                tile_opts=((tile_size, tile_stride)
                           if tiled and (height // 8 > tile_size
                                         or width // 8 > tile_size)
                           else None),
            )
            s += ln

        if output_type == "latent":
            return latents
        # fp32 decode with (shift, scale) latent normalization
        # (reference flux_vae.py:350)
        z = latents.astype(jnp.float32) / self.vae_cfg.scaling_factor \
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
