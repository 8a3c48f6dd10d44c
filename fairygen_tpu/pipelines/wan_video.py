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
  ImageEmbedderVAE:444    -> encode_i2v_conditioning (I2V-A14B mask+y path)
  ImageEmbedderCLIP:421   -> encode_clip_feature (open-CLIP ViT-H image cond)
  CfgMerger:785           -> batched posi/nega in one DiT call (cfg_merge)
  TeaCache:769            -> tea_cache_l1_thresh/model_id kwargs (state is a
                             pytree carried through the jitted loop)
  SpeedControl:601        -> motion_bucket_id kwarg (t_mod bias)
  UnifiedSequenceParallel:757 -> mesh= (Ulysses shard_map inside the DiT)
  Boundary dit/dit2 switch:287 -> static loop split at the boundary index
  TemporalTiler_BCTHW:1069 -> sliding_window_size/stride kwargs
  VAE tiling (wan_video_vae.py:1103) -> tiled/tile_size/tile_stride kwargs
"""
from __future__ import annotations

import dataclasses
import functools
import warnings
from typing import Any, Dict, List, Optional, Tuple

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


# --------------------------------------------------------------------- jitted
# Module-scope jitted programs (the round-1 version rebuilt a fresh jit
# closure per __call__, baking context/timesteps in as constants — every new
# prompt recompiled the multi-billion-param program).  Everything data-like
# is a traced argument; only hashable config is static.  jax.jit's cache
# keys on (statics, arg shapes/dtypes/pytree structure), so repeat calls at
# the same resolution reuse the compiled program across prompts and seeds.

@functools.partial(
    jax.jit,
    static_argnames=("dit_cfg", "length", "cfg_merge", "fuse", "mesh",
                     "sp_strategy", "tea_opts", "vace_cfg", "animate_cfg"),
)
def _denoise_chunk(
    params, lat, ffl, context, negative_context, y, clip_feature, t_mod_bias,
    vace_params, vace_context, vace_scale, camera_tokens,
    reference_latents, animate_params, pose_latents, face_pixel_values,
    face_pixel_values_nega, cross_kv_p, cross_kv_n,
    timesteps, sigmas, cfg_scale, tea_state_a, tea_state_b, start,
    *, dit_cfg: WanDiTConfig, length: int, cfg_merge: bool, fuse: bool,
    mesh, sp_strategy: str = "ulysses", tea_opts: Optional[tuple],
    vace_cfg=None, animate_cfg=None,
):
    """Run ``length`` Euler flow-match steps starting at step ``start``.

    One device program for the whole chunk: DiT sweep(s), CFG combine
    (reference wan_video.py:297-304), scheduler step (flow_match.py:144-154)
    and first-frame re-pinning (:308-309) all inside the fori_loop.
    TeaCache states (one per CFG branch, reference wan_video.py:769-783)
    ride the loop carry.
    """
    use_cfg = negative_context is not None
    tea_kw: Dict[str, Any] = {}
    if tea_opts is not None:
        tea_kw["tea_cache_opts"] = dict(
            model_id=tea_opts[0], rel_l1_thresh=tea_opts[1],
            num_inference_steps=tea_opts[2],
        )

    vace_kw: Dict[str, Any] = {}
    if vace_context is not None:
        vace_kw = dict(vace_params=vace_params, vace_cfg=vace_cfg,
                       vace_scale=vace_scale)

    def call(x, t, c, y_, clip_, tc, face=None, ckv=None):
        b_ = x.shape[0]

        def rep(a):
            if a is None or a.shape[0] == b_:
                return a
            return jnp.concatenate([a] * (b_ // a.shape[0]), axis=0)

        vk = dict(vace_kw)
        if vace_context is not None:
            vk["vace_context"] = rep(vace_context)
        if pose_latents is not None:
            vk.update(animate_params=animate_params, animate_cfg=animate_cfg,
                      pose_latents=rep(pose_latents),
                      face_pixel_values=rep(face))
        out = wan_dit_forward(
            params, dit_cfg, x, t, c, y=y_, clip_feature=clip_,
            fuse_vae_embedding_in_latents=fuse, mesh=mesh,
            sp_strategy=sp_strategy, t_mod_bias=t_mod_bias,
            control_camera_tokens=rep(camera_tokens),
            reference_latents=rep(reference_latents),
            tea_cache_state=tc if tea_opts is not None else None, **tea_kw,
            cross_kv=ckv, **vk,
        )
        if tea_opts is not None:
            return out  # (v, new_state)
        return out, tc

    def step(i, carry):
        lat, tc_a, tc_b = carry
        b = lat.shape[0]
        t1 = jnp.broadcast_to(timesteps[i], (b,))
        if use_cfg and cfg_merge:
            x2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.concatenate([t1, t1], axis=0)
            y2 = None if y is None else jnp.concatenate([y, y], axis=0)
            cl2 = (None if clip_feature is None
                   else jnp.concatenate([clip_feature, clip_feature], axis=0))
            ctx2 = jnp.concatenate([context, negative_context], axis=0)
            face2 = (None if face_pixel_values is None else jnp.concatenate(
                [face_pixel_values, face_pixel_values_nega], axis=0))
            v2, tc_a = call(x2, t2, ctx2, y2, cl2, tc_a, face2,
                            ckv=cross_kv_p)
            v_posi, v_nega = v2[:b], v2[b:]
            v = v_nega + cfg_scale * (v_posi - v_nega)
        elif use_cfg:
            v_posi, tc_a = call(lat, t1, context, y, clip_feature, tc_a,
                                face_pixel_values, ckv=cross_kv_p)
            v_nega, tc_b = call(lat, t1, negative_context, y, clip_feature,
                                tc_b, face_pixel_values_nega,
                                ckv=cross_kv_n)
            v = v_nega + cfg_scale * (v_posi - v_nega)
        else:
            v, tc_a = call(lat, t1, context, y, clip_feature, tc_a,
                           face_pixel_values, ckv=cross_kv_p)
        dt = (sigmas[i + 1] - sigmas[i]).astype(lat.dtype)
        lat = lat + v.astype(lat.dtype) * dt
        if fuse:
            lat = lat.at[:, :, 0:1].set(ffl)
        return (lat, tc_a, tc_b)

    lat, tea_state_a, tea_state_b = jax.lax.fori_loop(
        start, start + length, step, (lat, tea_state_a, tea_state_b)
    )
    return lat, tea_state_a, tea_state_b


@functools.partial(jax.jit, static_argnames=("dit_cfg",))
def _cross_kv(params, context, *, dit_cfg: WanDiTConfig):
    """Per-prompt per-block cross-attn (k, v) — models.wan.dit.
    precompute_cross_kv, jitted once at module scope (no retrace across
    prompts)."""
    from ..models.wan.dit import precompute_cross_kv

    return precompute_cross_kv(params, dit_cfg, context)


@functools.partial(jax.jit, static_argnames=("dit_cfg", "mot_cfg"))
def _vap_sweep(dit_params, mot_params, lat, t, ctx, y, clip_feature,
               vap_hidden_state, context_vap, vap_clip_feature,
               *, dit_cfg, mot_cfg):
    """One VAP (video-as-prompt, MoT joint-attention) sweep — reference
    model_fn_wan_video's VAP weave (wan_video.py:1278-1346)."""
    from ..models.wan.mot import wan_dit_forward_vap

    return wan_dit_forward_vap(
        dit_params, dit_cfg, mot_params, mot_cfg, lat, t, ctx,
        clip_feature=clip_feature, y=y,
        vap_hidden_state=vap_hidden_state, context_vap=context_vap,
        vap_clip_feature=vap_clip_feature,
    )


@functools.partial(jax.jit, static_argnames=("lc_cfg", "num_cond"))
def _longcat_sweep(params, lat, t, ctx, *, lc_cfg, num_cond: int):
    """One LongCat-Video sweep — model_fn_longcat_video semantics
    (reference wan_video.py:1391-1418): negated output."""
    from ..models.wan.longcat import longcat_dit_forward

    return -longcat_dit_forward(params, lc_cfg, lat, t, ctx,
                                num_cond_latents=num_cond)


@functools.partial(jax.jit, static_argnames=("s2v_cfg", "drop_motion"))
def _s2v_sweep(params, lat, t, ctx, audio, motion_latents, pose,
               *, s2v_cfg, drop_motion: bool):
    """One S2V denoiser sweep (reference model_fn_wans2v,
    wan_video.py:1421-1519) — jitted, cached per shape."""
    from ..models.wan.s2v import wan_s2v_forward

    return wan_s2v_forward(
        params, s2v_cfg, lat, t, ctx, audio,
        motion_latents=motion_latents, pose_cond=pose,
        drop_motion_frames=drop_motion,
    )


@functools.partial(jax.jit, static_argnames=("dit_cfg", "fuse", "mesh",
                                              "sp_strategy"))
def _dit_sweep(params, x, t, c, y, clip_feature, t_mod_bias,
               *, dit_cfg: WanDiTConfig, fuse: bool, mesh,
               sp_strategy: str = "ulysses", reference_latents=None):
    """Single DiT forward — used by the sliding-window (long video) path
    where the window shape varies per call (jit caches per shape)."""
    return wan_dit_forward(
        params, dit_cfg, x, t, c, y=y, clip_feature=clip_feature,
        fuse_vae_embedding_in_latents=fuse, mesh=mesh,
        sp_strategy=sp_strategy, t_mod_bias=t_mod_bias,
        reference_latents=reference_latents,
    )


def _as_pil(image, width, height):
    from PIL import Image

    if isinstance(image, (np.ndarray, jnp.ndarray)):
        image = Image.fromarray(np.asarray(image))
    return image.resize((width, height))


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
    image_encoder_params: Any = None  # open-CLIP ViT-H (I2V clip conditioning)
    image_encoder_cfg: Any = None
    motion_controller_params: Any = None  # speed control (t_mod bias)
    motion_controller_cfg: Any = None
    vace_params: Any = None  # VACE control branch (aux_models)
    vace_cfg: Any = None
    s2v_params: Any = None  # speech-to-video DiT (models.wan.s2v)
    s2v_cfg: Any = None
    wav2vec_params: Any = None  # audio feature extractor (models.wan.wav2vec)
    wav2vec_cfg: Any = None
    camera_params: Any = None  # camera-control SimpleAdapter (models.wan.camera)
    camera_cfg: Any = None
    animate_params: Any = None  # Wan-Animate adapter (models.wan.animate)
    animate_cfg: Any = None
    vap_params: Any = None  # VAP/MoT side branch (models.wan.mot)
    vap_cfg: Any = None
    longcat_params: Any = None  # LongCat-Video DiT (models.wan.longcat)
    longcat_cfg: Any = None
    mesh: Any = None  # jax.sharding.Mesh — sequence parallelism inside the DiT
    sp_strategy: str = "ulysses"  # 'ulysses' | 'ring' (parallel/ring.py)
    dtype: Any = jnp.bfloat16
    steps_per_dispatch: int = 5  # denoise steps per jit dispatch

    @classmethod
    def from_pretrained(cls, model_paths, tokenizer_path=None,
                        dtype=jnp.bfloat16, hints=None, mesh=None,
                        sp_strategy: str = "ulysses"):
        """Hash-detected checkpoint loading (reference wan_video.py:98-169):
        throw DiT/VAE/UMT5 files at the pool, fetch by role.  Two DiT files
        become the (dit, dit2) two-expert pair.  With ``mesh``, params are
        replicated across it and the denoise program runs SPMD with the
        token axis sharded over the ``seq`` axis (the reference's
        ``enable_usp``, wan_video.py:84-95,165-169)."""
        from ..core.model_pool import ModelPool

        from ..models.wan.longcat import LongCatDiTConfig

        pool = ModelPool().load(model_paths, dtype=dtype, hints=hints)
        # "all": LongCat/S2V register under wan_video_dit too, so a fixed
        # index would silently drop a variant when dual-DiT + LongCat +
        # S2V checkpoints coexist — the type split below sorts them out
        dit = pool.fetch_model("wan_video_dit", index="all")
        dit2 = longcat = None
        entries = dit if isinstance(dit, list) else ([dit] if dit else [])
        # LongCat-Video and S2V register under wan_video_dit (the registry
        # maps their hashes there); split them off by config type
        from ..models.wan.s2v import S2VConfig

        longcats = [e for e in entries
                    if isinstance(e[1], LongCatDiTConfig)]
        s2vs = [e for e in entries if isinstance(e[1], S2VConfig)]
        entries = [e for e in entries
                   if not isinstance(e[1], (LongCatDiTConfig, S2VConfig))]
        longcat = longcats[0] if longcats else None
        s2v = s2vs[0] if s2vs else None
        wav2vec = pool.fetch_model("wans2v_audio_encoder")
        dit_params = dit_cfg = None
        if entries:
            (dit_params, dit_cfg), *rest = entries
            if rest:
                dit2 = rest[0][0]
        vae = pool.fetch_model("wan_video_vae")
        te = pool.fetch_model("wan_video_text_encoder")
        tokenizer = None
        if tokenizer_path is not None:
            from ..utils.tokenizer import HuggingfaceTokenizer

            tokenizer = HuggingfaceTokenizer(tokenizer_path, seq_len=512,
                                             clean="whitespace")
        pipe = cls(
            dit_params=dit_params, dit_cfg=dit_cfg,
            vae_params=vae[0] if vae else None, vae_cfg=vae[1] if vae else None,
            te_params=te[0] if te else None, te_cfg=te[1] if te else None,
            tokenizer=tokenizer, dit2_params=dit2, dtype=dtype,
            longcat_params=longcat[0] if longcat else None,
            longcat_cfg=longcat[1] if longcat else None,
            s2v_params=s2v[0] if s2v else None,
            s2v_cfg=s2v[1] if s2v else None,
            wav2vec_params=wav2vec[0] if wav2vec else None,
            wav2vec_cfg=wav2vec[1] if wav2vec else None,
        )
        if mesh is not None:
            pipe.use_mesh(mesh, sp_strategy=sp_strategy)
        return pipe

    def use_mesh(self, mesh, sp_strategy: str = "ulysses"):
        """Place params over ``mesh`` and run the denoise SPMD: Ulysses
        sequence parallelism over the seq axis, data parallelism for the CFG
        batch over the data axis, and — when the mesh has a tensor axis —
        the DiT FFN weights Megatron-split over it
        (parallel/tensor_parallel.py)."""
        from ..core.meshes import AXES, replicated

        rep = replicated(mesh)

        def put(tree):
            return None if tree is None else jax.device_put(tree, rep)

        if mesh.shape.get(AXES.tensor, 1) > 1:
            from ..parallel.tensor_parallel import shard_wan_dit_params

            put_dit = lambda t: None if t is None else shard_wan_dit_params(  # noqa: E731
                t, mesh, ffn_dim=self.dit_cfg.ffn_dim)
        else:
            put_dit = put
        self.dit_params = put_dit(self.dit_params)
        self.dit2_params = put_dit(self.dit2_params)
        self.vae_params = put(self.vae_params)
        self.te_params = put(self.te_params)
        self.mesh = mesh
        self.sp_strategy = sp_strategy
        return self

    def quantize(self, mode: str = "int8_ffn", *, act_amax=None,
                 alpha: float = 0.5, outlier_k=0):
        """Swap DiT block projections to W8A8 int8 (the reference's
        FP8-linear capability, ``core/vram/layers.py:321-357``, as the
        TPU-native int8 port — ops/quant.py).  mode: "int8_ffn" (FFN
        only, ~55% of DiT FLOPs) or "int8" (FFN + self/cross attention
        projections).  Measured on v5e: block 20.7 -> 17.2 ("int8_ffn")
        -> 14.9 ms ("int8"); W8A8 uses dynamic per-row activation scales,
        validate quality on your weights before production use.  Call
        AFTER load_lora (LoRA fuses into bf16 weights).

        ``act_amax``: per-channel calibration stats
        ({group: {name: (L, K)}},
        ``training.quant_experiment.calibrate_wan_dit_act_amax``)
        enabling the OUTLIER-ROBUST path — SmoothQuant scale migration at
        ``alpha`` plus a bf16 fallback for the ``outlier_k`` worst
        channels (int, or a selective dict like
        ``{"ffn": {"fc2": 8}}`` — the recommended placement, measured
        +3.1% vs plain int8; see tests/test_quant_outlier.py for the
        quality case).  With dual-expert pipelines the same stats apply
        to both DiTs (calibrate on the primary)."""
        from ..ops.quant import quantize_wan_dit_linears

        if mode not in ("int8_ffn", "int8"):
            raise ValueError(
                f"quantize mode must be 'int8_ffn' or 'int8', got {mode!r}")
        groups = (("ffn",) if mode == "int8_ffn"
                  else ("ffn", "self_attn", "cross_attn"))
        kw = dict(act_amax=act_amax, alpha=alpha, outlier_k=outlier_k)
        self.dit_params = quantize_wan_dit_linears(self.dit_params, groups,
                                                   consume=True, **kw)
        if self.dit2_params is not None:
            self.dit2_params = quantize_wan_dit_linears(
                self.dit2_params, groups, consume=True, **kw)
        return self

    def load_lora(self, lora_path_or_sd, alpha: float = 1.0,
                  hotload: bool = False):
        """Merge a LoRA into the DiT base weights at load time
        (reference base_pipeline.py:231-267 / utils/lora/general.py:44).

        ``hotload=True`` attaches it as runtime adapters instead
        (reference hot-load, base_pipeline.py:249-264): unfused, clearable
        with ``clear_lora()``, stacks across calls by rank-concatenation,
        and works on int8-quantized base weights.  Same-total-rank swaps
        keep pytree shapes, so the jitted denoise does not retrace."""
        from ..core.io import load_state_dict

        sd = (load_state_dict(lora_path_or_sd)
              if isinstance(lora_path_or_sd, str) else lora_path_or_sd)
        if hotload:
            from ..models.adapters import hot_lora_into_wan_dit

            self.dit_params, n = hot_lora_into_wan_dit(
                self.dit_params, sd, alpha=alpha, dtype=self.dtype)
            print(f"{n} tensors patched by LoRA (hot).")
        else:
            from ..models.adapters import fuse_lora_into_wan_dit

            self.dit_params, n = fuse_lora_into_wan_dit(
                self.dit_params, sd, self.dit_cfg, alpha=alpha
            )
            print(f"{n} tensors fused by LoRA.")
        return self

    def clear_lora(self):
        """Drop every hot-loaded LoRA (reference clear_lora,
        base_pipeline.py:269-277; fused LoRAs cannot be cleared)."""
        from ..models.adapters import clear_hot_lora

        self.dit_params, n = clear_hot_lora(self.dit_params)
        if self.dit2_params is not None:
            self.dit2_params, n2 = clear_hot_lora(self.dit2_params)
            n += n2
        print(f"{n} LoRA layers cleared.")
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

    def encode_input_video(self, input_video, tiled=False, tile_size=(34, 34),
                           tile_stride=(18, 16)):
        video = jnp.asarray(preprocess_video(input_video), self.dtype)
        if tiled:
            from ..models.wan.vae_tiling import vae38_tiled_encode

            return vae38_tiled_encode(
                self.vae_params, self.vae_cfg, video,
                tile_size=tile_size, tile_stride=tile_stride,
            ).astype(self.dtype)
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

    def encode_vace_context(self, vace_video, vace_video_mask,
                            vace_reference_image, height, width, num_frames,
                            tiled=False, tile_size=(34, 34),
                            tile_stride=(18, 16)):
        """VACE control conditioning — reference WanVideoUnit_VACE
        (wan_video.py:616-677): inactive/reactive VAE latents + 64-channel
        pixel-shuffled mask latents (+ optional reference frames prepended
        with zero masks).  Returns (vace_context, num_ref_frames)."""
        if vace_video is None:
            vv = jnp.zeros((1, 3, num_frames, height, width), self.dtype)
        else:
            vv = jnp.asarray(preprocess_video(vace_video), self.dtype)
        if vace_video_mask is None:
            vm = jnp.ones_like(vv)
        else:
            vm = jnp.asarray(
                preprocess_video(vace_video_mask, min_value=0, max_value=1),
                self.dtype,
            )
            if vm.shape != vv.shape:
                raise ValueError(
                    f"vace_video_mask frames/size {vm.shape} must match "
                    f"vace_video {vv.shape}"
                )

        def _encode(x):
            # the reference's VACE unit honors the pipeline tiling kwargs
            # for these encodes (wan_video.py:645-646)
            if tiled:
                from ..models.wan.vae_tiling import vae38_tiled_encode

                return vae38_tiled_encode(
                    self.vae_params, self.vae_cfg, x,
                    tile_size=tile_size, tile_stride=tile_stride)
            return vae38_encode(self.vae_params, self.vae_cfg, x)

        inactive = _encode(vv * (1 - vm))
        reactive = _encode(vv * vm)
        vace_video_latents = jnp.concatenate([inactive, reactive], axis=1)

        # mask: (T, H, W) -> (1, 64, T, H/8, W/8) pixel shuffle, then
        # nearest-exact temporal resize to (T+3)//4 (reference :649-651)
        m = vm[0, 0]  # (T, H, W)
        T, H, W = m.shape
        m = m.reshape(T, H // 8, 8, W // 8, 8).transpose(2, 4, 0, 1, 3)
        m = m.reshape(1, 64, T, H // 8, W // 8)
        t_new = (T + 3) // 4
        idx = jnp.clip(
            jnp.floor((jnp.arange(t_new) + 0.5) * T / t_new).astype(jnp.int32),
            0, T - 1,
        )
        vace_mask_latents = m[:, :, idx]

        n_ref = 0
        if vace_reference_image is not None:
            refs = (vace_reference_image
                    if isinstance(vace_reference_image, list)
                    else [vace_reference_image])
            n_ref = len(refs)
            ref_lat = [
                vae38_encode(
                    self.vae_params, self.vae_cfg,
                    jnp.asarray(preprocess_image(r), self.dtype)[None][:, :, None],
                )
                for r in refs
            ]
            ref_lat = jnp.concatenate(ref_lat, axis=2)
            ref_lat = jnp.concatenate([ref_lat, jnp.zeros_like(ref_lat)], axis=1)
            vace_video_latents = jnp.concatenate([ref_lat, vace_video_latents], axis=2)
            vace_mask_latents = jnp.concatenate(
                [jnp.zeros_like(vace_mask_latents[:, :, :n_ref]), vace_mask_latents],
                axis=2,
            )
        ctx = jnp.concatenate([vace_video_latents.astype(self.dtype),
                               vace_mask_latents.astype(self.dtype)], axis=1)
        return ctx, n_ref

    def encode_camera_control(self, direction, speed, input_image,
                              height, width, num_frames):
        """Camera-control conditioning — reference
        WanVideoUnit_FunCameraControl (wan_video.py:550-597): plücker
        embedding -> 4-fold temporal grouping -> SimpleAdapter features
        (precomputed ONCE; the reference recomputes them every step), plus
        the first-frame ``y`` latent conditioning."""
        from ..models.wan.camera import (
            generate_camera_coordinates, process_pose_file,
            simple_adapter_forward,
        )

        valid = ("Left", "Right", "Up", "Down", "LeftUp", "LeftDown",
                 "RightUp", "RightDown")
        if direction not in valid:
            raise ValueError(
                f"camera_control_direction {direction!r} not in {valid}")
        coords = generate_camera_coordinates(direction, num_frames, speed)
        plucker = process_pose_file(coords, width=width, height=height)
        v = np.asarray(plucker).transpose(3, 0, 1, 2)[None]  # (1,6,F,H,W)
        v = np.concatenate([np.repeat(v[:, :, 0:1], 4, axis=2), v[:, :, 1:]],
                           axis=2)  # (1, 6, F+3, H, W)
        b, c, f4, H, W = v.shape
        # torch view/transpose chain (reference :566-575): (b, c·4, f4/4, H, W)
        v = v.transpose(0, 2, 1, 3, 4).reshape(b, f4 // 4, 4, c, H, W)
        v = v.transpose(0, 1, 3, 2, 4, 5).reshape(b, f4 // 4, c * 4, H, W)
        v = v.transpose(0, 2, 1, 3, 4)
        cam = simple_adapter_forward(
            self.camera_params, self.camera_cfg, jnp.asarray(v, self.dtype)
        )  # (B, D, f, h, w)
        B, D = cam.shape[:2]
        cam_tokens = cam.reshape(B, D, -1).transpose(0, 2, 1)

        # first-frame y conditioning (reference :577-596)
        z = self.vae_cfg.z_dim
        lat_shape = self._latent_shape(height, width, num_frames)
        if self.dit_cfg.in_dim - z == z:
            img_lat = self.encode_first_frame(input_image, height, width)
            y = jnp.zeros(lat_shape, self.dtype)
            y = y.at[:, :, :1].set(img_lat)
        else:
            y = self.encode_i2v_conditioning(input_image, height, width,
                                             num_frames)
        return cam_tokens.astype(self.dtype), y

    def encode_animate_inpaint(self, inpaint_video, mask_video, ref_image,
                               height, width):
        """Wan-Animate inpaint conditioning — reference
        WanVideoUnit_AnimateInpaint (wan_video.py:954-996): ref-image y
        frame (mask=1 on frame 0) prepended to background-video y frames
        with the inverted mask video."""
        def i2v_mask(lat_t, lat_h, lat_w, mask_len=1, mask_pix=None):
            if mask_pix is None:
                msk = jnp.zeros((1, (lat_t - 1) * 4 + 1, lat_h, lat_w),
                                jnp.float32)
            else:
                msk = mask_pix
            if mask_len:
                msk = msk.at[:, :mask_len].set(1.0)
            msk = jnp.concatenate(
                [jnp.repeat(msk[:, 0:1], 4, axis=1), msk[:, 1:]], axis=1)
            msk = msk.reshape(1, msk.shape[1] // 4, 4, lat_h, lat_w)
            return msk.transpose(0, 2, 1, 3, 4)[0]

        bg = jnp.asarray(preprocess_video(inpaint_video), self.dtype)
        y_reft = vae38_encode(self.vae_params, self.vae_cfg, bg)[0]
        _, lat_t, lat_h, lat_w = y_reft.shape

        ref = jnp.asarray(preprocess_video([ref_image]), self.dtype)
        ref_lat = vae38_encode(self.vae_params, self.vae_cfg, ref)
        mask_ref = i2v_mask(1, lat_h, lat_w, 1)
        y_ref = jnp.concatenate([mask_ref.astype(self.dtype), ref_lat[0]])

        mask_pix = 1.0 - jnp.asarray(
            preprocess_video(mask_video, min_value=0, max_value=1), jnp.float32
        )[0, 0]  # (T, H, W)
        T = mask_pix.shape[0]
        ih = (jnp.arange(lat_h) * mask_pix.shape[1] // lat_h).astype(jnp.int32)
        iw = (jnp.arange(lat_w) * mask_pix.shape[2] // lat_w).astype(jnp.int32)
        mask_pix = mask_pix[:, ih][:, :, iw][None]  # (1, T, lat_h, lat_w)
        msk_reft = i2v_mask(lat_t, lat_h, lat_w, 0, mask_pix=mask_pix)
        y_reft = jnp.concatenate([msk_reft.astype(self.dtype), y_reft])
        return jnp.concatenate([y_ref, y_reft], axis=1)[None]

    def encode_clip_feature(self, input_image):
        """I2V CLIP image conditioning — reference ImageEmbedderCLIP
        (wan_video.py:421-441) via the open-CLIP ViT-H visual tower."""
        from ..models.wan.image_encoder import encode_image

        img = jnp.asarray(preprocess_image(input_image), self.dtype)[None]
        return encode_image(
            self.image_encoder_params, self.image_encoder_cfg, img
        ).astype(self.dtype)

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
        # Speed control (reference SpeedControl unit, wan_video.py:601)
        motion_bucket_id: Optional[int] = None,
        # VACE (reference WanVideoUnit_VACE, wan_video.py:616-677)
        vace_video=None,
        vace_video_mask=None,
        vace_reference_image=None,
        vace_scale: float = 1.0,
        # Speech-to-video (reference WanVideoUnit_S2V, wan_video.py:806-896)
        audio_embeds=None,  # precomputed wav2vec features (1, 25, D, T)
        input_audio=None,  # raw waveform (T,) — encoded via wav2vec_params
        audio_sample_rate: int = 16000,
        longcat_video=None,  # LongCat continuation frames (video)
        s2v_pose_video=None,
        s2v_pose_latents=None,
        motion_video=None,
        # Camera control (reference WanVideoUnit_FunCameraControl,
        # wan_video.py:550-597)
        camera_control_direction: Optional[str] = None,
        camera_control_speed: float = 1 / 54,
        # Fun-Reference (reference WanVideoUnit_FunReference, wan_video.py:527)
        reference_image=None,
        # Animate (reference wan_video.py:901-996 units)
        animate_pose_video=None,
        animate_face_video=None,
        animate_inpaint_video=None,
        animate_mask_video=None,
        # VAP / video-as-prompt (reference WanVideoUnit_VAP, wan_video.py:679)
        vap_video=None,
        vap_prompt: str = " ",
        negative_vap_prompt: str = " ",
        context_vap=None,
        negative_context_vap=None,
        # VAE tiling (reference wan_video.py:233-235, latent-space units)
        tiled: bool = False,
        tile_size: Tuple[int, int] = (30, 52),
        tile_stride: Tuple[int, int] = (15, 26),
        # Temporal sliding window (reference wan_video.py:236-238,1158-1182)
        sliding_window_size: Optional[int] = None,
        sliding_window_stride: Optional[int] = None,
        # TeaCache (reference wan_video.py:241-253)
        tea_cache_l1_thresh: Optional[float] = None,
        tea_cache_model_id: str = "Wan2.1-T2V-1.3B",
        streaming_vae: bool = False,
        vae_frames_per_chunk: int = 1,  # >1: batch latent frames per streamed
        # decode dispatch (same causal math, fp-reassociation drift only;
        # models/wan/vae.py vae38_decode_core)
        output_type: str = "quantized",
        torch_compat_noise: bool = False,
        progress_callback=None,  # callable(steps_done, total_steps)
    ):
        self._vae_fpc = int(vae_frames_per_chunk)
        seed = 0 if seed is None else seed  # same contract as the t2i pipes
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
            if self.tokenizer is not None:
                negative_context = self.encode_prompt(negative_prompt)
            else:
                warnings.warn(
                    "cfg_scale != 1 but no tokenizer/text encoder is loaded: "
                    "substituting a ZERO negative-context embedding, which "
                    "differs from the reference's empty-prompt embedding "
                    "(wan_video.py:404-412). Pass negative_context= for "
                    "faithful CFG.",
                    stacklevel=2,
                )
                negative_context = jnp.zeros_like(context)

        if self.longcat_params is not None:
            return self._generate_longcat(
                context, negative_context, longcat_video,
                height=height, width=width, num_frames=num_frames,
                cfg_scale=cfg_scale, seed=seed,
                num_inference_steps=num_inference_steps,
                sigma_shift=sigma_shift, streaming_vae=streaming_vae,
                output_type=output_type,
                torch_compat_noise=torch_compat_noise,
            )

        if input_audio is not None and audio_embeds is None:
            # reference WanVideoUnit_S2V.process_audio (wan_video.py:815-824):
            # wav2vec all-layer features -> 30 fps -> fps-bucketed embeds;
            # first bucket drives this clip (batch_frames = num_frames - 1)
            assert self.wav2vec_params is not None, "no audio encoder loaded"
            from ..models.wan.wav2vec import audio_embeds_from_waveform

            audio_embeds = audio_embeds_from_waveform(
                self.wav2vec_params, self.wav2vec_cfg, input_audio,
                sample_rate=audio_sample_rate, num_frames=num_frames,
            )[0]

        if audio_embeds is not None:
            assert self.s2v_params is not None, "no S2V model loaded"
            return self._generate_s2v(
                context, negative_context, audio_embeds,
                input_image=input_image, s2v_pose_video=s2v_pose_video,
                s2v_pose_latents=s2v_pose_latents, motion_video=motion_video,
                height=height, width=width, num_frames=num_frames,
                cfg_scale=cfg_scale, seed=seed,
                num_inference_steps=num_inference_steps,
                sigma_shift=sigma_shift, tiled=tiled, tile_size=tile_size,
                tile_stride=tile_stride, streaming_vae=streaming_vae,
                output_type=output_type,
                torch_compat_noise=torch_compat_noise,
            )

        if vap_video is not None:
            assert self.vap_params is not None, "no VAP/MoT branch loaded"
            return self._generate_vap(
                context, negative_context, vap_video, vap_prompt,
                negative_vap_prompt, context_vap, negative_context_vap,
                input_image=input_image, end_image=end_image,
                height=height, width=width, num_frames=num_frames,
                cfg_scale=cfg_scale, seed=seed,
                num_inference_steps=num_inference_steps,
                sigma_shift=sigma_shift, streaming_vae=streaming_vae,
                output_type=output_type,
                torch_compat_noise=torch_compat_noise,
            )

        # VACE control conditioning
        vace_context, n_ref = None, 0
        if (vace_video is not None or vace_video_mask is not None
                or vace_reference_image is not None):
            assert self.vace_params is not None, "no VACE branch loaded"
            vace_context, n_ref = self.encode_vace_context(
                vace_video, vace_video_mask, vace_reference_image,
                height, width, num_frames, tiled=tiled,
                tile_size=tile_size, tile_stride=tile_stride,
            )

        # Noise / latents (+n_ref reference frames rolled to the front,
        # reference NoiseInitializer wan_video.py:354-362)
        shape = self._latent_shape(height, width, num_frames)
        if n_ref:
            shape = shape[:2] + (shape[2] + n_ref,) + shape[3:]
        noise = generate_noise(shape, seed=seed, dtype=self.dtype,
                               torch_compat=torch_compat_noise)
        if n_ref:
            noise = jnp.concatenate(
                [noise[:, :, -n_ref:], noise[:, :, :-n_ref]], axis=2
            )
        latents = noise

        scheduler = FlowMatchScheduler("Wan").set_timesteps(
            num_inference_steps, denoising_strength=denoising_strength, shift=sigma_shift
        )

        if input_video is not None:
            input_latents = self.encode_input_video(
                input_video, tiled=tiled, tile_size=tile_size,
                tile_stride=tile_stride,
            )
            latents = scheduler.add_noise(input_latents, noise, 0)

        def as_pil(image):
            return _as_pil(image, width, height)

        first_frame_latents = None
        y = None
        clip_feature = None
        # camera control builds its own y conditioning (reference
        # FunCameraControl owns the "y" output param, wan_video.py:554)
        if input_image is not None and camera_control_direction is None:
            if self.dit_cfg.fuse_vae_embedding_in_latents:
                img = as_pil(input_image)
                first_frame_latents = self.encode_first_frame(img, height, width)
                latents = latents.at[:, :, 0:1].set(first_frame_latents)
            elif self.dit_cfg.require_vae_embedding:
                # I2V-A14B path (reference ImageEmbedderVAE, wan_video.py:444)
                img = as_pil(input_image)
                y = self.encode_i2v_conditioning(
                    img, height, width, num_frames,
                    end_image=as_pil(end_image) if end_image is not None else None,
                )
            else:
                raise NotImplementedError(
                    f"input_image given but the loaded DiT config (fuse_vae="
                    f"{self.dit_cfg.fuse_vae_embedding_in_latents}, require_vae="
                    f"{self.dit_cfg.require_vae_embedding}) supports no image "
                    "conditioning path — refusing to silently run T2V."
                )
            if self.dit_cfg.require_clip_embedding:
                if self.image_encoder_params is None:
                    raise ValueError(
                        "this DiT requires CLIP image conditioning "
                        "(require_clip_embedding=True) but no image encoder "
                        "is loaded"
                    )
                clip_feature = self.encode_clip_feature(as_pil(input_image))

        reference_latents = None
        if reference_image is not None:
            # FunReference unit (wan_video.py:527-546)
            ref = jnp.asarray(
                preprocess_video([as_pil(reference_image)]), self.dtype
            )
            reference_latents = vae38_encode(self.vae_params, self.vae_cfg, ref)
            if self.dit_cfg.require_clip_embedding and clip_feature is None:
                clip_feature = self.encode_clip_feature(as_pil(reference_image))

        pose_latents = None
        face_pixel_values = None
        face_pixel_values_nega = None
        if animate_pose_video is not None and animate_face_video is not None:
            # AnimateVideoSplit trims control videos 4 frames short of the
            # input video (reference wan_video.py:908-920)
            if input_video is not None:
                n_keep = len(input_video) - 4
                animate_pose_video = animate_pose_video[:n_keep]
                animate_face_video = animate_face_video[:n_keep]
                if animate_inpaint_video is not None:
                    animate_inpaint_video = animate_inpaint_video[:n_keep]
                if animate_mask_video is not None:
                    animate_mask_video = animate_mask_video[:n_keep]
            pv = jnp.asarray(preprocess_video(animate_pose_video), self.dtype)
            pose_latents = vae38_encode(self.vae_params, self.vae_cfg, pv)
            face_pixel_values = jnp.asarray(
                preprocess_video(animate_face_video), self.dtype
            )
            # CFG negative branch uses a blanked (-1) face video
            # (reference AnimateFacePixelValues unit, wan_video.py:948-951)
            face_pixel_values_nega = jnp.zeros_like(face_pixel_values) - 1
            if animate_inpaint_video is not None and animate_mask_video is not None:
                y = self.encode_animate_inpaint(
                    animate_inpaint_video, animate_mask_video,
                    as_pil(input_image), height, width,
                )

        control_camera_tokens = None
        if camera_control_direction is not None:
            assert self.camera_params is not None, "no camera adapter loaded"
            assert input_image is not None, "camera control needs input_image"
            control_camera_tokens, y = self.encode_camera_control(
                camera_control_direction, camera_control_speed,
                as_pil(input_image), height, width, num_frames,
            )

        t_mod_bias = None
        if motion_bucket_id is not None:
            from ..models.wan.aux_models import motion_controller_forward

            t_mod_bias = motion_controller_forward(
                self.motion_controller_params, self.motion_controller_cfg,
                jnp.asarray([motion_bucket_id], jnp.float32),
            ).astype(self.dtype)

        latents = self._denoise(
            latents, context, negative_context, scheduler,
            first_frame_latents=first_frame_latents, y=y,
            clip_feature=clip_feature, t_mod_bias=t_mod_bias,
            vace_context=vace_context, vace_scale=vace_scale,
            camera_tokens=control_camera_tokens,
            reference_latents=reference_latents,
            pose_latents=pose_latents,
            face_pixel_values=face_pixel_values,
            face_pixel_values_nega=face_pixel_values_nega,
            cfg_scale=cfg_scale, cfg_merge=cfg_merge,
            switch_dit_boundary=switch_dit_boundary,
            sliding_window_size=sliding_window_size,
            sliding_window_stride=sliding_window_stride,
            tea_cache_l1_thresh=tea_cache_l1_thresh,
            tea_cache_model_id=tea_cache_model_id,
            num_inference_steps=num_inference_steps,
            progress_callback=progress_callback,
        )
        if n_ref:
            # drop the denoised reference frames (reference wan_video.py:312-317)
            latents = latents[:, :, n_ref:]
        if pose_latents is not None:
            # animate: frame 0 is the reference-y frame (wan_video.py:312-317)
            latents = latents[:, :, 1:]

        return self._decode_output(latents, output_type=output_type,
                                   streaming_vae=streaming_vae, tiled=tiled,
                                   tile_size=tile_size,
                                   tile_stride=tile_stride)

    def _decode_output(self, latents, *, output_type, streaming_vae=False,
                       tiled=False, tile_size=(30, 52),
                       tile_stride=(15, 26)):
        """Shared output tail of every generation path: latents ->
        (optionally tiled / streamed) VAE decode -> floatpoint or
        quantized frames."""
        if self.vae_params is None or output_type == "latents":
            return latents
        if tiled:
            from ..models.wan.vae_tiling import vae38_tiled_decode

            video = vae38_tiled_decode(
                self.vae_params, self.vae_cfg, latents.astype(self.dtype),
                tile_size=tile_size, tile_stride=tile_stride,
                mesh=self.mesh,
            )
        else:
            video = vae38_decode(self.vae_params, self.vae_cfg,
                                 latents.astype(self.dtype),
                                 streaming=streaming_vae,
                                 frames_per_chunk=getattr(self, "_vae_fpc", 1))
        if output_type == "floatpoint":
            return video
        return postprocess_video(np.asarray(video.astype(jnp.float32)))

    # ------------------------------------------------------------------ vap
    def _generate_vap(self, context, negative_context, vap_video, vap_prompt,
                      negative_vap_prompt, context_vap, negative_context_vap,
                      *, input_image, end_image, height, width, num_frames,
                      cfg_scale, seed, num_inference_steps, sigma_shift,
                      streaming_vae, output_type, torch_compat_noise):
        """Video-as-prompt generation — ports WanVideoUnit_VAP (reference
        wan_video.py:679-755) and the MoT joint-attention denoise
        (:1278-1346): the reference video rides a frozen side branch whose
        kv join the main self-attention at the mot layers."""
        # VAP prompt contexts (posi/nega)
        if context_vap is None:
            context_vap = self.encode_prompt(vap_prompt)
        use_cfg = cfg_scale != 1.0 and negative_context is not None
        if use_cfg and negative_context_vap is None:
            negative_context_vap = (self.encode_prompt(negative_vap_prompt)
                                    if self.tokenizer is not None
                                    else jnp.zeros_like(context_vap))

        first = vap_video[0]
        vap_clip_feature = None
        if self.vap_cfg.has_image_input:
            vap_clip_feature = self.encode_clip_feature(
                _as_pil(first, width, height))

        # vap_hidden_state = [VAE(vap video), i2v mask+y of its first frame]
        vv = jnp.asarray(preprocess_video(vap_video), self.dtype)
        vap_latent = vae38_encode(self.vae_params, self.vae_cfg, vv)
        y_vap = self.encode_i2v_conditioning(
            _as_pil(first, width, height), height, width, num_frames,
            end_image=(_as_pil(vap_video[-1], width, height)
                       if end_image is not None else None),
        )
        vap_hidden_state = jnp.concatenate([vap_latent, y_vap], axis=1)

        # main-branch conditioning (I2V y + clip)
        y = None
        clip_feature = None
        if input_image is not None:
            img = _as_pil(input_image, width, height)
            if self.dit_cfg.require_vae_embedding:
                y = self.encode_i2v_conditioning(
                    img, height, width, num_frames,
                    end_image=(_as_pil(end_image, width, height)
                               if end_image is not None else None),
                )
            if self.dit_cfg.require_clip_embedding:
                clip_feature = self.encode_clip_feature(img)

        shape = self._latent_shape(height, width, num_frames)
        latents = generate_noise(shape, seed=seed, dtype=self.dtype,
                                 torch_compat=torch_compat_noise)
        scheduler = FlowMatchScheduler("Wan").set_timesteps(
            num_inference_steps, shift=sigma_shift)
        sigmas = jnp.asarray(np.append(scheduler.sigmas, 0.0), jnp.float32)
        timesteps = jnp.asarray(scheduler.timesteps, jnp.float32)
        cfg_scale = jnp.asarray(cfg_scale, jnp.float32)

        for i in range(num_inference_steps):
            t1 = jnp.broadcast_to(timesteps[i], (1,))
            v = _vap_sweep(self.dit_params, self.vap_params, latents, t1,
                           context, y, clip_feature, vap_hidden_state,
                           context_vap, vap_clip_feature,
                           dit_cfg=self.dit_cfg, mot_cfg=self.vap_cfg)
            if use_cfg:
                v_n = _vap_sweep(self.dit_params, self.vap_params, latents,
                                 t1, negative_context, y, clip_feature,
                                 vap_hidden_state, negative_context_vap,
                                 vap_clip_feature,
                                 dit_cfg=self.dit_cfg, mot_cfg=self.vap_cfg)
                v = v_n + cfg_scale.astype(v.dtype) * (v - v_n)
            dt = (sigmas[i + 1] - sigmas[i]).astype(latents.dtype)
            latents = latents + v.astype(latents.dtype) * dt

        return self._decode_output(latents, output_type=output_type,
                                   streaming_vae=streaming_vae)

    # ------------------------------------------------------------------ s2v
    def _generate_longcat(self, context, negative_context, longcat_video, *,
                          height, width, num_frames, cfg_scale, seed,
                          num_inference_steps, sigma_shift, streaming_vae,
                          output_type, torch_compat_noise):
        """LongCat-Video generation / continuation — ports
        WanVideoUnit_LongCatVideo (reference wan_video.py:999-1015) and the
        model_fn_longcat_video denoise (:1391-1418): conditioning frames
        from the VAE-encoded input video are overwritten into the latents
        every step, and the model output is negated."""
        shape = self._latent_shape(height, width, num_frames)
        latents = generate_noise(shape, seed=seed, dtype=self.dtype,
                                 torch_compat=torch_compat_noise)
        cond_latents = None
        num_cond = 0
        if longcat_video is not None:
            lv = jnp.asarray(preprocess_video(longcat_video), self.dtype)
            cond_latents = vae38_encode(self.vae_params, self.vae_cfg, lv)
            num_cond = cond_latents.shape[2]
            latents = latents.at[:, :, :num_cond].set(cond_latents)

        scheduler = FlowMatchScheduler("Wan").set_timesteps(
            num_inference_steps, shift=sigma_shift
        )
        sigmas = jnp.asarray(np.append(scheduler.sigmas, 0.0), jnp.float32)
        timesteps = jnp.asarray(scheduler.timesteps, jnp.float32)
        use_cfg = cfg_scale != 1.0 and negative_context is not None
        cfg_scale = jnp.asarray(cfg_scale, jnp.float32)

        for i in range(num_inference_steps):
            t1 = jnp.broadcast_to(timesteps[i], (1,))
            v = _longcat_sweep(self.longcat_params, latents, t1, context,
                               lc_cfg=self.longcat_cfg, num_cond=num_cond)
            if use_cfg:
                v_n = _longcat_sweep(self.longcat_params, latents, t1,
                                     negative_context,
                                     lc_cfg=self.longcat_cfg,
                                     num_cond=num_cond)
                v = v_n + cfg_scale.astype(v.dtype) * (v - v_n)
            dt = (sigmas[i + 1] - sigmas[i]).astype(latents.dtype)
            latents = latents + v.astype(latents.dtype) * dt
            if cond_latents is not None:
                latents = latents.at[:, :, :num_cond].set(cond_latents)

        return self._decode_output(latents, output_type=output_type,
                                   streaming_vae=streaming_vae)

    def _generate_s2v(self, context, negative_context, audio_embeds, *,
                      input_image, s2v_pose_video, s2v_pose_latents,
                      motion_video, height, width, num_frames, cfg_scale,
                      seed, num_inference_steps, sigma_shift, tiled,
                      tile_size, tile_stride, streaming_vae, output_type,
                      torch_compat_noise):
        """Speech-to-video generation — ports WanVideoUnit_S2V
        (reference wan_video.py:806-896), the model_fn_wans2v denoise
        (:1421-1519) and WanVideoPostUnit_S2V (:898).

        latents frame 0 is the VAE-encoded reference image (passed through
        the model untouched and re-pinned every step); the CFG negative
        branch uses ZERO audio embeddings (:871-873)."""
        motion_frames = 73
        # motion latents — only used when a motion video is given (the
        # reference encodes a zeros video even under its
        # drop_motion_frames=True default, where the model ignores it;
        # we skip that wasted VAE encode)
        if motion_video is not None:
            mv = jnp.asarray(preprocess_video(motion_video), self.dtype)
            assert mv.shape[2] == motion_frames, mv.shape
            drop_motion = False
            motion_latents = vae38_encode(self.vae_params, self.vae_cfg, mv)
        else:
            drop_motion = True
            motion_latents = None

        # pose conditioning (reference :841-862)
        if s2v_pose_latents is None and s2v_pose_video is not None:
            infer_frames = num_frames - 1
            pv = jnp.asarray(preprocess_video(s2v_pose_video), self.dtype)
            pv = pv[:, :, :infer_frames]
            pad = infer_frames - pv.shape[2]
            if pad > 0:
                pv = jnp.concatenate(
                    [pv, -jnp.ones((1, 3, pad, height, width), self.dtype)],
                    axis=2,
                )
            pv = jnp.concatenate([pv[:, :, 0:1], pv], axis=2)
            s2v_pose_latents = vae38_encode(self.vae_params, self.vae_cfg, pv)[:, :, 1:]

        # noise + reference first frame
        shape = self._latent_shape(height, width, num_frames)
        latents = generate_noise(shape, seed=seed, dtype=self.dtype,
                                 torch_compat=torch_compat_noise)
        ref_latents = None
        if input_image is not None:
            from PIL import Image

            img = input_image
            if isinstance(img, (np.ndarray, jnp.ndarray)):
                img = Image.fromarray(np.asarray(img))
            img = img.resize((width, height))
            ref_latents = self.encode_first_frame(img, height, width)
            latents = latents.at[:, :, 0:1].set(ref_latents)

        scheduler = FlowMatchScheduler("Wan").set_timesteps(
            num_inference_steps, shift=sigma_shift
        )
        sigmas = jnp.asarray(np.append(scheduler.sigmas, 0.0), jnp.float32)
        timesteps = jnp.asarray(scheduler.timesteps, jnp.float32)
        use_cfg = cfg_scale != 1.0 and negative_context is not None
        audio = jnp.asarray(audio_embeds, self.dtype)
        audio_zero = jnp.zeros_like(audio)
        cfg_scale = jnp.asarray(cfg_scale, jnp.float32)

        for i in range(num_inference_steps):
            t1 = jnp.broadcast_to(timesteps[i], (1,))
            v = _s2v_sweep(self.s2v_params, latents, t1, context, audio,
                           motion_latents, s2v_pose_latents,
                           s2v_cfg=self.s2v_cfg, drop_motion=drop_motion)
            if use_cfg:
                v_n = _s2v_sweep(self.s2v_params, latents, t1,
                                 negative_context, audio_zero,
                                 motion_latents, s2v_pose_latents,
                                 s2v_cfg=self.s2v_cfg, drop_motion=drop_motion)
                v = v_n + cfg_scale.astype(v.dtype) * (v - v_n)
            dt = (sigmas[i + 1] - sigmas[i]).astype(latents.dtype)
            latents = latents + v.astype(latents.dtype) * dt
            if ref_latents is not None:
                latents = latents.at[:, :, 0:1].set(ref_latents)

        # motion-video mode stitches motion latents before decode
        # (reference WanVideoPostUnit_S2V, wan_video.py:898-906)
        if not drop_motion:
            latents = jnp.concatenate([motion_latents, latents[:, :, 1:]], axis=2)

        return self._decode_output(latents, output_type=output_type,
                                   streaming_vae=streaming_vae)

    # --------------------------------------------------------------- denoise
    def _denoise(self, latents, context, negative_context, scheduler,
                 first_frame_latents, y, clip_feature, t_mod_bias,
                 cfg_scale, cfg_merge, switch_dit_boundary,
                 sliding_window_size, sliding_window_stride,
                 tea_cache_l1_thresh, tea_cache_model_id, num_inference_steps,
                 vace_context=None, vace_scale: float = 1.0,
                 camera_tokens=None, reference_latents=None,
                 pose_latents=None, face_pixel_values=None,
                 face_pixel_values_nega=None, progress_callback=None):
        sigmas = jnp.asarray(np.append(scheduler.sigmas, 0.0), jnp.float32)
        timesteps = jnp.asarray(scheduler.timesteps, jnp.float32)
        n = len(scheduler.timesteps)
        use_cfg = cfg_scale != 1.0 and negative_context is not None
        fuse = first_frame_latents is not None
        if not use_cfg:
            negative_context = None

        ffl = first_frame_latents if fuse else jnp.zeros_like(latents[:, :, :1])
        cfg_scale = jnp.asarray(cfg_scale, jnp.float32)

        if sliding_window_size is not None:
            assert tea_cache_l1_thresh is None, (
                "TeaCache and the temporal sliding window are mutually "
                "exclusive (per-window hidden-state shapes break the cache)"
            )
            if (vace_context is not None or pose_latents is not None
                    or camera_tokens is not None):
                # the reference either crashes (VACE hint/window token
                # mismatch) or silently drops (camera) these under the
                # temporal tiler — fail loudly instead
                raise ValueError(
                    "sliding-window denoising supports text / first-frame / "
                    "Fun-Reference / motion-bucket conditioning only; "
                    "VACE, animate and camera control have no defined "
                    "per-window semantics")
            return self._denoise_windowed(
                latents, context, negative_context, timesteps, sigmas, n,
                ffl=ffl, fuse=fuse, y=y, clip_feature=clip_feature,
                t_mod_bias=t_mod_bias, cfg_scale=cfg_scale,
                reference_latents=reference_latents,
                switch_dit_boundary=switch_dit_boundary,
                sliding_window_size=sliding_window_size,
                sliding_window_stride=sliding_window_stride,
            )

        tea_opts = None
        tea_a = tea_b = None
        if tea_cache_l1_thresh is not None:
            tea_opts = (tea_cache_model_id, float(tea_cache_l1_thresh),
                        int(num_inference_steps))
            tea_a, tea_b = self._init_tea_states(
                latents, use_cfg=use_cfg, cfg_merge=cfg_merge, fuse=fuse, y=y
            )

        vace_scale = jnp.asarray(vace_scale, jnp.float32)

        # Hoist the cross-attention k/v projections out of the denoise
        # loop — the prompt context is step-independent (exact; the
        # reference recomputes them every sweep).  Text-only conditioning
        # path; any context-mutating variant keeps the in-block compute.
        use_ckv = (self.mesh is None and not self.dit_cfg.has_image_input
                   and clip_feature is None and vace_context is None
                   and pose_latents is None)

        def run(params, lat, tea_a, tea_b, start, stop):
            ckv_p = ckv_n = None
            if use_ckv:
                if negative_context is not None and cfg_merge:
                    ckv_p = _cross_kv(
                        params, jnp.concatenate([context, negative_context]),
                        dit_cfg=self.dit_cfg)
                else:
                    ckv_p = _cross_kv(params, context, dit_cfg=self.dit_cfg)
                    if negative_context is not None:
                        ckv_n = _cross_kv(params, negative_context,
                                          dit_cfg=self.dit_cfg)
            s = start
            while s < stop:
                ln = min(self.steps_per_dispatch, stop - s)
                lat, tea_a, tea_b = _denoise_chunk(
                    params, lat, ffl, context, negative_context, y,
                    clip_feature, t_mod_bias,
                    self.vace_params if vace_context is not None else None,
                    vace_context, vace_scale, camera_tokens,
                    reference_latents,
                    self.animate_params if pose_latents is not None else None,
                    pose_latents, face_pixel_values, face_pixel_values_nega,
                    ckv_p, ckv_n,
                    timesteps, sigmas, cfg_scale,
                    tea_a, tea_b, jnp.int32(s),
                    dit_cfg=self.dit_cfg, length=ln, cfg_merge=cfg_merge,
                    fuse=fuse, mesh=self.mesh,
                    sp_strategy=self.sp_strategy, tea_opts=tea_opts,
                    vace_cfg=self.vace_cfg if vace_context is not None else None,
                    animate_cfg=(self.animate_cfg
                                 if pose_latents is not None else None),
                )
                s += ln
                if progress_callback is not None:
                    # per-dispatch progress for minute-long requests
                    # (serving streams this; the device work is async, so
                    # this reports dispatched steps, not retired ones)
                    progress_callback(int(s), int(n))
            return lat, tea_a, tea_b

        if self.dit2_params is not None:
            # Two-expert boundary switch (reference wan_video.py:287-290):
            # dit above the boundary, dit2 strictly below (equality stays
            # with the high-noise expert — reference uses `<`).
            boundary_idx = int(np.searchsorted(
                -scheduler.timesteps, -switch_dit_boundary * 1000, side="right"
            ))
            latents, tea_a, tea_b = run(self.dit_params, latents, tea_a, tea_b,
                                        0, boundary_idx)
            # TeaCache states deliberately carry across the expert switch:
            # the reference keeps one TeaCache object per CFG branch for
            # the whole loop and does not reset it when dit2 takes over
            # (wan_video.py:287-290 + :769-783) — exact parity
            latents, _, _ = run(self.dit2_params, latents, tea_a, tea_b,
                                boundary_idx, n)
        else:
            latents, _, _ = run(self.dit_params, latents, tea_a, tea_b, 0, n)
        return latents

    def _init_tea_states(self, latents, *, use_cfg, cfg_merge, fuse, y):
        """TeaCache state pytrees shaped for the DiT's internal token/t_mod
        layout (one state per CFG branch, reference wan_video.py:769-783)."""
        from ..utils.tea_cache import init_tea_cache_state

        cfg = self.dit_cfg
        b, c, F, H, W = latents.shape
        if y is not None and cfg.require_vae_embedding:
            pass  # y concat changes channels, not token count
        pt, ph, pw = cfg.patch_size
        s = (F // pt) * (H // ph) * (W // pw)
        if self.mesh is not None:
            from ..core.meshes import AXES

            sp = self.mesh.shape[AXES.seq]
            s += (-s) % sp
        b_eff = 2 * b if (use_cfg and cfg_merge) else b
        seg = cfg.seperated_timestep and fuse
        t_mod_shape = (b_eff, 2 if seg else 1, 6, cfg.dim)
        hidden_shape = (b_eff, s, cfg.dim)
        tea_a = init_tea_cache_state(t_mod_shape, hidden_shape, jnp.float32)
        tea_b = (init_tea_cache_state(t_mod_shape, hidden_shape, jnp.float32)
                 if (use_cfg and not cfg_merge) else None)
        return tea_a, tea_b

    def _denoise_windowed(self, latents, context, negative_context, timesteps,
                          sigmas, n, *, ffl, fuse, y, clip_feature, t_mod_bias,
                          cfg_scale, switch_dit_boundary,
                          sliding_window_size, sliding_window_stride,
                          reference_latents=None):
        """Long-video generation: per step, denoise overlapping temporal
        windows and blend (reference TemporalTiler_BCTHW dispatch,
        wan_video.py:1158-1182).  The per-window DiT sweep is jitted
        (cached per window shape); the blend runs in fp32."""
        from ..utils.temporal_tiler import temporal_tiled_model_fn

        use_cfg = negative_context is not None
        boundary_idx = (
            int(np.searchsorted(-np.asarray(timesteps), -switch_dit_boundary * 1000,
                                side="right"))
            if self.dit2_params is not None else n
        )

        for i in range(n):
            params = self.dit_params if i < boundary_idx else (
                self.dit2_params or self.dit_params)
            t1 = jnp.broadcast_to(timesteps[i], (latents.shape[0],))

            def model_fn(window, y=None):
                # reference_latents (Fun-Reference) is a single-image latent
                # prepended inside the DiT — time-independent, so it passes
                # through unsliced (the reference's tiler forwards it the
                # same way, wan_video.py:1168)
                v = _dit_sweep(params, window, t1, context, y, clip_feature,
                               t_mod_bias, dit_cfg=self.dit_cfg, fuse=fuse,
                               mesh=self.mesh, sp_strategy=self.sp_strategy,
                               reference_latents=reference_latents)
                if use_cfg:
                    v_n = _dit_sweep(params, window, t1, negative_context, y,
                                     clip_feature, t_mod_bias,
                                     dit_cfg=self.dit_cfg, fuse=fuse,
                                     mesh=self.mesh,
                                     sp_strategy=self.sp_strategy,
                                     reference_latents=reference_latents)
                    v = v_n + cfg_scale.astype(v.dtype) * (v - v_n)
                return v

            v = temporal_tiled_model_fn(
                model_fn, latents, sliding_window_size, sliding_window_stride,
                sliced_kwargs={"y": y},
            )
            dt = (sigmas[i + 1] - sigmas[i]).astype(latents.dtype)
            latents = latents + v.astype(latents.dtype) * dt
            if fuse:
                latents = latents.at[:, :, 0:1].set(ffl)
        return latents
