"""ModelPool: "throw checkpoint files at me" loading.

Port of the reference ``ModelPool.auto_load_model``
(``animation/diffsynth/models/model_loader.py:62-117``): hash each file's
key:shape set, match the registry, build the recognized models.  Builders
return (params, config) pytrees ready for jit; unported architectures are
reported and skipped instead of failing the whole load.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from .registry import MODEL_REGISTRY, ModelRegistry


def _build_wan_dit(state_dict, extra_kwargs, dtype):
    from ..models.wan.dit import WanDiTConfig, convert_dit_state_dict

    if "final_layer.adaLN_modulation.1.weight" in state_dict:
        # the registry maps LongCat-Video's hash to wan_video_dit
        # (it runs through WanVideoPipeline in the reference)
        from ..models.wan.longcat import (
            LongCatDiTConfig,
            convert_longcat_dit_state_dict,
        )

        cfg = LongCatDiTConfig()
        return convert_longcat_dit_state_dict(state_dict, cfg,
                                              dtype=dtype), cfg

    if "audio_dim" in extra_kwargs or "cond_dim" in extra_kwargs:
        # the registry maps the S2V DiT's hash to wan_video_dit too
        # (reference model_configs.py:286-287)
        from ..models.wan.s2v import S2VConfig, convert_s2v_state_dict

        s2v_fields = {f.name for f in dataclasses.fields(S2VConfig)}
        kwargs = {k: v for k, v in extra_kwargs.items() if k in s2v_fields}
        if "patch_size" in kwargs:
            kwargs["patch_size"] = tuple(kwargs["patch_size"])
        cfg = S2VConfig(**kwargs)
        return convert_s2v_state_dict(state_dict, cfg, dtype=dtype), cfg

    fields = {f.name for f in dataclasses.fields(WanDiTConfig)}
    kwargs = {k: v for k, v in extra_kwargs.items() if k in fields}
    unknown = set(extra_kwargs) - fields
    if unknown - {"eps"}:
        raise NotImplementedError(f"unsupported WanModel kwargs: {sorted(unknown)}")
    if "patch_size" in kwargs:
        kwargs["patch_size"] = tuple(kwargs["patch_size"])
    cfg = WanDiTConfig(**kwargs)
    return convert_dit_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_wan_vae(state_dict, extra_kwargs, dtype):
    from ..models.wan.vae import (
        WanVAEConfig,
        convert_vae38_state_dict,
        convert_vae_v1_state_dict,
    )

    keys = state_dict.keys()
    fields = {f.name for f in dataclasses.fields(WanVAEConfig)}
    kwargs = {k: v for k, v in extra_kwargs.items() if k in fields}
    for tup in ("dim_mult", "temperal_downsample"):
        if tup in kwargs:
            kwargs[tup] = tuple(kwargs[tup])
    if kwargs:  # resized/test checkpoints via hints / FAIRYGEN_MODEL_HINTS
        cfg = WanVAEConfig(**kwargs)
        convert = (convert_vae38_state_dict if cfg.arch == "38"
                   else convert_vae_v1_state_dict)
        return convert(state_dict, cfg, dtype=dtype), cfg
    probe = "model.conv2.weight" if "model.conv2.weight" in keys else "conv2.weight"
    z_dim = state_dict[probe].shape[0]
    if z_dim == 48:
        cfg = WanVAEConfig.wan22_38()
        return convert_vae38_state_dict(state_dict, cfg, dtype=dtype), cfg
    cfg = WanVAEConfig.wan21_16()
    return convert_vae_v1_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_umt5(state_dict, extra_kwargs, dtype):
    from ..models.wan.text_encoder import UMT5Config, convert_umt5_state_dict

    fields = {f.name for f in dataclasses.fields(UMT5Config)}
    kwargs = {k: v for k, v in extra_kwargs.items() if k in fields}
    cfg = UMT5Config(**kwargs) if kwargs else UMT5Config.umt5_xxl()
    return convert_umt5_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_flux_dit(state_dict, extra_kwargs, dtype):
    from ..models.flux.dit import (
        FluxDiTConfig,
        convert_flux_dit_state_dict,
        normalize_flux_dit_source,
    )

    state_dict = normalize_flux_dit_source(state_dict)
    kwargs = {}
    if "input_dim" in extra_kwargs:
        kwargs["in_dim"] = extra_kwargs["input_dim"]
    if "num_blocks" in extra_kwargs:
        kwargs["num_double_blocks"] = extra_kwargs["num_blocks"]
    kwargs["guidance_embed"] = (
        "guidance_embedder.timestep_embedder.0.weight" in state_dict)
    cfg = FluxDiTConfig(**kwargs)
    return convert_flux_dit_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_flux_clip(state_dict, extra_kwargs, dtype):
    from ..models.flux.text_encoders import (
        CLIPTextConfig,
        convert_flux_clip_state_dict,
    )
    from ..models.sdxl.clip import convert_clip_text_state_dict

    cfg = CLIPTextConfig()  # CLIP-L
    if "encoders.0.attn.to_q.weight" in state_dict:
        return convert_flux_clip_state_dict(state_dict, cfg, dtype=dtype), cfg
    return convert_clip_text_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_flux_t5(state_dict, extra_kwargs, dtype):
    from ..models.wan.text_encoder import (
        UMT5Config,
        convert_t5_encoder_state_dict,
    )

    cfg = UMT5Config.t5_v1_1_xxl()
    return convert_t5_encoder_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_flux_vae(state_dict, extra_kwargs, dtype):
    from ..models.flux.vae import (
        AutoencoderKLConfig,
        convert_flux_vae_bfl_state_dict,
        convert_flux_vae_state_dict,
    )

    cfg = AutoencoderKLConfig.flux()
    if "encoder.down.0.block.0.norm1.weight" in state_dict:
        return convert_flux_vae_bfl_state_dict(state_dict, cfg,
                                               dtype=dtype), cfg
    return convert_flux_vae_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_qwen_image_dit(state_dict, extra_kwargs, dtype):
    from ..models.qwen.dit import (
        QwenImageDiTConfig,
        convert_qwen_image_dit_state_dict,
    )

    cfg = QwenImageDiTConfig()
    if "num_layers" in extra_kwargs:
        cfg = QwenImageDiTConfig(num_layers=extra_kwargs["num_layers"])
    return convert_qwen_image_dit_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_qwen_image_te(state_dict, extra_kwargs, dtype):
    from ..models.qwen.text_encoder import (
        QwenVLTextConfig,
        convert_qwen_vl_text_state_dict,
    )

    cfg = QwenVLTextConfig.qwen2_5_vl_7b()
    params = convert_qwen_vl_text_state_dict(state_dict, cfg, dtype=dtype)
    if any("visual." in k for k in state_dict):
        from ..models.qwen.vision import (
            QwenVLVisionConfig,
            convert_qwen_vl_vision_state_dict,
        )

        vcfg = QwenVLVisionConfig.qwen2_5_vl_7b()
        params = {"text": params,
                  "vision": convert_qwen_vl_vision_state_dict(
                      state_dict, vcfg, dtype=dtype)}
        return params, (cfg, vcfg)
    return params, cfg


def _build_qwen_image_vae(state_dict, extra_kwargs, dtype):
    from ..models.qwen.vae import (
        WanVAEConfig,
        convert_qwen_image_vae_state_dict,
    )

    cfg = WanVAEConfig.wan21_16()
    return convert_qwen_image_vae_state_dict(state_dict, cfg,
                                             dtype=dtype), cfg


def _build_z_image_dit(state_dict, extra_kwargs, dtype):
    from ..models.z_image.dit import (
        ZImageDiTConfig,
        convert_z_image_dit_state_dict,
    )

    cfg = ZImageDiTConfig()
    return convert_z_image_dit_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_z_image_te(state_dict, extra_kwargs, dtype):
    from ..models.qwen.text_encoder import (
        QwenVLTextConfig,
        convert_qwen_vl_text_state_dict,
    )

    cfg = QwenVLTextConfig.qwen3_4b()
    return convert_qwen_vl_text_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_flux2_dit(state_dict, extra_kwargs, dtype):
    from ..models.flux2.dit import (
        Flux2DiTConfig,
        convert_flux2_dit_state_dict,
    )

    cfg = Flux2DiTConfig()
    return convert_flux2_dit_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_flux2_vae(state_dict, extra_kwargs, dtype):
    from ..models.flux2.vae import (
        convert_flux2_vae_state_dict,
        flux2_vae_config,
    )

    cfg = flux2_vae_config()
    return convert_flux2_vae_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_flux2_te(state_dict, extra_kwargs, dtype):
    from ..models.qwen.text_encoder import (
        QwenVLTextConfig,
        convert_qwen_vl_text_state_dict,
    )

    cfg = QwenVLTextConfig.mistral3_small()
    return convert_qwen_vl_text_state_dict(state_dict, cfg, dtype=dtype), cfg


def _build_nexus_gen_llm(state_dict, extra_kwargs, dtype):
    from ..models.qwen.nexus_gen import convert_nexus_gen_state_dict
    from ..models.qwen.text_encoder import QwenVLTextConfig

    cfg = QwenVLTextConfig.qwen2_5_vl_7b()
    params = convert_nexus_gen_state_dict(state_dict, cfg, dtype=dtype)
    if any("visual." in k for k in state_dict):
        from ..models.qwen.vision import (
            QwenVLVisionConfig,
            convert_qwen_vl_vision_state_dict,
        )

        vcfg = QwenVLVisionConfig.qwen2_5_vl_7b()
        return ({"text": params,
                 "vision": convert_qwen_vl_vision_state_dict(
                     state_dict, vcfg, dtype=dtype)}, (cfg, vcfg))
    return params, cfg


def _build_nexus_gen_adapter(state_dict, extra_kwargs, dtype):
    from ..models.qwen.nexus_gen import convert_nexus_gen_adapter_state_dict

    return convert_nexus_gen_adapter_state_dict(state_dict, dtype=dtype), None


def _build_nexus_gen_merger(state_dict, extra_kwargs, dtype):
    from ..models.qwen.nexus_gen import convert_nexus_gen_merger_state_dict

    return convert_nexus_gen_merger_state_dict(state_dict, dtype=dtype)


def _build_flux_controlnet(state_dict, extra_kwargs, dtype):
    from ..models.flux.controlnet import (
        convert_flux_controlnet_state_dict,
        detect_flux_controlnet_config,
        normalize_flux_controlnet_source,
    )

    state_dict = normalize_flux_controlnet_source(state_dict)
    cfg = detect_flux_controlnet_config(state_dict)
    if extra_kwargs:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, **extra_kwargs)
    return convert_flux_controlnet_state_dict(state_dict, cfg,
                                              dtype=dtype), cfg


def _build_qwen_blockwise_controlnet(state_dict, extra_kwargs, dtype):
    from ..models.qwen.controlnet import (
        convert_qwen_blockwise_controlnet_state_dict,
        detect_qwen_blockwise_controlnet_config,
    )

    cfg = detect_qwen_blockwise_controlnet_config(state_dict)
    if extra_kwargs:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, **extra_kwargs)
    return convert_qwen_blockwise_controlnet_state_dict(
        state_dict, cfg, dtype=dtype), cfg


def _build_flux_ipadapter(state_dict, extra_kwargs, dtype):
    import dataclasses as _dc

    from ..models.flux.ipadapter import (
        FluxIpAdapterConfig,
        convert_flux_ipadapter_state_dict,
    )

    cfg = FluxIpAdapterConfig()
    sd = state_dict
    if "ip_adapter" not in sd:
        kw = {}
        kv = sd.get("ipadapter_modules.0.to_k_ip.weight")
        if kv is not None:
            kw["cross_attention_dim"] = kv.shape[1]
        p2 = sd.get("image_proj.proj.2.weight")
        if p2 is not None and kv is not None:
            kw["num_tokens"] = p2.shape[0] // kv.shape[1]
        p0 = sd.get("image_proj.proj.0.weight")
        if p0 is not None:
            kw["id_embeddings_dim"] = p0.shape[1]
        cfg = _dc.replace(cfg, **kw)
    if extra_kwargs:
        cfg = _dc.replace(cfg, **extra_kwargs)
    return convert_flux_ipadapter_state_dict(state_dict, cfg,
                                             dtype=dtype), cfg


def _build_siglip_vision(state_dict, extra_kwargs, dtype):
    import dataclasses as _dc

    from ..models.siglip import (
        SiglipVisionConfig,
        convert_siglip_vision_state_dict,
    )

    sd = {(k[len("vision_model."):] if k.startswith("vision_model.")
           else k): v for k, v in state_dict.items()}
    pw = sd["embeddings.patch_embedding.weight"]
    npos = sd["embeddings.position_embedding.weight"].shape[0]
    fc1 = sd["encoder.layers.0.mlp.fc1.weight"]
    cfg = SiglipVisionConfig(
        hidden_size=pw.shape[0], intermediate_size=fc1.shape[0],
        num_layers=1 + max(int(k.split(".")[2]) for k in sd
                           if k.startswith("encoder.layers.")),
        patch_size=pw.shape[-1],
        image_size=pw.shape[-1] * int(npos ** 0.5))
    if extra_kwargs:
        cfg = _dc.replace(cfg, **extra_kwargs)
    return convert_siglip_vision_state_dict(sd, cfg, dtype=dtype), cfg


def _build_flux_value_controller(state_dict, extra_kwargs, dtype):
    from ..models.flux.value_control import (
        convert_single_value_encoder_state_dict,
    )

    return convert_single_value_encoder_state_dict(state_dict, dtype=dtype)


def _build_infiniteyou_projector(state_dict, extra_kwargs, dtype):
    from ..models.flux.infiniteyou import convert_infiniteyou_state_dict

    return convert_infiniteyou_state_dict(state_dict, dtype=dtype)


def _build_step1x_connector(state_dict, extra_kwargs, dtype):
    from ..models.flux.step1x import convert_step1x_connector_state_dict

    return convert_step1x_connector_state_dict(state_dict, dtype=dtype)


def _build_flux_lora_encoder(state_dict, extra_kwargs, dtype):
    from ..models.flux.lora_runtime import (
        convert_flux_lora_encoder_state_dict,
    )

    return convert_flux_lora_encoder_state_dict(state_dict, dtype=dtype)


def _build_flux_lora_patcher(state_dict, extra_kwargs, dtype):
    from ..models.flux.lora_runtime import (
        convert_flux_lora_patcher_state_dict,
    )

    return convert_flux_lora_patcher_state_dict(state_dict, dtype=dtype)


def _build_dinov3(state_dict, extra_kwargs, dtype):
    from ..models.dinov3 import convert_dinov3_state_dict

    return convert_dinov3_state_dict(state_dict, dtype=dtype)


def _build_qwen_image2lora(state_dict, extra_kwargs, dtype):
    from ..models.qwen.image2lora import convert_image2lora_state_dict

    cfg = None
    if extra_kwargs:
        from ..models.qwen.image2lora import QwenImage2LoRAConfig

        cfg = QwenImage2LoRAConfig(**extra_kwargs)
    return convert_image2lora_state_dict(state_dict, cfg, dtype=dtype)


def _build_wans2v_audio_encoder(state_dict, extra_kwargs, dtype):
    import numpy as np

    from ..models.wan.wav2vec import Wav2Vec2Config, convert_wav2vec2_state_dict

    # audio tower runs fp32 (cheap; keeps transformers-exact hidden states)
    cfg = Wav2Vec2Config()
    return convert_wav2vec2_state_dict(state_dict, cfg,
                                       dtype=np.float32), cfg


def install_default_builders(registry: ModelRegistry = MODEL_REGISTRY):
    registry.register_builder("wan_video_dit", _build_wan_dit)
    registry.register_builder("wan_video_vae", _build_wan_vae)
    registry.register_builder("wan_video_text_encoder", _build_umt5)
    registry.register_builder("flux_dit", _build_flux_dit)
    registry.register_builder("flux_controlnet", _build_flux_controlnet)
    registry.register_builder("flux_ipadapter", _build_flux_ipadapter)
    registry.register_builder("siglip_vision_model", _build_siglip_vision)
    registry.register_builder("flux_value_controller",
                              _build_flux_value_controller)
    registry.register_builder("infiniteyou_image_projector",
                              _build_infiniteyou_projector)
    registry.register_builder("step1x_connector", _build_step1x_connector)
    registry.register_builder("flux_lora_encoder", _build_flux_lora_encoder)
    registry.register_builder("flux_lora_patcher", _build_flux_lora_patcher)
    registry.register_builder("siglip2_image_encoder", _build_siglip_vision)
    registry.register_builder("dinov3_image_encoder", _build_dinov3)
    for _variant in ("style", "coarse", "fine"):
        registry.register_builder(f"qwen_image_image2lora_{_variant}",
                                  _build_qwen_image2lora)
    registry.register_builder("flux_text_encoder_clip", _build_flux_clip)
    registry.register_builder("flux_text_encoder_t5", _build_flux_t5)
    registry.register_builder("flux_vae_encoder", _build_flux_vae)
    registry.register_builder("flux_vae_decoder", _build_flux_vae)
    registry.register_builder("qwen_image_dit", _build_qwen_image_dit)
    registry.register_builder("qwen_image_text_encoder", _build_qwen_image_te)
    registry.register_builder("qwen_image_vae", _build_qwen_image_vae)
    registry.register_builder("qwen_image_blockwise_controlnet",
                              _build_qwen_blockwise_controlnet)
    registry.register_builder("z_image_dit", _build_z_image_dit)
    registry.register_builder("z_image_text_encoder", _build_z_image_te)
    registry.register_builder("flux2_dit", _build_flux2_dit)
    registry.register_builder("flux2_vae", _build_flux2_vae)
    registry.register_builder("flux2_text_encoder", _build_flux2_te)
    registry.register_builder("nexus_gen_llm", _build_nexus_gen_llm)
    registry.register_builder("nexus_gen_generation_adapter",
                              _build_nexus_gen_adapter)
    registry.register_builder("nexus_gen_editing_adapter",
                              _build_nexus_gen_merger)
    registry.register_builder("wans2v_audio_encoder",
                              _build_wans2v_audio_encoder)
    return registry


class ModelPool:
    def __init__(self, registry: Optional[ModelRegistry] = None):
        self.registry = install_default_builders(registry or MODEL_REGISTRY)
        self.models: Dict[str, List[Any]] = {}

    def load(self, paths, dtype=jnp.bfloat16, hints: Optional[Dict[str, Any]] = None):
        """hints: path -> (model_name, extra_kwargs) for checkpoints whose
        hash is not in the registry (e.g. resized/test models).

        ``paths`` items may be plain path strings or ``ModelConfig``
        records (hub model_id + file pattern), which are resolved —
        downloading only if necessary — before loading
        (reference ``download_and_load_models``, base_pipeline.py:282).

        ``FAIRYGEN_MODEL_HINTS`` (env) may name a JSON file of
        ``{path: [model_name, extra_kwargs]}`` merged beneath explicit
        hints — how CLIs load resized/custom checkpoints whose hash the
        74-entry registry can't know (finetunes with changed dims, tiny
        CI models) without per-CLI plumbing.
        """
        import json as _json
        import os as _os

        from .model_config import resolve_model_paths

        hints = dict(hints or {})
        env_hints = _os.environ.get("FAIRYGEN_MODEL_HINTS")
        if env_hints:
            with open(env_hints) as f:
                for p, (name, extra) in _json.load(f).items():
                    hints.setdefault(_os.path.abspath(p), (name, extra))
                    hints.setdefault(p, (name, extra))
        paths = resolve_model_paths(list(paths))
        for path in paths:
            if path in hints:
                from .io import load_state_dict

                name, extra = hints[path]
                builder = self.registry._builders[name]
                params, cfg = builder(load_state_dict(path), dict(extra), dtype)
                self.models.setdefault(name, []).append((params, cfg))
                continue
            specs = self.registry.detect_file(path)
            if not specs:
                print(f"[ModelPool] unrecognized checkpoint: {path}")
                continue
            for name, params, cfg in self._safe_load(path, dtype):
                self.models.setdefault(name, []).append((params, cfg))
                print(f"[ModelPool] loaded {name} from {path}")
        return self

    def _safe_load(self, path, dtype):
        try:
            return self.registry.load(path, dtype=dtype)
        except NotImplementedError as e:
            print(f"[ModelPool] skipping {path}: {e}")
            return []

    def fetch_model(self, name: str, index=None):
        """Reference fetch_model semantics (model_loader.py): None if absent;
        the single entry, a list when index>1 entries exist, or every entry
        as a list with ``index="all"``."""
        entries = self.models.get(name, [])
        if not entries:
            return None
        if index == "all":
            return entries
        if index is None or len(entries) == 1:
            return entries[0]
        return entries[:index]
