"""FLUX.1 text-to-image / img2img / Kontext CLI.

Mirrors the reference FluxImagePipeline usage
(``/root/reference/animation/diffsynth/pipelines/flux_image.py:179-296``):

  python examples/flux_t2i.py \
      --model_paths '["flux1-dev.safetensors", "ae.safetensors",
                      "clip_l.safetensors", "t5xxl.safetensors"]' \
      --tokenizer_clip <clip tokenizer dir> --tokenizer_t5 <t5 dir> \
      --prompt "an owl made of stained glass" --output owl.png

Files are hash-detected (BFL / diffsynth / transformers layouts all
accepted).  FLUX.1-dev uses embedded guidance (--embedded_guidance 3.5,
cfg 1); true CFG via --cfg_scale with --negative_prompt.
"""
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", type=str, required=True,
                   help='JSON list of checkpoint paths')
    p.add_argument("--tokenizer_clip", type=str, default=None)
    p.add_argument("--tokenizer_t5", type=str, default=None)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--cfg_scale", type=float, default=1.0)
    p.add_argument("--embedded_guidance", type=float, default=3.5)
    p.add_argument("--t5_sequence_length", type=int, default=512)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--quantize", action="store_true",
                   help="W8A8 int8 DiT block projections "
                        "(pipe.quantize(); ~MXU 2x path, validate "
                        "quality on your weights)")
    p.add_argument("--sigma_shift", type=float, default=None)
    p.add_argument("--input_image", type=str, default=None)
    p.add_argument("--denoising_strength", type=float, default=1.0)
    p.add_argument("--kontext_images", type=str, nargs="*", default=None)
    p.add_argument("--lora", type=str, default=None,
                   help="FLUX LoRA checkpoint (diffusers/civitai layout)")
    p.add_argument("--lora_alpha", type=float, default=1.0)
    p.add_argument("--tea_cache_l1_thresh", type=float, default=None)
    p.add_argument("--controlnet_image", type=str, default=None,
                   help="control image for loaded flux_controlnet models")
    p.add_argument("--controlnet_scale", type=float, default=1.0)
    p.add_argument("--controlnet_processor_id", type=str, default=None,
                   help="union-mode selector: canny/tile/depth/blur/pose/"
                        "gray/lq")
    p.add_argument("--ipadapter_image", type=str, default=None,
                   help="image prompt for loaded flux_ipadapter models")
    p.add_argument("--ipadapter_scale", type=float, default=1.0)
    p.add_argument("--eligen_entity_prompts", type=str, nargs="*",
                   default=None)
    p.add_argument("--eligen_entity_masks", type=str, nargs="*",
                   default=None, help="one mask image per entity prompt")
    p.add_argument("--output", type=str, default="flux_out.png")
    args = p.parse_args()

    from PIL import Image

    from fairygen_tpu.pipelines.flux_image import (
        ControlNetInput,
        FluxImagePipeline,
    )

    pipe = FluxImagePipeline.from_pretrained(
        json.loads(args.model_paths),
        tokenizer_clip=args.tokenizer_clip, tokenizer_t5=args.tokenizer_t5,
    )
    if args.lora:
        pipe.load_lora(args.lora, alpha=args.lora_alpha)
    if args.quantize:
        pipe.quantize()
    image = pipe(
        prompt=args.prompt,
        negative_prompt=args.negative_prompt,
        cfg_scale=args.cfg_scale,
        embedded_guidance=args.embedded_guidance,
        t5_sequence_length=args.t5_sequence_length,
        input_image=(Image.open(args.input_image).convert("RGB")
                     .resize((args.width, args.height))
                     if args.input_image else None),
        denoising_strength=args.denoising_strength,
        height=args.height, width=args.width,
        seed=args.seed, sigma_shift=args.sigma_shift,
        num_inference_steps=args.steps,
        tea_cache_l1_thresh=args.tea_cache_l1_thresh,
        kontext_images=([Image.open(k).convert("RGB")
                         for k in args.kontext_images]
                        if args.kontext_images else None),
        controlnet_inputs=([ControlNetInput(
            image=Image.open(args.controlnet_image).convert("RGB"),
            scale=args.controlnet_scale,
            processor_id=args.controlnet_processor_id)]
            if args.controlnet_image else None),
        ipadapter_images=(Image.open(args.ipadapter_image).convert("RGB")
                          if args.ipadapter_image else None),
        ipadapter_scale=args.ipadapter_scale,
        eligen_entity_prompts=args.eligen_entity_prompts,
        eligen_entity_masks=([Image.open(m) for m in
                              args.eligen_entity_masks]
                             if args.eligen_entity_masks else None),
        output_type="pil",
    )
    image.save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
