"""Qwen-Image text-to-image / img2img / Edit CLI.

Mirrors the reference QwenImagePipeline usage
(``/root/reference/animation/diffsynth/pipelines/qwen_image.py:?``
``__call__``):

  python examples/qwen_image_t2i.py \
      --model_paths '["transformer.safetensors", "vae.safetensors",
                      "text_encoder.safetensors"]' \
      --tokenizer <qwen2.5-vl tokenizer dir> \
      --prompt "a corgi wearing sunglasses" --output corgi.png
"""
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", type=str, required=True)
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--cfg_scale", type=float, default=4.0)
    p.add_argument("--height", type=int, default=1328)
    p.add_argument("--width", type=int, default=1328)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--quantize", action="store_true",
                   help="W8A8 int8 DiT block projections "
                        "(pipe.quantize(); ~MXU 2x path, validate "
                        "quality on your weights)")
    p.add_argument("--input_image", type=str, default=None)
    p.add_argument("--denoising_strength", type=float, default=1.0)
    p.add_argument("--edit_images", type=str, nargs="*", default=None)
    p.add_argument("--output", type=str, default="qwen_out.png")
    args = p.parse_args()

    from PIL import Image

    from fairygen_tpu.pipelines.qwen_image import QwenImagePipeline

    pipe = QwenImagePipeline.from_pretrained(
        json.loads(args.model_paths), tokenizer_path=args.tokenizer)
    if args.quantize:
        pipe.quantize()
    image = pipe(
        prompt=args.prompt, negative_prompt=args.negative_prompt,
        cfg_scale=args.cfg_scale, height=args.height, width=args.width,
        seed=args.seed, num_inference_steps=args.steps,
        input_image=(Image.open(args.input_image).convert("RGB")
                     .resize((args.width, args.height))
                     if args.input_image else None),
        denoising_strength=args.denoising_strength,
        edit_images=([Image.open(k).convert("RGB")
                      for k in args.edit_images]
                     if args.edit_images else None),
        output_type="pil",
    )
    image.save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
