"""Z-Image (Turbo) text-to-image CLI.

Mirrors the reference ZImagePipeline usage
(``/root/reference/animation/diffsynth/pipelines/z_image.py:69-127``):

  python examples/z_image_t2i.py \
      --model_paths '["z_image_turbo.safetensors", "ae.safetensors",
                      "qwen3_te.safetensors"]' \
      --tokenizer <qwen3 tokenizer dir> \
      --prompt "a watercolor lighthouse at dusk" --output out.png
"""
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", type=str, required=True)
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--cfg_scale", type=float, default=1.0,
                   help="Z-Image-Turbo is guidance-distilled; keep 1.0")
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--quantize", action="store_true",
                   help="W8A8 int8 DiT block projections "
                        "(pipe.quantize(); ~MXU 2x path, validate "
                        "quality on your weights)")
    p.add_argument("--input_image", type=str, default=None)
    p.add_argument("--denoising_strength", type=float, default=1.0)
    p.add_argument("--output", type=str, default="z_image_out.png")
    args = p.parse_args()

    from PIL import Image

    from fairygen_tpu.pipelines.z_image import ZImagePipeline

    pipe = ZImagePipeline.from_pretrained(
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
        output_type="pil",
    )
    image.save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
