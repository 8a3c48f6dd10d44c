"""FLUX.2 text-to-image CLI.

Mirrors the reference Flux2ImagePipeline usage
(``/root/reference/animation/diffsynth/pipelines/flux2_image.py:68-129``):

  python examples/flux2_t2i.py \
      --model_paths '["flux2-dev.safetensors", "ae.safetensors",
                      "mistral_small.safetensors"]' \
      --tokenizer <mistral tokenizer dir> \
      --prompt "an art deco train station at golden hour"
"""
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", type=str, required=True)
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--embedded_guidance", type=float, default=4.0)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--steps", type=int, default=28)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--quantize", action="store_true",
                   help="W8A8 int8 DiT block projections "
                        "(pipe.quantize(); ~MXU 2x path, validate "
                        "quality on your weights)")
    p.add_argument("--input_image", type=str, default=None)
    p.add_argument("--denoising_strength", type=float, default=1.0)
    p.add_argument("--output", type=str, default="flux2_out.png")
    args = p.parse_args()

    from PIL import Image

    from fairygen_tpu.pipelines.flux2_image import Flux2ImagePipeline

    pipe = Flux2ImagePipeline.from_pretrained(
        json.loads(args.model_paths), tokenizer_path=args.tokenizer)
    if args.quantize:
        pipe.quantize()
    image = pipe(
        prompt=args.prompt, embedded_guidance=args.embedded_guidance,
        height=args.height, width=args.width, seed=args.seed,
        num_inference_steps=args.steps,
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
