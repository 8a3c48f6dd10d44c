"""NexusGen text-to-image CLI: autoregressive image-embedding generation
driving FLUX.1 (reference ``FluxImageUnit_NexusGen``,
``pipelines/flux_image.py:615-668``).

  python examples/nexus_gen_t2i.py \
      --nexus_paths '["nexus_gen_v2.safetensors", "generation_adapter.safetensors"]' \
      --flux_paths '["flux1-dev.safetensors", "ae.safetensors", "clip_l.safetensors"]' \
      --qwen_tokenizer <qwen2.5-vl tokenizer dir> \
      --clip_tokenizer <clip tokenizer dir> \
      --prompt "a fox curled up in autumn leaves"
"""
import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nexus_paths", type=str, required=True,
                   help="JSON list: NexusGen AR model + generation adapter")
    p.add_argument("--flux_paths", type=str, required=True,
                   help="JSON list: FLUX DiT + VAE + CLIP-L")
    p.add_argument("--qwen_tokenizer", type=str, required=True)
    p.add_argument("--clip_tokenizer", type=str, default=None)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--reference_image", type=str, default=None,
                   help="editing mode: the image to modify (needs the "
                        "editing adapter + vision tower in --nexus_paths)")
    p.add_argument("--embedded_guidance", type=float, default=3.5)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--output", type=str, default="nexus_out.png")
    args = p.parse_args()

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from fairygen_tpu.core.model_pool import ModelPool
    from fairygen_tpu.models.qwen.nexus_gen import nexus_gen_flux_prompt_emb
    from fairygen_tpu.pipelines.flux_image import FluxImagePipeline

    pool = ModelPool().load(json.loads(args.nexus_paths))
    ar = pool.fetch_model("nexus_gen_llm")
    adapter = pool.fetch_model("nexus_gen_generation_adapter")
    ar_params, ar_cfg = ar
    if isinstance(ar_params, dict) and "text" in ar_params:
        ar_params, ar_cfg = ar_params["text"], ar_cfg[0]

    tok = AutoTokenizer.from_pretrained(args.qwen_tokenizer)
    prompt_txt_ids = None
    if args.reference_image is not None:
        from PIL import Image

        from fairygen_tpu.models.qwen.nexus_gen import (
            nexus_gen_editing_flux_prompt_emb,
        )

        merger = pool.fetch_model("nexus_gen_editing_adapter")
        vision = pool.fetch_model("nexus_gen_llm")[0].get("vision")
        assert merger is not None and vision is not None, \
            "editing needs edit_decoder.bin + the AR model's vision tower"
        prompt_emb, prompt_txt_ids = nexus_gen_editing_flux_prompt_emb(
            ar_params, ar_cfg, vision, ar[1][1], merger[0], merger[1], tok,
            args.prompt, Image.open(args.reference_image).convert("RGB"),
            args.height // 8, args.width // 8)
    else:
        prompt_emb = nexus_gen_flux_prompt_emb(
            ar_params, ar_cfg, adapter[0], tok, args.prompt)

    pipe = FluxImagePipeline.from_pretrained(
        json.loads(args.flux_paths), tokenizer_clip=args.clip_tokenizer)
    if pipe.tokenizer_clip is not None:
        from fairygen_tpu.models.flux.text_encoders import (
            flux_encode_prompt_clip,
        )

        ids = pipe.tokenizer_clip(args.prompt)
        pooled = flux_encode_prompt_clip(
            pipe.te_clip_params, pipe.te_clip_cfg, jnp.asarray(ids))
    else:
        pooled = jnp.zeros((1, 768), jnp.float32)

    image = pipe(
        prompt_emb=prompt_emb.astype(pipe.dtype),
        pooled_prompt_emb=pooled.astype(pipe.dtype),
        embedded_guidance=args.embedded_guidance,
        height=args.height, width=args.width, seed=args.seed,
        num_inference_steps=args.steps, output_type="pil",
        prompt_txt_ids=prompt_txt_ids,
    )
    image.save(args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
