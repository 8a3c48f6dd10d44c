"""Serve FLUX text-to-image over HTTP with step-level continuous batching.

Deployment entry point for the FLUX.1 t2i family (no reference analogue —
the reference ships only one-request-at-a-time scripts): requests join
the slot batch at denoise-STEP boundaries (``FluxSlotStepper``), so a
4-step Turbo/schnell preview admitted behind a 50-step dev render starts
immediately instead of queueing behind the whole clip — the t2i analogue
of the Wan continuous engine's measured −54% short-request latency.

Mixed-shape traffic routes through ``BucketRouter``: one engine per
(height, width) compile signature, lazily created and LRU-evicted under
``--max_buckets``.  Per-request hot LoRAs come from a ``--hot_lora``
registry and are gathered per-slot at admission, so mixed-adapter
traffic shares one batched step (models/flux/lora_runtime).

  python examples/serve_t2i.py \
      --model_paths '["flux1-dev.safetensors","ae.safetensors",
                      "clip_l.safetensors","t5xxl_fp16.safetensors"]' \
      --tokenizer_clip ckpts/clip-tokenizer --tokenizer_t5 ckpts/t5-tok \
      [--hot_lora style=style_lora.safetensors] [--quantize int8] \
      [--slots 4] [--max_buckets 2] --port 8000

  curl -X POST localhost:8000/generate -d '{
      "prompt": "a watercolor castle", \
      "params": {"height": 1024, "width": 1024,
                 "num_inference_steps": 50, "lora": "style"}}'
"""
import argparse
import base64
import io
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", type=str, required=True,
                   help="JSON list of checkpoint paths (hash-detected)")
    p.add_argument("--tokenizer_clip", type=str, default=None)
    p.add_argument("--tokenizer_t5", type=str, default=None)
    p.add_argument("--lora", type=str, default=None,
                   help="LoRA fused into the base weights at startup")
    p.add_argument("--lora_alpha", type=float, default=1.0)
    p.add_argument("--hot_lora", action="append", default=[],
                   metavar="NAME=PATH",
                   help="repeatable NAME=PATH registry entries for "
                        "per-request adapter selection (requests pass "
                        'params {"lora": NAME})')
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--slots", type=int, default=2,
                   help="denoise slots per bucket engine")
    p.add_argument("--max_buckets", type=int, default=2,
                   help="live (height, width) bucket engines; LRU idle "
                        "buckets evict beyond this")
    p.add_argument("--quantize", type=str, default=None, choices=["int8"])
    p.add_argument("--request_timeout", type=float, default=600.0)
    args = p.parse_args()

    from fairygen_tpu.pipelines.flux_image import FluxImagePipeline
    from fairygen_tpu.serving import (
        BucketRouter, ContinuousEngine, FluxSlotStepper, InferenceServer,
        t2i_bucket_of)

    pipe = FluxImagePipeline.from_pretrained(
        json.loads(args.model_paths), tokenizer_clip=args.tokenizer_clip,
        tokenizer_t5=args.tokenizer_t5)
    if args.lora:
        pipe.load_lora(args.lora, alpha=args.lora_alpha)
    if args.quantize:
        pipe.quantize()

    loras = None
    if args.hot_lora:
        loras = dict(kv.split("=", 1) for kv in args.hot_lora)

    def make_engine(key):
        h, w = key
        return ContinuousEngine(
            FluxSlotStepper(pipe, height=h, width=w, loras=loras),
            num_slots=args.slots)

    router = BucketRouter(make_engine, bucket_of=t2i_bucket_of,
                          max_buckets=args.max_buckets)

    def encode_png(img):
        from PIL import Image
        import numpy as np

        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return {"png_base64": base64.b64encode(buf.getvalue()).decode()}

    server = InferenceServer(router, host=args.host, port=args.port,
                             encode_result=encode_png,
                             request_timeout=args.request_timeout).start()
    print(f"serving t2i on http://{args.host}:{server.port} "
          f"(slots={args.slots}/bucket, max_buckets={args.max_buckets}, "
          f"hot_loras={sorted(loras) if loras else []}); "
          'async flow: POST {"prompt": ..., "async": true} then '
          "GET /status/<id>, /result/<id>")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
