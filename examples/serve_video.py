"""Serve Wan video generation over HTTP with batching + async progress.

Deployment entry point for the flagship video pipeline (no reference
analogue — the reference ships only a one-request-at-a-time Gradio demo):
requests bucket by compile signature (height/width/frames/steps), the
engine drives the pipeline from one dispatch thread, and minute-long
requests use the async flow — POST with {"async": true}, poll
GET /status/<id> (per-dispatch denoise progress), fetch GET /result/<id>.

  python examples/serve_video.py \
      --model_paths '["ckpts/dit.safetensors","ckpts/vae.safetensors","ckpts/umt5.safetensors"]' \
      --tokenizer_path ckpts/umt5-tokenizer [--lora merged.safetensors] \
      [--usp 8 --sp_strategy ulysses] [--quantize int8_ffn] --port 8000

  curl -X POST localhost:8000/generate -d '{
      "prompt": "A cartoon pig walking in a forest",
      "async": true,
      "params": {"height": 480, "width": 832, "num_frames": 81}}'

Step-level continuous batching (t2v single-expert; measured -54%
short-request latency vs FIFO at equal makespan on one v5e):

  python examples/serve_video.py ... --continuous 2 \
      [--slot_data 2]   # slots sharded over a data=2 mesh
"""
import argparse
import base64
import json
import os as _os
import sys as _sys
import tempfile
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from wan_inference import NEGATIVE_PROMPT  # noqa: E402 — shared default


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", type=str, required=True,
                   help='JSON list of checkpoint paths (hash-detected)')
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--lora", type=str, default=None,
                   help="LoRA fused into the base weights at startup")
    p.add_argument("--lora_alpha", type=float, default=1.0)
    p.add_argument("--hot_lora", action="append", default=[],
                   metavar="NAME=PATH",
                   help="repeatable NAME=PATH registry entries for "
                        "per-request adapter selection (requests pass "
                        'params {"lora": NAME[, "lora_alpha": a]})')
    p.add_argument("--negative_prompt", type=str, default=NEGATIVE_PROMPT)
    p.add_argument("--fps", type=int, default=15)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=1,
                   help="prompts per engine batch (video is per-sample "
                        "compute-saturated on one chip; >1 only queues)")
    p.add_argument("--max_wait_ms", type=float, default=100.0)
    p.add_argument("--continuous", type=int, default=0, metavar="SLOTS",
                   help="step-level continuous batching with SLOTS slots "
                        "(serving/continuous.py): requests join/leave the "
                        "batch at denoise-step boundaries instead of "
                        "queueing behind whole clips.  Fixes the shape "
                        "bucket to --bucket_height/width/frames; t2v "
                        "single-expert pipelines only")
    p.add_argument("--bucket_height", type=int, default=480)
    p.add_argument("--bucket_width", type=int, default=832)
    p.add_argument("--bucket_frames", type=int, default=81)
    p.add_argument("--slot_data", type=int, default=0,
                   help="slot-parallel serving: shard the --continuous "
                        "slot batch over a data=N mesh (weights "
                        "replicated, one slot group per chip); mutually "
                        "exclusive with --usp")
    p.add_argument("--router_buckets", type=int, default=0,
                   help="with --continuous: serve MIXED-SHAPE traffic "
                        "through one endpoint — requests route to "
                        "per-(height,width,frames) engines created "
                        "lazily and LRU-evicted beyond this budget "
                        "(serving.BucketRouter; --bucket_* become the "
                        "defaults for requests that omit shape params)")
    p.add_argument("--request_timeout", type=float, default=1800.0,
                   help="sync-request wall cap; use async for long clips")
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8_ffn", "int8"])
    p.add_argument("--usp", type=int, default=0,
                   help="sequence-parallel degree (0 = off)")
    p.add_argument("--sp_strategy", type=str, default="ulysses",
                   choices=["ulysses", "ring"])
    args = p.parse_args()

    # flag validation BEFORE the (minutes-long) checkpoint load
    if args.slot_data > 0 and args.continuous <= 0:
        p.error("--slot_data shards the --continuous slot batch; it does "
                "nothing for the request-level engine")
    if args.continuous > 0 and args.usp > 0:
        p.error("--continuous shards the slot batch, not the token axis; "
                "use --slot_data instead of --usp")
    if args.continuous > 0 and args.slot_data > 0 \
            and args.continuous % args.slot_data:
        p.error(f"--continuous {args.continuous} must be a multiple of "
                f"--slot_data {args.slot_data}")
    if args.router_buckets > 0 and args.continuous <= 0:
        p.error("--router_buckets routes between --continuous slot "
                "engines; enable --continuous")

    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline
    from fairygen_tpu.serving import BatchingEngine, InferenceServer
    from fairygen_tpu.serving.server import video_generate_fn
    from fairygen_tpu.utils.video import save_video

    mesh = None
    if args.usp > 0:
        import jax

        from fairygen_tpu.core.meshes import make_mesh

        mesh = make_mesh(data=1, seq=args.usp,
                         devices=jax.devices()[:args.usp])
    pipe = WanVideoPipeline.from_pretrained(
        json.loads(args.model_paths), tokenizer_path=args.tokenizer_path,
        mesh=mesh, sp_strategy=args.sp_strategy)
    if args.lora:
        pipe.load_lora(args.lora, alpha=args.lora_alpha)
    if args.quantize:
        pipe.quantize(args.quantize)

    def encode_mp4(frames):
        with tempfile.TemporaryDirectory() as td:
            path = _os.path.join(td, "clip.mp4")
            save_video(frames, path, fps=args.fps)
            with open(path, "rb") as f:
                return {"mp4_base64": base64.b64encode(f.read()).decode()}

    loras = None
    if args.hot_lora:
        loras = dict(kv.split("=", 1) for kv in args.hot_lora)

    if args.continuous > 0:
        from fairygen_tpu.serving.continuous import (
            ContinuousEngine, WanSlotStepper)

        slot_mesh = None
        if args.slot_data > 0:
            import jax

            from fairygen_tpu.core.meshes import make_mesh

            slot_mesh = make_mesh(data=args.slot_data,
                                  devices=jax.devices()[:args.slot_data])
        def make_engine(key):
            h, w, f = key
            return ContinuousEngine(
                WanSlotStepper(pipe, height=h, width=w, num_frames=f,
                               slot_mesh=slot_mesh,
                               # per-slot adapter gather inside the
                               # batched step: mixed-LoRA traffic shares
                               # slots
                               loras=loras),
                num_slots=args.continuous,
                default_params={"negative_prompt": args.negative_prompt})

        if args.router_buckets > 0:
            import functools

            from fairygen_tpu.serving import BucketRouter, wan_bucket_of

            engine = BucketRouter(
                make_engine,
                bucket_of=functools.partial(
                    wan_bucket_of,
                    defaults=(args.bucket_height, args.bucket_width,
                              args.bucket_frames)),
                max_buckets=args.router_buckets)
        else:
            engine = make_engine((args.bucket_height, args.bucket_width,
                                  args.bucket_frames))
    else:
        base_fn = video_generate_fn(pipe, fps=args.fps, loras=loras)

        def gen(prompts, **params):
            params.setdefault("negative_prompt", args.negative_prompt)
            return base_fn(prompts, **params)

        gen.supports_progress = True
        engine = BatchingEngine(
            gen, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
    server = InferenceServer(engine, host=args.host, port=args.port,
                             encode_result=encode_mp4,
                             request_timeout=args.request_timeout).start()
    print(f"serving video on http://{args.host}:{server.port} "
          f"(usp={args.usp}, quantize={args.quantize}); async flow: POST "
          '{"prompt": ..., "async": true} then GET /status/<id>, /result/<id>')
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
