"""Single-shot I2V generation — the flagship entry point.

Mirror of the reference ``animation/inference.py``: load TI2V-5B
(TE + DiT + VAE) by hash detection, fuse the merged motion LoRA, animate a
stylized still.

Usage:
  python examples/wan_inference.py \
      --model_paths '["ckpts/dit.safetensors","ckpts/vae.safetensors","ckpts/umt5.safetensors"]' \
      --tokenizer_path ckpts/umt5-tokenizer \
      --lora ckpts/merged.safetensors \
      --input_image data/pig_shot1.png \
      --prompt "A cartoon pig walking in a forest" \
      --output outputs/video.mp4
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json

import numpy as np

NEGATIVE_PROMPT = (
    "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，整体发灰，最差质量，"
    "低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，画得不好的手部，画得不好的脸部，畸形的，"
    "毁容的，形态畸形的肢体，手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走"
)  # reference animation/inference.py:21


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", type=str, required=True)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--lora", type=str, default=None)
    p.add_argument("--lora_alpha", type=float, default=1.0)
    p.add_argument("--input_image", type=str, default=None)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default=NEGATIVE_PROMPT)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--cfg_scale", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--fps", type=int, default=15)
    p.add_argument("--output", type=str, default="video.mp4")
    # acceleration / memory (reference wan_video.py:233-253)
    p.add_argument("--tiled", action="store_true",
                   help="spatially tiled VAE (the reference flagship default)")
    p.add_argument("--vae_frames_per_chunk", type=int, default=1,
                   help="batch N latent frames per streamed VAE decode dispatch (faster on TPU; same causal math)")
    p.add_argument("--sliding_window_size", type=int, default=None)
    p.add_argument("--sliding_window_stride", type=int, default=None)
    p.add_argument("--tea_cache_l1_thresh", type=float, default=None)
    p.add_argument("--tea_cache_model_id", type=str, default="Wan2.1-T2V-1.3B")
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8_ffn", "int8"],
                   help="W8A8 int8 DiT projections (the reference's "
                        "FP8-linear capability; ~1.35x denoise, validate "
                        "quality on your weights)")
    p.add_argument("--usp", type=int, default=0,
                   help="sequence-parallel degree (0 = off); shards "
                        "the token axis over a (1, usp) device mesh")
    p.add_argument("--sp_strategy", type=str, default="ulysses",
                   choices=["ulysses", "ring"],
                   help="sequence-parallel schedule: Ulysses all-to-all "
                        "(head-scatter; needs num_heads %% usp == 0) or "
                        "ring ppermute (nearest-neighbor ICI, any degree)")
    # variants
    p.add_argument("--vace_video", type=str, default=None,
                   help="control video (mp4/gif/frame dir) for VACE models")
    p.add_argument("--vace_video_mask", type=str, default=None)
    p.add_argument("--vace_reference_image", type=str, default=None)
    p.add_argument("--vace_scale", type=float, default=1.0)
    p.add_argument("--camera_control_direction", type=str, default=None,
                   choices=["Left", "Right", "Up", "Down", "LeftUp",
                            "LeftDown", "RightUp", "RightDown"])
    p.add_argument("--camera_control_speed", type=float, default=1 / 54)
    p.add_argument("--motion_bucket_id", type=int, default=None)
    p.add_argument("--end_image", type=str, default=None)
    p.add_argument("--reference_image", type=str, default=None)
    p.add_argument("--audio", type=str, default=None,
                   help="driving audio (wav) for S2V checkpoints; features "
                        "are extracted by the native Wav2Vec2 tower and the "
                        "output video is muxed with the audio")
    p.add_argument("--audio_sample_rate", type=int, default=None,
                   help="override the wav header sample rate")
    p.add_argument("--longcat_video", type=str, default=None,
                   help="video to continue (LongCat-Video checkpoints): its "
                        "frames stay pinned while the rest are generated")
    args = p.parse_args()

    from PIL import Image

    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline
    from fairygen_tpu.utils.video import save_video

    mesh = None
    if args.usp:
        from fairygen_tpu.core.meshes import make_mesh

        mesh = make_mesh(data=1, seq=args.usp)
    pipe = WanVideoPipeline.from_pretrained(
        json.loads(args.model_paths), tokenizer_path=args.tokenizer_path,
        mesh=mesh, sp_strategy=args.sp_strategy,
    )
    if args.lora:
        pipe.load_lora(args.lora, alpha=args.lora_alpha)
    if args.quantize:
        pipe.quantize(args.quantize)

    def load_image(path):
        return (Image.open(path).convert("RGB").resize((args.width, args.height))
                if path else None)

    def load_video(path):
        if not path:
            return None
        from fairygen_tpu.utils.video import load_video_frames

        return load_video_frames(path)

    input_audio = audio_sr = None
    if args.audio:
        from fairygen_tpu.utils.video import load_wav

        input_audio, file_sr = load_wav(args.audio)
        audio_sr = args.audio_sample_rate or file_sr

    frames = pipe(
        prompt=args.prompt,
        input_audio=input_audio,
        audio_sample_rate=audio_sr or 16000,
        negative_prompt=args.negative_prompt,
        input_image=load_image(args.input_image),
        end_image=load_image(args.end_image),
        reference_image=load_image(args.reference_image),
        vace_video=load_video(args.vace_video),
        vace_video_mask=load_video(args.vace_video_mask),
        vace_reference_image=load_image(args.vace_reference_image),
        vace_scale=args.vace_scale,
        longcat_video=load_video(args.longcat_video),
        camera_control_direction=args.camera_control_direction,
        camera_control_speed=args.camera_control_speed,
        motion_bucket_id=args.motion_bucket_id,
        height=args.height, width=args.width, num_frames=args.num_frames,
        num_inference_steps=args.num_inference_steps,
        cfg_scale=args.cfg_scale, seed=args.seed, streaming_vae=True,
        vae_frames_per_chunk=args.vae_frames_per_chunk,
        tiled=args.tiled,
        sliding_window_size=args.sliding_window_size,
        sliding_window_stride=args.sliding_window_stride,
        tea_cache_l1_thresh=args.tea_cache_l1_thresh,
        tea_cache_model_id=args.tea_cache_model_id,
    )
    if args.audio:
        from fairygen_tpu.utils.video import save_video_with_audio

        try:
            out = save_video_with_audio(frames, args.output, args.audio,
                                        fps=args.fps, quality=5)
        except Exception as e:
            print(f"audio mux failed ({e}); saving silent video")
            out = save_video(frames, args.output, fps=args.fps, quality=5)
    else:
        out = save_video(frames, args.output, fps=args.fps, quality=5)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
