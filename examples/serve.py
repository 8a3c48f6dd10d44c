"""Serve SDXL (+ optional BrushNet / style DoRA) over HTTP with batching.

Deployment entry point built on fairygen_tpu.serving: shape-bucketed
dynamic batching through one dispatch thread, the batch axis sharded over
the mesh ``data`` axis when --mesh_data is set.

  python examples/serve.py --unet ... --vae ... --te1 ... --te2 ... \
      --tokenizer1 ... --tokenizer2 ... [--dora ...] [--mesh_data 4] \
      --port 8000

  curl -X POST localhost:8000/generate -d '{"prompt": "a castle", \
      "params": {"height": 1024, "width": 1024, "num_inference_steps": 50}}'
"""
import argparse
import base64
import io
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--unet", type=str, required=True)
    p.add_argument("--vae", type=str, required=True)
    p.add_argument("--te1", type=str, required=True)
    p.add_argument("--te2", type=str, required=True)
    p.add_argument("--tokenizer1", type=str, required=True)
    p.add_argument("--tokenizer2", type=str, required=True)
    p.add_argument("--brushnet", type=str, default=None)
    p.add_argument("--dora", type=str, default=None)
    p.add_argument("--lora_scale", type=float, default=0.66)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--max_wait_ms", type=float, default=100.0)
    p.add_argument("--mesh_data", type=int, default=0,
                   help="shard request batches over a data mesh of this size")
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from fairygen_tpu.core.io import load_state_dict
    from fairygen_tpu.models.sdxl.clip import (
        CLIPTextConfig, convert_clip_text_state_dict,
    )
    from fairygen_tpu.models.sdxl.unet2d import (
        UNet2DConfig, convert_unet2d_state_dict,
    )
    from fairygen_tpu.models.sdxl.vae import (
        AutoencoderKLConfig, convert_autoencoder_kl_state_dict,
    )
    from fairygen_tpu.pipelines.sdxl_brushnet import SDXLBrushNetPipeline
    from fairygen_tpu.serving import BatchingEngine, InferenceServer
    from fairygen_tpu.serving.server import sdxl_generate_fn
    from fairygen_tpu.utils.tokenizer import CLIPTokenizerWrapper

    dtype = jnp.bfloat16
    unet_cfg = UNet2DConfig.sdxl_base()
    unet_params = convert_unet2d_state_dict(
        load_state_dict(args.unet), unet_cfg, dtype)
    if args.dora:
        from fairygen_tpu.training.dora_trainer import load_sdxl_dora_state_dict

        unet_params, n = load_sdxl_dora_state_dict(
            unet_params, load_state_dict(args.dora), scale=args.lora_scale)
        print(f"{n} style-adapter modules loaded")

    kw = {}
    if args.brushnet:
        kw = dict(
            brushnet_params=convert_unet2d_state_dict(
                load_state_dict(args.brushnet), UNet2DConfig.brushnet_sdxl(),
                dtype),
            brushnet_cfg=UNet2DConfig.brushnet_sdxl(),
        )
    pipe = SDXLBrushNetPipeline(
        unet_params=unet_params, unet_cfg=unet_cfg,
        vae_params=convert_autoencoder_kl_state_dict(
            load_state_dict(args.vae), AutoencoderKLConfig.sdxl(),
            jnp.float32),
        vae_cfg=AutoencoderKLConfig.sdxl(),
        te1_params=convert_clip_text_state_dict(
            load_state_dict(args.te1), CLIPTextConfig.sdxl_te1(), dtype),
        te1_cfg=CLIPTextConfig.sdxl_te1(),
        te2_params=convert_clip_text_state_dict(
            load_state_dict(args.te2), CLIPTextConfig.sdxl_te2(), dtype),
        te2_cfg=CLIPTextConfig.sdxl_te2(),
        tokenizer1=CLIPTokenizerWrapper(args.tokenizer1),
        tokenizer2=CLIPTokenizerWrapper(args.tokenizer2),
        dtype=dtype, **kw,
    )
    if args.mesh_data > 0:
        import jax

        from fairygen_tpu.core.meshes import make_mesh

        pipe.mesh = make_mesh(data=args.mesh_data, seq=1,
                              devices=jax.devices()[:args.mesh_data])

    def encode_png(frame):
        buf = io.BytesIO()
        Image.fromarray(np.asarray(frame)).save(buf, format="PNG")
        return {"png_base64": base64.b64encode(buf.getvalue()).decode()}

    engine = BatchingEngine(sdxl_generate_fn(pipe),
                            max_batch=args.max_batch,
                            max_wait_ms=args.max_wait_ms)
    server = InferenceServer(engine, host=args.host, port=args.port,
                             encode_result=encode_png).start()
    print(f"serving on http://{args.host}:{server.port} "
          f"(max_batch={args.max_batch}, mesh_data={args.mesh_data})")
    try:
        while True:
            import time

            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
