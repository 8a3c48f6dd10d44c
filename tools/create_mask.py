"""Foreground mask extraction for DoRA training data.

Port of ``stylization/dora_training/create_mask.py``: run the rembg
isnet-anime segmenter over an image and save a binarized ({0,255}) mask.
The reference calls ``rembg.remove(only_mask=True)``; here the same ISNet
runs natively on TPU (fairygen_tpu/models/isnet.py) from a DIS-format
checkpoint (.safetensors or torch .pth of github.com/xuebinqin/DIS, which
is also the network inside rembg's isnet-anime ONNX).

Usage:
  python tools/create_mask.py --weights isnet-anime.safetensors \
      --input texture.png --output mask.png [--preset isnet-anime]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True,
                   help="DIS/isnet state dict (.safetensors or torch .pth)")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--preset", default="isnet-anime",
                   choices=["isnet-anime", "isnet-general-use"])
    p.add_argument("--threshold", type=int, default=127,
                   help="binarize at >threshold (create_mask.py:26)")
    p.add_argument("--infer_size", type=int, default=0,
                   help="override the preset's inference resolution "
                        "(0 = preset default, 1024)")
    args = p.parse_args()

    from PIL import Image

    from fairygen_tpu.core.io import load_state_dict
    from fairygen_tpu.models.isnet import (
        convert_isnet_state_dict,
        extract_mask,
    )

    from fairygen_tpu.core.model_config import override_config
    from fairygen_tpu.models.isnet import ISNetConfig

    image = np.asarray(Image.open(args.input).convert("RGB"))
    cfg = override_config("isnet", ISNetConfig.dis())
    params, cfg = convert_isnet_state_dict(load_state_dict(args.weights), cfg)
    mask = extract_mask(params, cfg, image, preset=args.preset,
                        threshold=args.threshold,
                        size=(args.infer_size,) * 2 if args.infer_size else None)
    Image.fromarray(mask, mode="L").save(args.output)
    print(f"mask saved to {args.output}")


if __name__ == "__main__":
    main()
