"""Quality-metric battery over generated vs reference images/frames.

Mirror of ``stylization/BrushNet/examples/brushnet/evaluate_brushnet.py``:
PSNR / SSIM / MSE / MAE on image pairs, plus — with the corresponding
checkpoints — CLIPScore (in-repo CLIP-L towers), LPIPS-squeeze, the
LAION aesthetic head, HPSv2.1 (OpenCLIP ViT-H/14 via --hps_weights), and
ImageReward-v1.0 (BLIP via --image_reward_weights + --bert_tokenizer).
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
    p.add_argument("--clip_vision_weights", type=str, default=None,
                   help="openai CLIP-L/14 vision tower safetensors")
    p.add_argument("--clip_text_weights", type=str, default=None)
    p.add_argument("--clip_tokenizer", type=str, default=None)
    p.add_argument("--lpips_weights", type=str, default=None,
                   help="lpips.LPIPS(net='squeeze') state dict")
    p.add_argument("--aesthetic_weights", type=str, default=None,
                   help="LAION sa_0_4_vit_l_14_linear head")
    p.add_argument("--hps_weights", type=str, default=None,
                   help="HPSv2.1 OpenCLIP ViT-H/14 checkpoint "
                        "(open_clip state-dict format)")
    p.add_argument("--image_reward_weights", type=str, default=None,
                   help="ImageReward-v1.0 state dict (blip.* naming)")
    p.add_argument("--bert_tokenizer", type=str, default=None,
                   help="local bert-base-uncased tokenizer dir "
                        "(for ImageReward)")
    p.add_argument("--output", type=str, default=None)
    args = p.parse_args()

    from PIL import Image

    from fairygen_tpu.utils.metrics import (
        aesthetic_score, clip_score_from_pixels, hps_score, lpips, mae, mse,
        psnr, ssim,
    )

    clip_v = clip_t = tok = lp_params = aes = None
    if args.clip_vision_weights:
        from fairygen_tpu.core.io import load_state_dict
        from fairygen_tpu.models.sdxl.clip import (
            CLIPTextConfig, CLIPVisionConfig, convert_clip_text_state_dict,
            convert_clip_vision_state_dict,
        )

        clip_v = (convert_clip_vision_state_dict(
            load_state_dict(args.clip_vision_weights), CLIPVisionConfig.clip_l14()),
            CLIPVisionConfig.clip_l14())
        if args.clip_text_weights and args.clip_tokenizer:
            from fairygen_tpu.utils.tokenizer import CLIPTokenizerWrapper

            clip_t = (convert_clip_text_state_dict(
                load_state_dict(args.clip_text_weights), CLIPTextConfig()),
                CLIPTextConfig())
            tok = CLIPTokenizerWrapper(args.clip_tokenizer)
    if args.lpips_weights:
        from fairygen_tpu.core.io import load_state_dict
        from fairygen_tpu.models.lpips import convert_lpips_state_dict

        lp_params = convert_lpips_state_dict(load_state_dict(args.lpips_weights))
    if args.aesthetic_weights and clip_v is not None:
        from fairygen_tpu.core.io import load_state_dict

        aes_sd = load_state_dict(args.aesthetic_weights)
        aes = (np.asarray(aes_sd["weight"]), np.asarray(aes_sd["bias"]))
    hps = None
    if args.hps_weights and args.clip_tokenizer:
        from fairygen_tpu.core.io import load_state_dict
        from fairygen_tpu.models.sdxl.clip import (
            CLIPTextConfig, CLIPVisionConfig, convert_open_clip_state_dict,
        )
        from fairygen_tpu.utils.tokenizer import CLIPTokenizerWrapper

        hv, ht, _ = convert_open_clip_state_dict(
            load_state_dict(args.hps_weights))
        hps = (hv, CLIPVisionConfig.openclip_h14(),
               ht, CLIPTextConfig.openclip_h14_text())
        if tok is None:
            tok = CLIPTokenizerWrapper(args.clip_tokenizer)
    ir = None
    if args.image_reward_weights and args.bert_tokenizer:
        from transformers import BertTokenizer

        from fairygen_tpu.core.io import load_state_dict
        from fairygen_tpu.models.image_reward import (
            convert_image_reward_state_dict,
        )

        ir_params, ir_vcfg, ir_tcfg = convert_image_reward_state_dict(
            load_state_dict(args.image_reward_weights))
        ir = (ir_params, ir_vcfg, ir_tcfg,
              BertTokenizer.from_pretrained(args.bert_tokenizer))

    def prompt_for(name):
        if not args.prompts_dir:
            return None
        path = os.path.join(args.prompts_dir, os.path.splitext(name)[0] + ".txt")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return f.read().strip()

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
        row = {
            "name": name,
            "psnr": float(psnr(a, b)),
            "ssim": float(ssim(a, b)),
            "mse": float(mse(a, b)),
            "mae": float(mae(a, b)),
        }
        if lp_params is not None:
            row["lpips"] = float(lpips(
                (a / 127.5 - 1.0).transpose(2, 0, 1)[None],
                (b / 127.5 - 1.0).transpose(2, 0, 1)[None], lp_params)[0])
        prompt = prompt_for(name)
        if clip_v is not None and clip_t is not None and prompt:
            row["clip_score"] = clip_score_from_pixels(
                a.astype(np.uint8), tok(prompt), clip_v[0], clip_v[1],
                clip_t[0], clip_t[1])
        if aes is not None:
            row["aesthetic"] = aesthetic_score(
                a.astype(np.uint8), clip_v[0], clip_v[1], aes[0], aes[1])
        if hps is not None and prompt:
            row["hpsv2"] = hps_score(
                a.astype(np.uint8), tok(prompt), hps[0], hps[1],
                hps[2], hps[3])
        if ir is not None and prompt:
            from fairygen_tpu.models.image_reward import (
                blip_preprocess, image_reward_score,
            )

            enc = ir[3](prompt, padding="max_length", truncation=True,
                        max_length=35, return_tensors="np")
            row["image_reward"] = float(image_reward_score(
                ir[0], blip_preprocess(a.astype(np.uint8),
                                       ir[1].image_size),
                enc["input_ids"], enc["attention_mask"],
                vit_cfg=ir[1], bert_cfg=ir[2])[0])
        rows.append(row)

    keys = sorted({k for r in rows for k in r if k != "name"})
    summary = {k: float(np.mean([r[k] for r in rows if k in r]))
               for k in keys} if rows else {}
    result = {"per_image": rows, "summary": summary, "count": len(rows)}

    out = json.dumps(result, indent=1)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)
    print(json.dumps(summary or result))


if __name__ == "__main__":
    main()
