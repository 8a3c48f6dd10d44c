"""Calibrate per-channel activation stats for outlier-robust W8A8 on a
Wan checkpoint, and report the quantization health check.

The day real Wan-5B weights mount, this is the deployment flow the
round-5 outlier work exists for (the reference's FP8 linear,
``core/vram/layers.py:321-357``, ships plain per-row scaling with no
outlier story):

    python tools/calibrate_quant.py --model_paths '["dit.safetensors"]' \
        --height 480 --width 832 --num_frames 81 --steps 50 \
        --out act_amax.npz

    # then
    amax = load_act_amax("act_amax.npz")
    pipe.quantize("int8", act_amax=amax, outlier_k={"ffn": {"fc2": 8}})

Reports, per quantized group/layer: the calibrated per-channel amax
ranges, the CREST FACTOR the plain per-row path would see (per-op SNR ≈
440/crest, ops/quant.py), and the smoothed residual crest under α=0.5 —
i.e. whether plain W8A8 is safe (trained-tiny evidence says crest ≲ 12
is), whether smoothing suffices, or whether the bf16 fallback should be
enabled and where.
"""
import argparse
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def load_act_amax(path):
    """act_amax.npz -> the {group: {name: (L, K)}} dict
    ``pipe.quantize(act_amax=)`` takes."""
    import numpy as np

    data = np.load(path)
    out = {}
    for k in data.files:
        g, name = k.split("/", 1)
        out.setdefault(g, {})[name] = data[k]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", type=str, required=True,
                   help='JSON list of checkpoint paths (DiT required)')
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--rollouts", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--alpha", type=float, default=0.5)
    p.add_argument("--out", type=str, default=None,
                   help="save the stats as an npz (group/name arrays)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline
    from fairygen_tpu.training.quant_experiment import (
        calibrate_wan_dit_act_amax,
        rollout_calibration_samples,
    )

    pipe = WanVideoPipeline.from_pretrained(json.loads(args.model_paths))
    cfg = pipe.dit_cfg
    f = pipe.vae_cfg.upsampling_factor if pipe.vae_cfg else 16
    lat_shape = (1, cfg.in_dim, (args.num_frames - 1) // 4 + 1,
                 args.height // f, args.width // f)

    key = jax.random.PRNGKey(args.seed)
    amax = None
    for i in range(args.rollouts):
        k1, k2, key = jax.random.split(key, 3)
        noise = jax.random.normal(k1, lat_shape, pipe.dtype)
        ctx = jax.random.normal(k2, (1, 512, cfg.text_dim), pipe.dtype)
        samples = rollout_calibration_samples(
            pipe.dit_params, cfg, noise, ctx, rollout_steps=args.steps)
        got = calibrate_wan_dit_act_amax(pipe.dit_params, cfg, samples)
        if amax is None:
            amax = got
        else:
            for g in got:
                for name in got[g]:
                    amax[g][name] = np.maximum(amax[g][name], got[g][name])

    # health check: plain crest, smoothed residual crest per layer
    report = {}
    for g, layers in amax.items():
        for name, am in layers.items():
            w = pipe.dit_params["blocks"][g][name]
            wv = w.get("w")
            if wv is None:
                continue
            wmax = np.max(np.abs(np.asarray(wv, np.float32)), axis=-1)
            typ = np.median(am, axis=-1, keepdims=True) + 1e-12
            ratio = am / typ  # outlier-to-typical per channel
            s = np.power(np.maximum(am, 1e-12), args.alpha) / \
                np.power(np.maximum(wmax, 1e-12), 1 - args.alpha)
            sm_ratio = (am / s) / np.median(am / s, axis=-1,
                                            keepdims=True)
            report[f"{g}.{name}"] = {
                "amax_over_typical_max": float(ratio.max()),
                "smoothed_over_typical_max": float(sm_ratio.max()),
            }
    worst = max(report.items(), key=lambda kv: kv[1]["amax_over_typical_max"])
    print(json.dumps({
        "per_layer": report,
        "worst_layer": worst[0],
        "advice": (
            "plain W8A8 fine" if worst[1]["amax_over_typical_max"] < 8 else
            "enable smoothing (act_amax=)" if
            worst[1]["smoothed_over_typical_max"] < 8 else
            f"enable smoothing + bf16 fallback at {worst[0]} "
            "(outlier_k={...})"),
    }))
    if args.out:
        flat = {f"{g}/{name}": np.asarray(am, np.float32)
                for g, layers in amax.items()
                for name, am in layers.items()}
        np.savez(args.out, **flat)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
