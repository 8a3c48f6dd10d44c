"""Calibrate TeaCache polynomial coefficients for a Wan checkpoint.

The reference ships fixed tables with no Wan2.2-TI2V-5B entry and no
calibration path (wan_video.py:1026-1035); this runs the fit described in
fairygen_tpu/utils/tea_cache_calibration.py on real checkpoint weights.

    python tools/calibrate_tea_cache.py --model_paths '["dit.safetensors"]' \
        --height 480 --width 832 --num_frames 81 --steps 50 --rollouts 3 \
        --model_id Wan2.2-TI2V-5B --out coefficients.json

The printed/saved entry plugs into
fairygen_tpu.utils.tea_cache.TEACACHE_COEFFICIENTS (or
register_tea_cache_coefficients at runtime), after which
``pipe(tea_cache_l1_thresh=..., tea_cache_model_id=<model_id>)``
thresholds mean accumulated predicted relative output error.

With ``--target_calc_frac`` the tool also picks the operating threshold:
it replays the runtime accumulator rule over the captured drift trace and
binary-searches the threshold that computes the requested fraction of
steps (training/tea_cache_experiment.py — flow demonstrated end-to-end at
trained-tiny scale in test_tea_cache_experiment.py, 70 dB vs dense at
0.7 compute).
"""
import argparse
import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", type=str, required=True,
                   help='JSON list of checkpoint paths (DiT required)')
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--rollouts", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_id", type=str, default="calibrated")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--target_calc_frac", type=float, default=None,
                   help="also pick the threshold whose replayed schedule "
                   "computes this fraction of steps (e.g. 0.7)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fairygen_tpu.pipelines.wan_video import WanVideoPipeline
    from fairygen_tpu.utils.tea_cache_calibration import (
        calibrate_wan_tea_cache,
    )

    pipe = WanVideoPipeline.from_pretrained(json.loads(args.model_paths))
    cfg = pipe.dit_cfg
    f = pipe.vae_cfg.upsampling_factor if pipe.vae_cfg else 16
    lat_shape = (1, cfg.in_dim, (args.num_frames - 1) // 4 + 1,
                 args.height // f, args.width // f)

    key = jax.random.PRNGKey(args.seed)
    lats, ctxs = [], []
    for i in range(args.rollouts):
        k1, k2, key = jax.random.split(key, 3)
        lats.append(jax.random.normal(k1, lat_shape, pipe.dtype))
        ctxs.append(jax.random.normal(k2, (1, 512, cfg.text_dim),
                                      pipe.dtype))

    coeffs, (xs, ys) = calibrate_wan_tea_cache(
        pipe.dit_params, cfg, lats, ctxs,
        num_inference_steps=args.steps)
    entry = {args.model_id: coeffs}
    report = {"coefficients": entry,
              "pairs": len(xs),
              "x_range": [float(xs.min()), float(xs.max())],
              "y_range": [float(ys.min()), float(ys.max())]}
    if args.target_calc_frac is not None:
        from fairygen_tpu.training.tea_cache_experiment import (
            pick_threshold,
            simulate_calc_schedule,
        )

        xs_one = xs[: args.steps - 1]  # t_mod depends only on the timestep
        thresh = pick_threshold(coeffs, xs_one, args.steps,
                                args.target_calc_frac)
        mask = simulate_calc_schedule(coeffs, xs_one, thresh, args.steps)
        report["threshold"] = float(thresh)
        report["predicted_calc_steps"] = int(mask.sum())
        report["predicted_skip_steps"] = int(args.steps - mask.sum())
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(entry, fh, indent=1)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
