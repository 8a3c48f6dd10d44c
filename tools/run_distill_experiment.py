"""Run the tiny-scale distillation experiments (VERDICT round-2 item 1).

Executes the real optimization loops behind the few-step claims:

  * Wan: trajectory-imitation student (reference TrajectoryImitationLoss,
    animation/diffsynth/diffusion/loss.py:36-119) — a 4-step student
    learns its teacher's 24-step flow rollout.
  * SDXL: LCM student (direct rollout-match / latent consistency
    distillation) against the committed tiny golden UNet.

Usage:
    python tools/run_distill_experiment.py [--wan-steps 300]
        [--sdxl-steps 400] [--method direct|consistency] [--cpu]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wan-steps", type=int, default=300)
    p.add_argument("--sdxl-steps", type=int, default=400)
    p.add_argument("--method", default="direct",
                   choices=["direct", "consistency"])
    p.add_argument("--student-steps", type=int, default=4)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (tiny models gain nothing "
                        "from the tunneled TPU)")
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from fairygen_tpu.training.distill_experiment import (
        run_sdxl_golden_experiment,
        run_wan_distill_experiment,
    )

    print("== Wan trajectory-imitation student ==")
    wan = run_wan_distill_experiment(
        num_train_steps=args.wan_steps,
        num_student_steps=args.student_steps, log_every=50)
    print(json.dumps({k: round(v, 3) for k, v in wan.items()
                      if k != "losses"}))

    print(f"== SDXL {args.method} LCM student ==")
    sdxl = run_sdxl_golden_experiment(
        method=args.method, num_train_steps=args.sdxl_steps,
        num_student_steps=args.student_steps, num_teacher_steps=25,
        lr=3e-4, log_every=50)
    print(json.dumps({k: round(v, 3) for k, v in sdxl.items()
                      if k not in ("losses", "params")}))

    print(json.dumps({
        "wan_psnr_before": round(wan["psnr_before"], 2),
        "wan_psnr_after": round(wan["psnr_after"], 2),
        "sdxl_psnr_before": round(sdxl["psnr_before"], 2),
        "sdxl_psnr_after": round(sdxl["psnr_after"], 2),
    }))


if __name__ == "__main__":
    main()
