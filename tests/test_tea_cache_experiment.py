"""TeaCache calibrate → gate flow demonstrated at trained-tiny scale
(VERDICT round-3 item 7).

The reference ships fitted polynomial tables for some models
(wan_video.py:1026-1035) and none for TI2V-5B; our calibration tooling
(``utils/tea_cache_calibration.py``) existed but the full operating flow
— fit on a trained model, pick a threshold, run the gated rollout,
measure the quality cost — had only "needs real weights" standing.
``training/tea_cache_experiment.py`` runs it end-to-end on the in-suite
trained tiny Wan DiT (same pattern as ``test_quant_trained.py``); this
test gates every stage.  At full scale the identical flow runs from
checkpoint files via ``tools/calibrate_tea_cache.py``.
"""
import numpy as np
import pytest


@pytest.mark.slow
def test_tea_cache_calibrate_then_gate_on_trained_model(trained_experiments):
    # the experiment runs subprocess-isolated (conftest
    # ``trained_experiments``, VERDICT r4 weak #3 — this very test was
    # where the r4 one-process full suite SIGSEGVed)
    r = {k: (np.asarray(v) if k.endswith("mask") else v)
         for k, v in trained_experiments["tea"].items()}

    # 1. the model demonstrably trained (same collapse gate as the quant
    #    experiment; the claim is about a *trained* model's drift curve)
    assert r["eval_after"] < 0.35 * r["eval_before"], (
        r["eval_before"], r["eval_after"])

    # 2. calibration fit: the degree-4 polynomial actually explains the
    #    (t_mod drift -> output drift) relation on this model
    assert r["fit_r2"] > 0.5, r["fit_r2"]

    # 3. the replayed schedule predicts the gated run step-for-step, up
    #    to f32 rounding when the accumulator lands within an ulp of the
    #    threshold (the runtime recomputes the drift inside XLA with its
    #    own reduction order) — this is what makes threshold selection
    #    offline.  Observed: 0-1 boundary flips in 50 steps.
    mismatches = int(
        (r["predicted_calc_mask"] != r["calc_mask"]).sum())
    assert mismatches <= 1, (mismatches, r["predicted_calc_mask"],
                             r["calc_mask"])

    # 4. the operating point does real work: ~30% of steps skipped
    #    (threshold was searched for target_calc_frac=0.7 of 50 steps;
    #    the search guarantees >= 35 calcs up to the one allowed flip)
    assert r["n_skip"] >= 10, (r["n_calc"], r["n_skip"])
    assert r["n_calc"] >= 34, (r["n_calc"], r["n_skip"])

    # 5. quality at the operating point: gated-vs-dense rollout PSNR
    #    clears the same 40 dB bar the int8 deployment gate uses
    assert r["psnr_gated"] > 40.0, r["psnr_gated"]
