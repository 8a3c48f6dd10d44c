"""Wan SFT train-step benchmark at flagship 480p shapes on the attached TPU.

A full-depth single-chip train step cannot fit 16 GB HBM (bf16 grads for
5B params are ~10 GB on top of the weights), matching the reference's
multi-GPU LoRA training setup — real training shards over the mesh
(training/train_step.py pjit path). This measures the per-block
fwd+bwd+update cost at REDUCED DEPTH (exact per-block compute: dim 3072,
8190 tokens, remat over the block scan) and extrapolates the 30-block
step, the number that feeds the training-throughput projection.

PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_train_step.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
from fairygen_tpu.training.train_step import make_wan_sft_train_step

DEPTHS = (2, 6)


def _time_step(depth, remat=True):
    cfg = WanDiTConfig.ti2v_5b()
    import dataclasses

    cfg = dataclasses.replace(cfg, num_layers=depth)
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(
        lambda: init_dit_params(jax.random.key(0), cfg, dtype=dtype))
    params = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    init_state, train_step = make_wan_sft_train_step(
        cfg, optax.sgd(1e-5), remat=remat)
    state = init_state(params)
    batch = {
        "latents": jnp.zeros((1, 48, 21, 30, 52), dtype),
        "context": jnp.zeros((1, 512, 4096), dtype),
    }
    rng = jax.random.key(0)

    state, loss = train_step(state, batch, rng)
    float(loss)
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, loss = train_step(state, batch, rng)
    float(loss)
    return (time.perf_counter() - t0) / n_iter


def main():
    import sys

    remat = "offload" if "offload" in sys.argv[1:] else True
    if remat == "offload":
        print("remat=offload: carry residuals in pinned host memory "
              "(--use_gradient_checkpointing_offload)")
    t = {d: _time_step(d, remat) for d in DEPTHS}
    for d, dt in t.items():
        print(f"depth {d}: {dt*1e3:8.1f} ms/step")
    per_block = (t[DEPTHS[1]] - t[DEPTHS[0]]) / (DEPTHS[1] - DEPTHS[0])
    overhead = t[DEPTHS[0]] - DEPTHS[0] * per_block
    full = 30 * per_block + overhead
    # fwd 2x matmul + bwd 4x (recompute fwd + 2 grad matmuls) with remat
    s, d_model, ffn = 8190, 3072, 14336
    blk_flops = 3 * (2 * s * d_model * d_model * (4 + 2)
                     + 2 * s * d_model * ffn * 2
                     + 4 * s * s * 128 * 24 + 4 * s * 512 * 128 * 24)
    eff_tfs = blk_flops / per_block / 1e12
    print(f"per-block fwd+bwd+sgd: {per_block*1e3:.1f} ms "
          f"({eff_tfs:.0f} TF/s eff incl. remat recompute)")
    print(f"EXTRAPOLATED 30-block 480p/81f train step: {full:.2f} s/step "
          f"(batch 1, remat; real training shards batch+tokens over the mesh)")

    # training-throughput scoreboard row (VERDICT r4 #8): committed next
    # to the inference rows so training perf is tracked round-over-round.
    # Reference anchor: the stage-1/2 budgets in animation/stage1_id.sh.
    import csv
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd=repo).stdout.strip() or "unknown"
    path = os.path.join(repo, "benchmarks", "training_results.csv")
    new = not os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["workload", "remat", "ms_per_block",
                        "s_per_step_30blk", "tokens_per_s", "eff_tf_s",
                        "backend", "git_sha"])
        w.writerow(["Wan-TI2V-5B-sft-480p81f-b1",
                    "offload" if remat == "offload" else "full",
                    f"{per_block * 1e3:.1f}", f"{full:.2f}",
                    f"{s / full:.0f}", f"{eff_tfs:.0f}",
                    jax.devices()[0].platform, sha])
    print(f"row appended -> {path}")


if __name__ == "__main__":
    main()
