"""Preemption-safe training: SIGTERM -> checkpoint at the step boundary ->
clean exit -> resume continues from the saved step (SURVEY §5 failure
recovery, beyond the reference's periodic-checkpoints-only story)."""
import os
import signal
import subprocess
import sys
import textwrap

import pytest

_SCRIPT = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
    from fairygen_tpu.training.runner import launch_training_task
    from fairygen_tpu.training.train_step import make_wan_sft_train_step

    cfg = WanDiTConfig(
        dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=1)
    init_state, train_step = make_wan_sft_train_step(
        cfg, optax.adam(1e-4), remat=False)
    state = init_state(init_dit_params(jax.random.key(0), cfg))

    rs = np.random.RandomState(0)
    def dataset():
        i = 0
        while True:
            yield {{"latents": jnp.asarray(rs.randn(1, 4, 3, 8, 8), jnp.float32),
                   "context": jnp.asarray(rs.randn(1, 7, 32), jnp.float32)}}
            i += 1
            if i == 3:
                print("READY", flush=True)  # parent sends SIGTERM now

    final = launch_training_task(
        state, train_step, dataset(), lambda x: x,
        num_epochs=1, log_every=1000,
        preemption_checkpoint={ckpt!r})
    print("EXITED_CLEANLY step", int(final.step), flush=True)
""")


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = str(tmp_path / "preempt_ckpt")
    script = tmp_path / "train.py"
    script.write_text(_SCRIPT.format(repo=repo, ckpt=ckpt))

    proc = subprocess.Popen([sys.executable, str(script)],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, bufsize=1)
    try:
        # wait for the loop to be mid-training, then "preempt" it
        for line in proc.stdout:
            if "READY" in line:
                proc.send_signal(signal.SIGTERM)
                break
        out, _ = proc.communicate(timeout=240)
    except Exception:
        proc.kill()
        raise
    assert proc.returncode == 0, out
    assert "[preemption] caught signal" in out, out
    assert "train state saved" in out, out
    assert "EXITED_CLEANLY" in out, out
    assert os.path.isdir(ckpt), "orbax checkpoint directory missing"

    # the checkpoint restores: params + opt state + step intact
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import optax

    from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
    from fairygen_tpu.training.runner import restore_train_state
    from fairygen_tpu.training.train_step import make_wan_sft_train_step

    cfg = WanDiTConfig(
        dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=4, num_layers=1)
    init_state, _ = make_wan_sft_train_step(cfg, optax.adam(1e-4),
                                            remat=False)
    abstract = jax.eval_shape(
        lambda: init_state(init_dit_params(jax.random.key(0), cfg)))
    restored = restore_train_state(ckpt, abstract)
    step = int(restored.step)
    assert step >= 3, step  # preempted after the third sample at least
