"""PrefetchLoader — the DataLoader(shuffle, num_workers) analogue
(reference diffusion/runner.py:29,61)."""
import threading
import time

import pytest

from fairygen_tpu.data import PrefetchLoader


def test_order_preserved_with_workers():
    data = list(range(57))
    out = list(PrefetchLoader(data, lambda x: x * 2, num_workers=4,
                              prefetch=6))
    assert out == [x * 2 for x in data]


def test_sync_path_num_workers_zero():
    out = list(PrefetchLoader(list("abc"), num_workers=0))
    assert out == list("abc")


def test_shuffle_is_seeded_and_varies_per_epoch():
    data = list(range(100))
    a = PrefetchLoader(data, shuffle=True, seed=7, num_workers=2)
    b = PrefetchLoader(data, shuffle=True, seed=7, num_workers=0)
    e0a, e0b = list(a), list(b)
    assert e0a == e0b  # same seed, same epoch -> same permutation
    assert e0a != data  # actually shuffled
    assert sorted(e0a) == data  # a permutation
    assert list(a) != e0a  # epoch 1 reshuffles


def test_worker_exception_propagates_in_order():
    def collate(x):
        if x == 3:
            raise ValueError("boom")
        return x

    it = iter(PrefetchLoader(list(range(6)), collate, num_workers=2))
    assert [next(it) for _ in range(3)] == [0, 1, 2]
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_early_break_shuts_down_workers():
    started = threading.Event()

    def collate(x):
        started.set()
        time.sleep(0.01)
        return x

    loader = PrefetchLoader(list(range(1000)), collate, num_workers=2,
                            prefetch=4)
    for i, _ in enumerate(loader):
        if i == 3:
            break
    started.wait(1.0)
    # pool is shut down with cancel_futures; nothing should keep running
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if not any(t.name.startswith("fairygen-loader") and t.is_alive()
                   and getattr(t, "_target", None)
                   for t in threading.enumerate()):
            break
        time.sleep(0.05)


def test_runner_uses_prefetch_loader_shuffled():
    """launch_training_task(shuffle=True) must visit every sample once per
    epoch, in a non-identity order, with workers preparing batches."""
    import jax.numpy as jnp

    from fairygen_tpu.training.runner import launch_training_task

    seen = []

    def train_step(state, batch, rng):
        seen.append(int(batch))
        return state, jnp.zeros(())

    data = list(range(64))
    launch_training_task(
        {}, train_step, data, lambda s: s, num_epochs=2,
        shuffle=True, num_workers=2, log_every=1000)
    assert len(seen) == 128
    assert sorted(seen[:64]) == data and sorted(seen[64:]) == data
    assert seen[:64] != data  # shuffled
    assert seen[:64] != seen[64:]  # reshuffled per epoch


def test_runner_stacks_global_batch_over_data_axis():
    """With a data-parallel mesh the runner stacks data-axis-size samples
    per step (DDP one-sample-per-rank equivalent) and drops the trailing
    partial group."""
    import jax.numpy as jnp

    from fairygen_tpu.core.meshes import make_mesh
    from fairygen_tpu.training.runner import launch_training_task

    mesh = make_mesh(data=2, seq=4)  # 8-device CPU mesh: data axis = 2
    shapes = []

    def train_step(state, batch, rng):
        shapes.append(batch["x"].shape)
        return state, jnp.zeros(())

    data = [{"x": jnp.full((1, 3), i, jnp.float32)} for i in range(5)]
    launch_training_task({}, train_step, data, lambda s: s, num_epochs=1,
                         mesh=mesh, log_every=1000)
    assert shapes == [(2, 3), (2, 3)]  # 5 samples -> 2 steps, last dropped
