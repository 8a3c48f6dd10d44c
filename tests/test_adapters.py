"""LoRA / DoRA adapter math + two-stage merge tests."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from fairygen_tpu.models.adapters import (
    add_lora_to_wan_dit,
    apply_adapter,
    dropout_lora_b,
    fuse_lora_into_wan_dit,
    init_lora,
    lora_trainable_filter,
    merge_stage_weights,
    merge_lora_rank_concat,
    normalize_lora_keys,
)
from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params, wan_dit_forward

CFG = WanDiTConfig(
    dim=96, in_dim=4, ffn_dim=128, out_dim=4, text_dim=32, freq_dim=32,
    patch_size=(1, 2, 2), num_heads=4, num_layers=2,
    seperated_timestep=True, require_clip_embedding=False,
    require_vae_embedding=False, fuse_vae_embedding_in_latents=True,
)


def _fwd(params):
    lat = jax.random.normal(jax.random.key(2), (1, 4, 3, 8, 8))
    ts = jnp.asarray([400.0])
    ctx = jax.random.normal(jax.random.key(3), (1, 10, 32))
    return wan_dit_forward(params, CFG, lat, ts, ctx, fuse_vae_embedding_in_latents=True)


@pytest.mark.slow
def test_zero_init_lora_is_identity():
    params = init_dit_params(jax.random.key(0), CFG)
    ref = _fwd(params)
    with_lora = add_lora_to_wan_dit(params, jax.random.key(1), rank=4)
    out = _fwd(with_lora)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.slow
def test_runtime_lora_matches_fused():
    params = init_dit_params(jax.random.key(0), CFG)
    with_lora = add_lora_to_wan_dit(params, jax.random.key(1), rank=4)
    # randomize B so the adapter does something
    key = jax.random.key(7)

    def rand_b(path, leaf):
        names = [getattr(p, "key", None) for p in path]
        if "lora" in names and names[-1] == "B":
            return jax.random.normal(jax.random.key(hash(tuple(names)) % 2**31), leaf.shape) * 0.02
        return leaf

    with_lora = jax.tree_util.tree_map_with_path(rand_b, with_lora)
    out_runtime = _fwd(with_lora)

    # build the reference-format lora state dict and fuse into base weights
    sd = {}
    L = CFG.num_layers
    name_map = {("self_attn", "q"): "self_attn.q", ("self_attn", "k"): "self_attn.k",
                ("self_attn", "v"): "self_attn.v", ("self_attn", "o"): "self_attn.o",
                ("cross_attn", "q"): "cross_attn.q", ("cross_attn", "k"): "cross_attn.k",
                ("cross_attn", "v"): "cross_attn.v", ("cross_attn", "o"): "cross_attn.o",
                ("ffn", "fc1"): "ffn.0", ("ffn", "fc2"): "ffn.2"}
    blocks = with_lora["blocks"]
    for (sub, proj), refname in name_map.items():
        if "lora" not in blocks[sub][proj]:
            continue
        A = np.asarray(blocks[sub][proj]["lora"]["A"])  # (L, in, r)
        B = np.asarray(blocks[sub][proj]["lora"]["B"])  # (L, r, out)
        for i in range(L):
            sd[f"blocks.{i}.{refname}.lora_A.default.weight"] = A[i].T  # (r, in)
            sd[f"blocks.{i}.{refname}.lora_B.default.weight"] = B[i].T  # (out, r)

    fused, n = fuse_lora_into_wan_dit(params, sd, CFG, alpha=1.0)
    assert n == len(sd) // 2
    out_fused = _fwd(fused)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_runtime), atol=1e-4)


@pytest.mark.slow
def test_dora_magnitude_identity_at_init():
    # DoRA with zero B: mag = ||W||, mns = 1, update = 0
    key = jax.random.key(0)
    w = jax.random.normal(key, (8, 16))
    p = {"w": w, "lora": init_lora(jax.random.key(1), 8, 16, 4, dora=True, base_w=w)}
    x = jax.random.normal(jax.random.key(2), (2, 5, 8))
    base = x @ w
    out = apply_adapter(base, x, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)


def test_mask_gated_adapter():
    key = jax.random.key(0)
    w = jax.random.normal(key, (8, 16))
    ap = init_lora(jax.random.key(1), 8, 16, 4)
    ap["B"] = jax.random.normal(jax.random.key(2), (4, 16)) * 0.1
    p = {"w": w, "lora": ap}
    x = jax.random.normal(jax.random.key(3), (1, 6, 8))
    base = x @ w
    mask = jnp.asarray([1, 1, 0, 0, 1, 0]).reshape(1, 6, 1)
    out = apply_adapter(base, x, p, mask=mask)
    full = apply_adapter(base, x, p)
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(base[0, 2]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(full[0, 0]), atol=1e-6)


@pytest.mark.slow
def test_stage_dropout_and_b2():
    params = init_dit_params(jax.random.key(0), CFG)
    with_lora = add_lora_to_wan_dit(params, jax.random.key(1), rank=4, with_b2=True)
    # dropout on zeros stays zeros; scale preserved in expectation
    dropped = dropout_lora_b(with_lora, jax.random.key(2), 0.8, which="B")
    b = dropped["blocks"]["self_attn"]["q"]["lora"]["B"]
    assert float(jnp.abs(b).sum()) == 0.0
    # nonzero B2: expectation preserved
    w2 = with_lora["blocks"]["self_attn"]["q"]["lora"]
    w2["B2"] = jnp.ones_like(w2["B2"])
    dropped = dropout_lora_b(with_lora, jax.random.key(3), 0.5, which="B2")
    b2 = np.asarray(dropped["blocks"]["self_attn"]["q"]["lora"]["B2"])
    assert set(np.unique(b2)).issubset({0.0, 2.0})
    assert abs(b2.mean() - 1.0) < 0.35


def test_merge_stage_weights():
    s1 = {
        "blocks.0.self_attn.q.lora_A.default.weight": np.ones((4, 8)),
        "blocks.0.self_attn.q.lora_B.default.weight": np.ones((8, 4)),
    }
    s2 = {"blocks.0.self_attn.q.lora_B2.weight": 2 * np.ones((8, 4))}
    merged = merge_stage_weights(s1, s2)
    np.testing.assert_allclose(
        merged["blocks.0.self_attn.q.lora_B.default.weight"], 3 * np.ones((8, 4))
    )
    np.testing.assert_allclose(
        merged["blocks.0.self_attn.q.lora_A.default.weight"], np.ones((4, 8))
    )


def test_normalize_lora_keys_variants():
    sd = {
        "diffusion_model.blocks.0.self_attn.q.lora_up.weight": np.ones((8, 4)),
        "diffusion_model.blocks.0.self_attn.q.lora_down.weight": np.ones((4, 8)),
        "blocks.1.ffn.0.lora_B.default.weight": np.ones((8, 4)),
        "blocks.1.ffn.0.lora_A.default.weight": np.ones((4, 8)),
    }
    out = normalize_lora_keys(sd)
    assert "blocks.0.self_attn.q.lora_B.weight" in out
    assert "blocks.1.ffn.0.lora_A.weight" in out


def test_rank_concat():
    a = {"x.lora_A.weight": np.ones((4, 8)), "x.lora_B.weight": np.ones((8, 4))}
    b = {"x.lora_A.weight": np.ones((2, 8)), "x.lora_B.weight": np.ones((8, 2))}
    m = merge_lora_rank_concat(a, b)
    assert m["x.lora_A.weight"].shape == (6, 8)
    assert m["x.lora_B.weight"].shape == (8, 6)


@pytest.mark.slow
def test_lora_only_training_updates_adapters():
    import optax
    from fairygen_tpu.training.train_step import make_wan_sft_train_step

    params = init_dit_params(jax.random.key(0), CFG)
    params = add_lora_to_wan_dit(params, jax.random.key(1), rank=4)
    init_state, train_step = make_wan_sft_train_step(
        CFG, optax.adamw(1e-2), remat=False,
        trainable_filter=lora_trainable_filter(("A", "B")),
    )
    state = init_state(params)
    batch = {
        "latents": jax.random.normal(jax.random.key(2), (1, 4, 3, 8, 8)),
        "context": jax.random.normal(jax.random.key(3), (1, 10, 32)),
    }
    new_state, loss = train_step(state, batch, jax.random.key(4))
    assert np.isfinite(float(loss))
    # base weights untouched, adapter A updated
    np.testing.assert_allclose(
        np.asarray(new_state.params["blocks"]["self_attn"]["q"]["w"]),
        np.asarray(params["blocks"]["self_attn"]["q"]["w"]),
    )
    a_old = np.asarray(params["blocks"]["self_attn"]["q"]["lora"]["A"])
    a_new = np.asarray(new_state.params["blocks"]["self_attn"]["q"]["lora"]["A"])
    assert np.abs(a_new - a_old).max() > 0


@pytest.mark.slow
def test_direct_distill_loss_runs_and_differentiates():
    from fairygen_tpu.training.losses import direct_distill_loss
    from fairygen_tpu.models.wan.dit import wan_dit_forward

    params = init_dit_params(jax.random.key(0), CFG)

    def model_fn(p, lat, t, ctx):
        return wan_dit_forward(p, CFG, lat, t, ctx, fuse_vae_embedding_in_latents=False)

    latents = jax.random.normal(jax.random.key(1), (1, 4, 3, 8, 8))
    ctx = jax.random.normal(jax.random.key(2), (1, 10, 32))
    loss, grads = jax.value_and_grad(
        lambda p: direct_distill_loss(model_fn, p, latents, ctx, jax.random.key(3),
                                      num_inference_steps=2)
    )(params)
    assert np.isfinite(float(loss))
    g = grads["blocks"]["self_attn"]["q"]["w"]
    assert np.abs(np.asarray(g)).max() > 0


@pytest.mark.slow
def test_trajectory_imitation_loss():
    from fairygen_tpu.training.losses import trajectory_imitation_loss
    from fairygen_tpu.models.wan.dit import wan_dit_forward

    student = init_dit_params(jax.random.key(0), CFG)
    teacher = init_dit_params(jax.random.key(9), CFG)

    def stu_fn(p, lat, t, ctx):
        return wan_dit_forward(p, CFG, lat, t, ctx)

    def tea_fn(lat, t, ctx):
        return wan_dit_forward(teacher, CFG, lat, t, ctx)

    noise = jax.random.normal(jax.random.key(1), (1, 4, 3, 8, 8))
    ctx = jax.random.normal(jax.random.key(2), (1, 10, 32))
    loss, grads = jax.value_and_grad(
        lambda p: trajectory_imitation_loss(
            stu_fn, tea_fn, p, noise, ctx,
            num_student_steps=2, num_teacher_steps=4)
    )(student)
    assert np.isfinite(float(loss))
    assert np.abs(np.asarray(grads["blocks"]["self_attn"]["q"]["w"])).max() > 0


def test_reset_lora_rank_reconstructs():
    from fairygen_tpu.models.adapters import reset_lora_rank

    rs = np.random.RandomState(0)
    # a rank-2 product stored at rank 8
    A = rs.randn(2, 16).astype(np.float32)
    B = rs.randn(12, 2).astype(np.float32)
    A8 = np.concatenate([A, np.zeros((6, 16), np.float32)], 0)
    B8 = np.concatenate([B, np.zeros((12, 6), np.float32)], 1)
    lora = {"x.lora_A.weight": A8, "x.lora_B.weight": B8}
    out = reset_lora_rank(lora, 2)
    W_ref = B8 @ A8
    W_new = out["x.lora_B.weight"] @ out["x.lora_A.weight"]
    np.testing.assert_allclose(W_new, W_ref, atol=1e-4)
    assert out["x.lora_A.weight"].shape == (2, 16)


@pytest.mark.slow
def test_distill_train_step_direct_and_trajectory():
    """make_wan_distill_train_step (reference --task direct_distill,
    train.py:59-61): both methods step, keep base weights frozen under the
    LoRA filter, and update the adapters."""
    import optax

    from fairygen_tpu.training.train_step import make_wan_distill_train_step

    params = init_dit_params(jax.random.key(0), CFG)
    teacher = params
    params = add_lora_to_wan_dit(params, jax.random.key(1), rank=4)
    batch = {
        "latents": jax.random.normal(jax.random.key(2), (1, 4, 3, 8, 8)),
        "context": jax.random.normal(jax.random.key(3), (1, 10, 32)),
    }
    for method, kw in (("direct", {}),
                       ("trajectory", {"num_teacher_steps": 6})):
        init_state, train_step = make_wan_distill_train_step(
            CFG, optax.adamw(1e-2), remat=False, method=method,
            num_inference_steps=2,
            trainable_filter=lora_trainable_filter(("A", "B")), **kw)
        state = init_state(params)
        args = (state, batch, jax.random.key(4))
        if method == "trajectory":
            new_state, loss = train_step(*args, teacher_params=teacher)
        else:
            new_state, loss = train_step(*args)
        assert np.isfinite(float(loss)), method
        np.testing.assert_allclose(
            np.asarray(new_state.params["blocks"]["self_attn"]["q"]["w"]),
            np.asarray(params["blocks"]["self_attn"]["q"]["w"]),
        )
        a_old = np.asarray(params["blocks"]["self_attn"]["q"]["lora"]["A"])
        a_new = np.asarray(
            new_state.params["blocks"]["self_attn"]["q"]["lora"]["A"])
        assert np.abs(a_new - a_old).max() > 0, method


def test_make_optimizer_adafactor_trains_with_less_state():
    """--optimizer adafactor (the TPU-native stand-in for the reference's
    8-bit Adam memory budget): the train step runs, loss is finite, and
    the optimizer state is materially smaller than AdamW's 2x-params."""
    import jax
    import jax.numpy as jnp

    from fairygen_tpu.models.wan.dit import WanDiTConfig, init_dit_params
    from fairygen_tpu.training.optimizers import make_optimizer
    from fairygen_tpu.training.train_step import make_wan_sft_train_step

    cfg = WanDiTConfig(
        dim=64, in_dim=4, ffn_dim=256, out_dim=4, text_dim=32, freq_dim=32,
        patch_size=(1, 2, 2), num_heads=2, num_layers=1)
    batch = {
        "latents": jax.random.normal(jax.random.key(2), (1, 4, 3, 8, 8)),
        "context": jax.random.normal(jax.random.key(3), (1, 7, 32)),
    }

    def state_bytes(tx):
        init_state, train_step = make_wan_sft_train_step(cfg, tx, remat=False)
        state = init_state(init_dit_params(jax.random.key(0), cfg))
        state, loss = train_step(state, batch, jax.random.key(1))
        assert jnp.isfinite(loss)
        return sum(x.nbytes for x in jax.tree.leaves(state.opt_state))

    ada = state_bytes(make_optimizer("adafactor", 1e-4, 0.0))
    adamw = state_bytes(make_optimizer("adamw", 1e-4, 0.01))
    assert ada < adamw / 1.5

    with __import__("pytest").raises(ValueError):
        make_optimizer("8bit_adam")


def _tiny_sd(key, rank=3, scale=0.05, blocks=(0,), targets=("self_attn.q", "ffn.0")):
    """Reference-layout LoRA state dict on a subset of layers."""
    rs = np.random.RandomState(key)
    sd = {}
    dims = {"self_attn.q": (96, 96), "self_attn.o": (96, 96),
            "cross_attn.v": (96, 96), "ffn.0": (96, 128), "ffn.2": (128, 96)}
    for i in blocks:
        for t in targets:
            din, dout = dims[t]
            sd[f"blocks.{i}.{t}.lora_A.weight"] = (
                rs.randn(rank, din).astype(np.float32) * scale)
            sd[f"blocks.{i}.{t}.lora_B.weight"] = (
                rs.randn(dout, rank).astype(np.float32) * scale)
    return sd


@pytest.mark.slow
def test_hot_lora_matches_fused():
    """hotload attaches the same math fuse bakes in (base_pipeline.py:
    249-264 vs general.py:44-62), and clear_hot_lora restores base."""
    from fairygen_tpu.models.adapters import clear_hot_lora, hot_lora_into_wan_dit

    params = init_dit_params(jax.random.key(0), CFG)
    sd = _tiny_sd(0, targets=("self_attn.q", "cross_attn.v", "ffn.0", "ffn.2"))
    base = _fwd(params)
    hot, n = hot_lora_into_wan_dit(params, sd, alpha=0.7)
    assert n == len(sd) // 2
    fused, _ = fuse_lora_into_wan_dit(params, sd, CFG, alpha=0.7)
    np.testing.assert_allclose(np.asarray(_fwd(hot)), np.asarray(_fwd(fused)),
                               atol=1e-4)
    cleared, nc = clear_hot_lora(hot)
    assert nc == 4
    np.testing.assert_allclose(np.asarray(_fwd(cleared)), np.asarray(base),
                               atol=1e-6)


@pytest.mark.slow
def test_hot_lora_rank_concat_no_retrace():
    """Two hot loads rank-concatenate (update = sum of both), and a
    same-total-rank swap keeps the exact pytree structure+shapes, so the
    jitted denoise would not retrace."""
    from fairygen_tpu.models.adapters import hot_lora_into_wan_dit

    params = init_dit_params(jax.random.key(0), CFG)
    sd1, sd2 = _tiny_sd(1), _tiny_sd(2)
    once, _ = hot_lora_into_wan_dit(params, sd1)
    both, _ = hot_lora_into_wan_dit(once, sd2)
    fused1, _ = fuse_lora_into_wan_dit(params, sd1, CFG)
    fused12, _ = fuse_lora_into_wan_dit(fused1, sd2, CFG)
    np.testing.assert_allclose(np.asarray(_fwd(both)), np.asarray(_fwd(fused12)),
                               atol=1e-4)

    swap_a, _ = hot_lora_into_wan_dit(params, _tiny_sd(3, rank=6))
    swap_b, _ = hot_lora_into_wan_dit(params, _tiny_sd(4, rank=6))
    sa = jax.tree.map(lambda x: (jnp.shape(x), jnp.asarray(x).dtype), swap_a)
    sb = jax.tree.map(lambda x: (jnp.shape(x), jnp.asarray(x).dtype), swap_b)
    assert jax.tree_util.tree_structure(sa) == jax.tree_util.tree_structure(sb)
    assert jax.tree.leaves(sa) == jax.tree.leaves(sb)


def test_hot_lora_on_quantized_weights():
    """Hot LoRA rides int8 base weights — fuse-at-load cannot (the
    reference's hotload exists for exactly this: patching without
    touching managed base weights)."""
    from fairygen_tpu.models.adapters import hot_lora_into_wan_dit
    from fairygen_tpu.models.wan.dit import _apply_dense
    from fairygen_tpu.ops.quant import quantize_dense_params

    w = np.asarray(jax.random.normal(jax.random.key(0), (96, 96)) * 0.1)
    layer = {"w": jnp.asarray(w), "b": jnp.zeros((96,))}
    qlayer = quantize_dense_params(layer)
    assert "w_int8" in qlayer
    sd = _tiny_sd(5, targets=("self_attn.q",))
    A = sd["blocks.0.self_attn.q.lora_A.weight"]
    B = sd["blocks.0.self_attn.q.lora_B.weight"]
    qlayer = dict(qlayer)
    qlayer["lora"] = {"A": jnp.asarray(A.T), "B": jnp.asarray(B.T),
                      "scale": 1.0}
    x = jax.random.normal(jax.random.key(1), (2, 96))
    got = _apply_dense(qlayer, x)
    want = _apply_dense({k: v for k, v in qlayer.items() if k != "lora"}, x)
    want = want + (x @ jnp.asarray(A.T)) @ jnp.asarray(B.T)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
