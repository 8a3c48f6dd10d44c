"""Expert-parallel MoE FFN (parallel/expert.py).

Beyond-reference capability: the reference has NO expert parallelism
(SURVEY.md §2.5); its "two-expert" construct is the dit/dit2 timestep
boundary switch, a scheduling device.  These tests assert the sharded
dispatch→all_to_all→compute→all_to_all→combine path is exact vs the
dense grouped path, gradients (incl. the Switch aux loss) match, the
capacity-drop semantics engage, and the HLO carries the all-to-alls.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairygen_tpu.core.meshes import make_mesh
from fairygen_tpu.parallel.expert import (
    init_moe_params, moe_ffn, shard_moe_params)

E, D, F = 8, 32, 64


@pytest.fixture(scope="module")
def setup():
    params = init_moe_params(jax.random.key(0), E, D, F)
    x = jax.random.normal(jax.random.key(1), (2, 32, D))  # 64 tokens
    mesh = make_mesh(data=1, tensor=8)
    sharded = shard_moe_params(params, mesh, "tensor")
    dense = jax.jit(lambda p, x: moe_ffn(p, x, num_groups=8))(params, x)
    return params, sharded, x, mesh, dense


def test_ep_forward_matches_dense(setup):
    params, sharded, x, mesh, dense = setup
    ep = jax.jit(lambda p, x: moe_ffn(p, x, mesh, "tensor"))(sharded, x)
    assert float(jnp.abs(ep - dense).max()) < 1e-5


def test_ep_gradients_and_aux_match_dense(setup):
    params, sharded, x, mesh, _ = setup

    def loss(p, use_mesh):
        y, aux = moe_ffn(p, x, mesh if use_mesh else None, "tensor",
                         num_groups=8, return_aux=True)
        return (y.astype(jnp.float32) ** 2).mean() + 0.01 * aux

    g_ep = jax.jit(jax.grad(lambda p: loss(p, True)))(sharded)
    g_d = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    errs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_ep, g_d)
    assert max(jax.tree_util.tree_leaves(errs)) < 1e-4


def test_ep_capacity_drops_engage():
    """A router biased hard toward expert 0 must overflow a tiny capacity:
    dropped tokens get a zero expert contribution."""
    params = init_moe_params(jax.random.key(0), E, D, F)
    params["router"]["w"] = params["router"]["w"].at[:, 0].add(100.0)
    # non-negative inputs → logits[:, 0] = 100·Σx strictly dominates
    x = jnp.abs(jax.random.normal(jax.random.key(1), (64, D))) + 0.01
    full = moe_ffn(params, x, num_groups=1, capacity_factor=float(E))
    tiny = moe_ffn(params, x, num_groups=1, capacity_factor=0.25)
    # capacity 2 of 64 routed tokens kept → 62 rows exactly zero
    zero_rows = int(np.sum(np.abs(np.asarray(tiny)).max(axis=-1) == 0.0))
    assert zero_rows == 62
    assert float(jnp.abs(full - tiny).max()) > 0


def test_ep_dense_grouping_equals_sharded_grouping(setup):
    """num_groups=axis-size dense path reproduces the sharded result
    exactly (same per-group capacity and drop order)."""
    params, sharded, x, mesh, dense = setup
    ep = jax.jit(lambda p, x: moe_ffn(p, x, mesh, "tensor",
                                      capacity_factor=0.5))(sharded, x)
    dn = jax.jit(lambda p, x: moe_ffn(p, x, num_groups=8,
                                      capacity_factor=0.5))(params, x)
    assert float(jnp.abs(ep - dn).max()) < 1e-5


def test_ep_hlo_has_all_to_all(setup):
    params, sharded, x, mesh, _ = setup
    txt = jax.jit(lambda p, x: moe_ffn(p, x, mesh, "tensor")).lower(
        sharded, x).compile().as_text()
    assert "all-to-all" in txt


def test_ep_rejects_indivisible():
    params = init_moe_params(jax.random.key(0), E, D, F)
    x = jax.random.normal(jax.random.key(1), (63, D))
    with pytest.raises(ValueError, match="not divisible"):
        moe_ffn(params, x, num_groups=2)


def test_aux_loss_penalizes_collapsed_routing():
    """f_e must count raw routing (pre-capacity): with a router collapsed
    onto one expert, aux ≈ E · P_collapsed >> the balanced value of ~1,
    even though capacity drops flatten the dispatched counts."""
    import jax
    import jax.numpy as jnp

    from fairygen_tpu.parallel.expert import init_moe_params, moe_ffn

    E, D = 4, 8
    params = init_moe_params(jax.random.key(0), num_experts=E, dim=D,
                             ffn_dim=16)
    # bias the router hard onto expert 0
    params["router"]["w"] = params["router"]["w"].at[:, 0].set(50.0)
    # positive features so the collapsed column dominates every token
    x = jax.random.uniform(jax.random.key(1), (32, D)) + 0.1
    _, aux = moe_ffn(params, x, capacity_factor=1.0, return_aux=True)
    assert float(aux) > 2.0, float(aux)  # collapsed -> ~E, not ~1
