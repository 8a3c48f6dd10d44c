"""Expert parallelism: Switch-style top-1 MoE FFN over a mesh axis.

The reference has NO expert parallelism (SURVEY.md §2.5: "PP, TP, EP —
absent"; its only "two-expert" construct is the dit/dit2 timestep-boundary
switch, a scheduling device).  This module is a beyond-parity framework
capability: a routed mixture-of-experts FFN whose experts are sharded over
a mesh axis, with the canonical dispatch→all_to_all→compute→all_to_all→
combine data path (Switch Transformer / GShard schedule) expressed as XLA
collectives inside ``shard_map``.

Semantics (deterministic, test-exact):
  - top-1 routing with softmax gate scaling;
  - per-group capacity ``C = max(1, ceil(T_local · capacity_factor / E))``
    with in-order overflow drops (dropped tokens pass through with a zero
    expert contribution — residual callers keep the identity path);
  - the dense (no-mesh) path runs the SAME math with ``num_groups`` token
    groups, so expert-parallel == dense is exact by construction
    (tests/test_expert_parallel.py).

Gradients: the gate is differentiable through the softmax gather (the
standard straight-through-free Switch estimator); dispatch masks are
constants of the backward pass.  A load-balance auxiliary (Switch aux loss
``E · Σ_e f_e · p̄_e``) is returned alongside when ``return_aux``.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.meshes import AXES


def init_moe_params(key, num_experts: int, dim: int, ffn_dim: int,
                    dtype=jnp.float32) -> Dict[str, Any]:
    kr, k1, k2 = jax.random.split(key, 3)
    s1 = 1.0 / math.sqrt(dim)
    s2 = 1.0 / math.sqrt(ffn_dim)
    E = num_experts
    return {
        "router": {"w": (jax.random.normal(kr, (dim, E)) * 0.02).astype(dtype)},
        "fc1": {"w": (jax.random.uniform(k1, (E, dim, ffn_dim), minval=-s1,
                                         maxval=s1)).astype(dtype),
                "b": jnp.zeros((E, ffn_dim), dtype)},
        "fc2": {"w": (jax.random.uniform(k2, (E, ffn_dim, dim), minval=-s2,
                                         maxval=s2)).astype(dtype),
                "b": jnp.zeros((E, dim), dtype)},
    }


def shard_moe_params(params: Dict[str, Any], mesh: Mesh,
                     axis: str = AXES.tensor) -> Dict[str, Any]:
    """Experts sharded over ``axis`` on their leading dim; router replicated."""
    def place(path, a):
        top = path[0].key
        spec = P(axis) if top in ("fc1", "fc2") else P()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def _capacity(tokens_per_group: int, num_experts: int,
              capacity_factor: float) -> int:
    return max(1, math.ceil(tokens_per_group * capacity_factor / num_experts))


def _route_and_dispatch(router_w, x, num_experts: int, capacity: int):
    """x: (T, D) → dispatch (T, E, C) float mask, gate (T,), probs (T, E)."""
    logits = (x.astype(jnp.float32) @ router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)  # (T, E)
    idx = jnp.argmax(probs, axis=-1)  # (T,)
    gate = jnp.take_along_axis(probs, idx[:, None], axis=-1)[:, 0]  # (T,)
    onehot = jax.nn.one_hot(idx, num_experts, dtype=jnp.float32)  # (T, E)
    pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot  # 0-based slot per expert
    keep = (pos < capacity).astype(jnp.float32) * onehot
    # (T, E, C): token t occupies slot pos[t, e] of expert e (if kept)
    disp = keep[:, :, None] * jax.nn.one_hot(
        pos.astype(jnp.int32), capacity, dtype=jnp.float32)
    return disp, gate, probs, onehot


def _expert_compute(params, tok):
    """tok: (E_local, C', D) → (E_local, C', D) per-expert FFN."""
    h = jnp.einsum("ecd,edf->ecf", tok, params["fc1"]["w"].astype(tok.dtype))
    h = h + params["fc1"]["b"].astype(tok.dtype)[:, None]
    h = jax.nn.gelu(h, approximate=True)
    o = jnp.einsum("ecf,efd->ecd", h, params["fc2"]["w"].astype(tok.dtype))
    return o + params["fc2"]["b"].astype(tok.dtype)[:, None]


def _local_moe(params, x, num_experts: int, capacity: int):
    """All experts local: the n=1 body shared by both paths. x: (T, D)."""
    disp, gate, probs, assigned = _route_and_dispatch(
        params["router"]["w"], x, num_experts, capacity)
    buf = jnp.einsum("tec,td->ecd", disp.astype(x.dtype), x)  # (E, C, D)
    out = _expert_compute(params, buf)
    y = jnp.einsum("ecd,tec->td", out, disp.astype(x.dtype))
    y = y * gate.astype(x.dtype)[:, None]
    # Switch aux loss: E · Σ_e (token fraction ROUTED to e) · (mean router
    # prob e).  f_e counts the raw argmax assignment, NOT the post-
    # capacity-drop dispatch — otherwise drops flatten frac exactly when
    # routing collapses and the loss stops pushing back.
    frac = jnp.mean(assigned, axis=0)
    aux = num_experts * jnp.sum(frac * probs.mean(axis=0))
    return y, aux


def moe_ffn(
    params: Dict[str, Any],
    x,  # (..., D) tokens
    mesh: Optional[Mesh] = None,
    axis: str = AXES.tensor,
    *,
    capacity_factor: float = 1.0,
    num_groups: int = 1,
    return_aux: bool = False,
):
    """Mixture-of-experts FFN.  With ``mesh``: experts sharded over ``axis``
    (leading dim, see shard_moe_params), tokens sharded over the same axis,
    dispatch/return via two all_to_alls.  Without: the same math over
    ``num_groups`` token groups (set num_groups = axis size to reproduce
    the sharded result exactly)."""
    E = params["fc1"]["w"].shape[0]
    D = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape(-1, D)
    T = x2d.shape[0]

    n = mesh.shape[axis] if (mesh is not None and axis in mesh.axis_names) else 1
    groups = n if n > 1 else max(1, int(num_groups))
    if T % groups or E % max(n, 1):
        raise ValueError(f"tokens {T} / experts {E} not divisible by {groups}/{n}")
    cap = _capacity(T // groups, E, capacity_factor)

    if n <= 1:
        xg = x2d.reshape(groups, T // groups, D)
        y, aux = jax.vmap(lambda g: _local_moe(params, g, E, cap))(xg)
        y = y.reshape(*lead, D)
        return (y, aux.mean()) if return_aux else y

    E_local = E // n

    def run(params, xs):  # xs: (T/n, D) local tokens; experts (E_local, ...)
        disp, gate, probs, assigned = _route_and_dispatch(
            params["router"]["w"], xs, E, cap)
        buf = jnp.einsum("tec,td->ecd", disp.astype(xs.dtype), xs)  # (E, C, D)
        # (E, C, D) → (E_local, n·C, D): each owner receives every shard's
        # slots for its experts
        recv = lax.all_to_all(buf, axis, split_axis=0, concat_axis=1,
                              tiled=True)
        out = _expert_compute(params, recv)
        # inverse: (E_local, n·C, D) → (E, C, D) back at the token owners
        ret = lax.all_to_all(out, axis, split_axis=1, concat_axis=0,
                             tiled=True)
        y = jnp.einsum("ecd,tec->td", ret, disp.astype(xs.dtype))
        y = y * gate.astype(xs.dtype)[:, None]
        frac = jnp.mean(assigned, axis=0)  # raw routing, pre-capacity (see _local_moe)
        aux = E * jnp.sum(frac * probs.mean(axis=0))
        return y, lax.pmean(aux, axis)

    pspecs = jax.tree_util.tree_map_with_path(
        lambda path, _: P(axis) if path[0].key in ("fc1", "fc2") else P(),
        params)
    y, aux = shard_map(
        run, mesh=mesh,
        in_specs=(pspecs, P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )(params, x2d)
    y = y.reshape(*lead, D)
    return (y, aux) if return_aux else y
