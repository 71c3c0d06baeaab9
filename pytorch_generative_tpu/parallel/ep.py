"""Expert parallelism: SparseMoE execution sharded over an 'expert' mesh axis.

The classic GShard/Switch layout on a TPU slice: the batch is sharded over the
same mesh axis that shards the experts (so each device routes its local tokens
and owns E/D experts), and two ``all_to_all`` collectives move token slots
between routing devices and expert owners over ICI:

    local routing -> all_to_all(split experts, concat slots)
    -> local expert MLPs (each device runs only its experts, on every device's
       slots for those experts) -> all_to_all back -> local combine.

Everything stays static-shape: per-device capacity is computed from the local
token count, dropped tokens contribute zero, and the dispatch/combine einsums
are identical to the dense path (nn/moe.py::SparseMoE.route — shared code).

The reference framework has no MoE or expert parallelism; together with dp
(mesh.py), tp (tp.py), sp (ring_attention.py), and pp (pp.py) this completes
the dp/tp/sp/pp/ep portfolio. Routing math follows the public Switch
Transformer (arXiv:2101.03961) / GShard (arXiv:2006.16668) formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pytorch_generative_tpu.nn.moe import capacity_for


def moe_forward_expert_parallel(moe, x, mesh: Mesh,
                                axis_name: str = "expert",
                                data_axis: str | None = None):
    """Runs a SparseMoE forward with experts sharded over ``axis_name``.

    Args:
        moe: A ``nn.moe.SparseMoE`` whose ``n_experts`` is divisible by the
            mesh axis size.
        x: (N, ..., C) activations; N must be divisible by the axis size (the
            batch is sharded over the same axis — dp x ep combined).
        mesh: Mesh containing ``axis_name``.
        data_axis: Optional second mesh axis for EP x DP composition: the
            batch is sharded over ``(data_axis, axis_name)`` jointly while
            experts shard over ``axis_name`` only (replicated across
            ``data_axis``); the ``all_to_all`` slot exchange stays within each
            data-replica's expert group, and expert-weight cotangents are
            psum'd over ``data_axis`` by shard_map (the DP gradient sum).
    Returns:
        (y, aux_loss): y shaped like x (fully replicated result of the
        sharded computation), aux_loss the mean over devices of the local
        Switch load-balancing losses.

    Equivalence with the dense path: exact when no token exceeds expert
    capacity (use capacity_factor >= E to guarantee it); under capacity
    pressure the two paths may drop different tokens (local vs global arrival
    order), which is inherent to capacity-based routing, not an error.
    """
    n_devices = mesh.shape[axis_name]
    n_experts = moe.n_experts
    batch_ways = n_devices * (mesh.shape[data_axis] if data_axis else 1)
    assert n_experts % n_devices == 0, (
        f"{n_experts} experts not divisible over {n_devices} devices")
    assert x.shape[0] % batch_ways == 0, (
        f"batch {x.shape[0]} not divisible over {batch_ways} devices")
    if x.ndim == 2:
        # The dense path routes a (N, C) matrix as ONE global group; no
        # per-device grouping can reproduce that capacity/aux-loss math
        # without cross-device routing, so reject rather than silently
        # diverge. (>=3-D inputs group per sample on both paths — identical.)
        raise ValueError(
            "moe_forward_expert_parallel needs (N, ..., C) inputs with a "
            "leading batch axis (>= 3-D); a 2-D token matrix routes as one "
            "global group on the dense path, which expert parallelism "
            "cannot replicate.")

    # Split the module into (replicated router, expert-sharded stacks). Every
    # array field rides in as a shard_map input — nothing is closed over, so
    # no full-size expert weight is ever materialized per device.
    expert_leaves = {"w1": moe.w1, "b1": moe.b1, "w2": moe.w2, "b2": moe.b2}
    router = moe.gate
    # Per-group (per local sample) routing, matching the dense path: capacity
    # scales with the group's token count, not the whole local batch.
    group_tokens = x.size // x.shape[-1] // x.shape[0]
    if moe.group_size is not None:
        assert group_tokens % moe.group_size == 0, (
            f"group_size {moe.group_size} must divide the per-sample token "
            f"count {group_tokens}")
        group_tokens = moe.group_size
    capacity = capacity_for(group_tokens * moe.n_selected, n_experts,
                            moe.capacity_factor)

    def shard_fn(router_p, expert_w, x_local):
        m = moe.replace(gate=router_p, **expert_w)
        tokens = x_local.reshape(x_local.shape[0], -1,
                                 x_local.shape[-1])  # (G, Tg, C)
        if moe.group_size is not None:
            tokens = tokens.reshape(-1, moe.group_size, tokens.shape[-1])
        src, valid, slot, weight, aux = jax.vmap(
            lambda t: m.route_compact(t, capacity))(tokens)
        expert_in = jax.vmap(m.dispatch_compact)(tokens, src, valid)
        # (G, E, cap, C) -> (G, E/D, D*cap, C): deliver each expert's slots to
        # its owning device; receive every device's slots for our experts.
        expert_in = jax.lax.all_to_all(
            expert_in, axis_name, split_axis=1, concat_axis=2, tiled=True)
        out = jax.vmap(m.apply_experts)(expert_in)
        out = jax.lax.all_to_all(
            out, axis_name, split_axis=2, concat_axis=1, tiled=True)
        y = jax.vmap(m.combine_compact)(out, slot, weight)
        aux_axes = (data_axis, axis_name) if data_axis else axis_name
        return y.reshape(x_local.shape), jax.lax.pmean(aux.mean(), aux_axes)

    batch_axes = (data_axis, axis_name) if data_axis else axis_name
    expert_spec = {k: P(axis_name) for k in expert_leaves}
    router_spec = jax.tree_util.tree_map(lambda _: P(), router)
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(router_spec, expert_spec, P(batch_axes)),
        out_specs=(P(batch_axes), P()), check_vma=False)
    y, aux = fn(router, expert_leaves, x)
    return y, aux
