"""Sparsely-gated Mixture-of-Experts layer (Switch top-1 / GShard top-2).

The reference framework has no MoE (SURVEY.md section 2.8 lists only DDP data
parallelism); this layer and its expert-parallel execution path
(parallel/ep.py) extend the parallelism portfolio to dp/tp/sp/pp/ep — the full
set of shardings a production TPU stack ships.

TPU-native construction: routing is a single stable sort of the (token,
choice) pairs by expert followed by static-shape row gathers — dispatch costs
O(T·C + T log T) and the expert MLPs are batched (E, capacity, *) matmuls on
the MXU. Everything is static-shape under jit: tokens beyond an expert's
capacity are dropped (their contribution is zero; the surrounding residual
connection carries them through).

Two dispatch/combine formulations ship, selected by what the hardware is
actually fast at:

- **one-hot einsums** (``route_onehot``, the GShard paper's presentation,
  built with cumsums — no sort): O(cf · T^2 · C) compute, but every op is an
  MXU matmul or a vectorized cumsum. This is the DENSE-path default: on v5e
  at ImageGPT bench shapes (T=784, E=8, cap=196, C=64) it trains 2x faster
  end-to-end than the sort/gather form (1,649 vs 824 samples/s) — argsort
  and row gather/scatter are lane-serial VPU work on TPU, and the backward
  of a gather is a scatter, while the backward of an einsum is an einsum.
- **sort/gather** (``route_compact``): one stable argsort of the (token,
  choice) pairs by expert + static-shape row gathers — O(T·C + T log T),
  asymptotically better and the form whose (E, capacity, C) buffers expert
  parallelism's ``all_to_all`` moves (parallel/ep.py). ``PGT_MOE_ROUTING=
  compact`` forces it on the dense path (profitable only when cf·T·C grows
  far past these shapes).

Both produce IDENTICAL results (same GShard capacity priority, same drops):
equality is tested under capacity pressure and for top-1/top-2.

Reference points for the routing math (public): the Switch Transformer paper
(arXiv:2101.03961) and GShard (arXiv:2006.16668).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.nn.linear import Linear
from pytorch_generative_tpu.ops import init as init_ops


def capacity_for(n_tokens: int, n_experts: int, capacity_factor: float) -> int:
    """Per-expert token capacity: ceil(cf * T / E), floored at 1."""
    return max(int(math.ceil(capacity_factor * n_tokens / n_experts)), 1)


class SparseMoE(core.Module):
    """Top-k (k=1 Switch, k=2 GShard) mixture of E expert MLPs.

    Each expert is a two-layer GELU MLP (C -> hidden -> C) whose weights are
    stacked on a leading expert axis, so the forward pass is batched matmuls
    of shape (E, capacity, *) — MXU-friendly and, under expert parallelism,
    shardable on the expert axis with two ``all_to_all`` collectives
    (parallel/ep.py).

    Gating: ``n_selected=1`` scales the chosen expert's output by its raw
    router probability (Switch); ``n_selected=2`` normalizes the two chosen
    probabilities to sum to 1 (GShard). Capacity priority follows GShard:
    within an expert, every first-choice token outranks every second-choice
    token, each group in arrival order.
    """

    gate: Linear
    w1: jax.Array  # (E, C, hidden)
    b1: jax.Array  # (E, hidden)
    w2: jax.Array  # (E, hidden, C)
    b2: jax.Array  # (E, C)
    n_experts: int = core.static_field()
    capacity_factor: float = core.static_field()
    n_selected: int = core.static_field()
    group_size: int | None = core.static_field()

    def __init__(self, key, n_channels: int, hidden_channels: int,
                 n_experts: int, capacity_factor: float = 2.0,
                 n_selected: int = 1, group_size: int | None = None):
        assert 1 <= n_selected <= n_experts
        kg, k1, k2, k3, k4 = jax.random.split(key, 5)
        self.gate = Linear(kg, n_channels, n_experts)
        self.w1 = init_ops.torch_default_weight(
            k1, (n_experts, n_channels, hidden_channels), n_channels)
        self.b1 = init_ops.torch_default_bias(
            k2, (n_experts, hidden_channels), n_channels)
        self.w2 = init_ops.torch_default_weight(
            k3, (n_experts, hidden_channels, n_channels), hidden_channels)
        self.b2 = init_ops.torch_default_bias(
            k4, (n_experts, n_channels), hidden_channels)
        self.n_experts = n_experts
        self.capacity_factor = capacity_factor
        self.n_selected = n_selected
        self.group_size = group_size

    # --- Routing (shared by the dense path and parallel/ep.py). ---

    def _top_k(self, tokens):
        """(T, C) tokens -> (idx (T, S), gates (T, S) f32, probs (T, E))."""
        probs = jax.nn.softmax(self.gate(tokens).astype(jnp.float32), axis=-1)
        if self.n_selected == 1:
            idx = jnp.argmax(probs, axis=-1)[:, None]
            gates = jnp.max(probs, axis=-1)[:, None]
        else:
            gates, idx = jax.lax.top_k(probs, self.n_selected)
            gates = gates / jnp.sum(gates, axis=-1, keepdims=True)
        return idx, gates, probs

    def route_compact(self, tokens, capacity: int):
        """Sort/gather Switch routing for (T, C) tokens — O(T·C), no one-hot.

        Returns:
            src: (E, capacity) int32 — the token filling each expert slot
                (arbitrary where ``valid`` is False).
            valid: (E, capacity) bool — slot actually occupied.
            slot: (T, S) int32 — flat E*capacity slot index of each token's
                k-th choice (clipped; mask with ``weight``).
            weight: (T, S) f32 — router gate of the k-th choice, zeroed for
                tokens dropped past capacity.
            aux_loss: Switch load-balancing loss
                E * sum_e(first_choice_fraction_e * mean_prob_e); 1.0 at
                uniform.
        """
        t, e, s = tokens.shape[0], self.n_experts, self.n_selected
        idx, gates, probs = self._top_k(tokens)

        # Virtual tokens in choice-major order: sorting by
        # expert * (S*T) + virtual_id groups slots per expert with every
        # first choice (in arrival order) ahead of every second choice — the
        # GShard priority rule (position_in_expert_2 offsets by count_1).
        flat_expert = idx.T.reshape(-1)  # (S*T,)
        order = jnp.argsort(flat_expert * (s * t)
                            + jnp.arange(s * t, dtype=flat_expert.dtype))
        counts = jnp.bincount(flat_expert, length=e).astype(jnp.int32)
        start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])

        r = jnp.arange(capacity, dtype=jnp.int32)
        picked = order[jnp.clip(start[:, None] + r[None], 0, s * t - 1)]
        valid = r[None, :] < jnp.minimum(counts, capacity)[:, None]
        src = (picked % t).astype(jnp.int32)

        # Token-side view: each virtual token's rank within its expert queue.
        inv = jnp.argsort(order)  # position of each virtual token in the sort
        rank = inv - start[flat_expert]
        kept = rank < capacity
        slot_flat = jnp.clip(flat_expert * capacity + rank, 0,
                             e * capacity - 1).astype(jnp.int32)
        slot = slot_flat.reshape(s, t).T
        weight = jnp.where(kept.reshape(s, t).T, gates, 0.0)

        first_frac = jnp.bincount(idx[:, 0], length=e) / t
        aux_loss = e * jnp.sum(first_frac * jnp.mean(probs, axis=0))
        return src, valid, slot, weight, aux_loss

    def route_onehot(self, tokens, capacity: int):
        """One-hot dispatch/combine tensors built with cumsums (no sort).

        The GShard einsum formulation: positions-in-expert come from running
        cumsums of the per-choice one-hot assignment matrices, with the same
        capacity priority as :meth:`route_compact` (within an expert, every
        first-choice token outranks every second-choice token, each group in
        arrival order) — the two routes produce identical dispatch/combine
        tensors, drops included.

        Returns:
            dispatch: (T, E, capacity) f32 0/1 — token t occupies slot c of
                expert e (dropped tokens: all-zero rows).
            combine: (T, E, capacity) f32 — dispatch scaled by the router
                gate of the choice that filled each slot.
            aux_loss: as in :meth:`route_compact`.
        """
        e = self.n_experts
        idx, gates, probs = self._top_k(tokens)

        oh = jax.nn.one_hot(idx.T, e, dtype=jnp.float32)  # (S, T, E)
        # Tokens already queued per expert by all earlier (higher-priority)
        # choices: the GShard position_in_expert_2 += count_1 offset.
        prev = jnp.cumsum(oh.sum(axis=1), axis=0) - oh.sum(axis=1)  # (S, E)
        pos = jnp.cumsum(oh, axis=1) - oh + prev[:, None, :]  # (S, T, E)
        kept = oh * (pos < capacity)
        pos_tok = jnp.sum(pos * oh, axis=-1).astype(jnp.int32)  # (S, T)
        slot = jax.nn.one_hot(pos_tok, capacity, dtype=jnp.float32)
        dispatch = jnp.einsum("ste,stc->tec", kept, slot)
        combine = jnp.einsum("ste,stc,ts->tec", kept, slot,
                             gates.astype(jnp.float32))

        first_frac = jnp.mean(oh[0], axis=0)
        aux_loss = e * jnp.sum(first_frac * jnp.mean(probs, axis=0))
        return dispatch, combine, aux_loss

    def route(self, tokens, capacity: int):
        """One-hot dispatch/combine view of :meth:`route_compact`.

        Returns:
            dispatch: (T, E, capacity) 0/1 — token t occupies slot c of
                expert e (dropped tokens: all-zero rows).
            combine: dispatch scaled by the router gate of the choice that
                filled each slot.
            aux_loss: as in :meth:`route_compact`.

        Kept for tests and debugging; the compute paths use the compact form
        (the one-hot tensors are O(cf·T^2) to build and consume).
        """
        t = tokens.shape[0]
        src, valid, slot, weight, aux_loss = self.route_compact(tokens,
                                                                capacity)
        dispatch = jax.nn.one_hot(jnp.where(valid, src, t), t,
                                  dtype=tokens.dtype, axis=0)  # (T, E, cap)
        # Per-slot weight: scatter each token-choice's gate to its slot.
        w_slot = jnp.zeros((self.n_experts * capacity,), jnp.float32)
        w_slot = w_slot.at[slot.reshape(-1)].max(weight.reshape(-1))
        combine = dispatch * w_slot.reshape(self.n_experts, capacity).astype(
            tokens.dtype)
        return dispatch, combine, aux_loss

    def dispatch_compact(self, tokens, src, valid):
        """Gathers (T, C) tokens into (E, capacity, C) expert inputs."""
        taken = jnp.take(tokens, src.reshape(-1), axis=0)
        taken = taken.reshape(*src.shape, tokens.shape[-1])
        return jnp.where(valid[..., None], taken, 0)

    def combine_compact(self, out, slot, weight):
        """Combines (E, capacity, C) expert outputs back to (T, C) tokens."""
        picked = jnp.take(out.reshape(-1, out.shape[-1]), slot.reshape(-1),
                          axis=0).reshape(*slot.shape, out.shape[-1])
        return jnp.sum(picked * weight[..., None].astype(out.dtype), axis=1)

    def apply_experts(self, expert_in):
        """Runs the expert MLPs on (E_local, capacity, C) inputs; weights may
        be a sharded slice under expert parallelism (leading axis E_local)."""
        h = jax.nn.gelu(
            jnp.einsum("ecd,edh->ech", expert_in, self.w1)
            + self.b1[:, None, :], approximate=False)
        return jnp.einsum("ech,ehd->ecd", h, self.w2) + self.b2[:, None, :]

    def __call__(self, x):
        """Dense (single-device) forward on (..., C) inputs.

        Routing is per GROUP — one group per leading-axis element (per sample
        for (B, L, C) / (B, H, W, C) activations), the standard GShard
        grouping: capacity = ceil(cf * Tg * n_selected / E) stays
        proportional to the group's token count.

        Returns:
            (y, aux_loss): y has x's shape; add ``aux_loss`` (scaled by a
            small coefficient, e.g. 0.01) to the training loss to balance
            expert load.
        """
        shape = x.shape
        tokens = (x.reshape(shape[0], -1, shape[-1]) if x.ndim > 2
                  else x[None])  # (G, Tg, C)
        if self.group_size is not None:
            # GShard group-size control: the one-hot dispatch/combine einsums
            # cost O(cf * Tg^2 * C) per group — LINEAR in the group size at a
            # fixed total token count — so smaller groups cut routing compute
            # proportionally (at slightly higher drop variance under load
            # imbalance). Profiled on v5e (PERF.md "MoE routing"): Tg 784 ->
            # 98 takes the dense-ratio from 0.53 to ~0.8 at identical active
            # FLOPs. Groups stay within a sample (L % group_size == 0), so
            # capacity pressure never couples samples.
            total = tokens.shape[0] * tokens.shape[1]
            assert tokens.shape[1] % self.group_size == 0, (
                f"group_size {self.group_size} must divide the per-sample "
                f"token count {tokens.shape[1]}")
            tokens = tokens.reshape(total // self.group_size,
                                    self.group_size, shape[-1])
        capacity = capacity_for(tokens.shape[1] * self.n_selected,
                                self.n_experts, self.capacity_factor)

        import os
        if os.environ.get("PGT_MOE_ROUTING", "einsum") == "compact":
            def one_group(t):
                src, valid, slot, weight, aux = self.route_compact(t,
                                                                   capacity)
                out = self.apply_experts(self.dispatch_compact(t, src, valid))
                return self.combine_compact(out, slot, weight), aux

            y, aux_loss = jax.vmap(one_group)(tokens)
            return y.reshape(shape), aux_loss.mean()

        # Default: one-hot einsum dispatch/combine (2x faster end-to-end on
        # v5e at bench shapes — module docstring has the measurements).
        dispatch, combine, aux_loss = jax.vmap(
            lambda t: self.route_onehot(t, capacity))(tokens)
        expert_in = jnp.einsum("gtec,gtd->gecd",
                               dispatch.astype(tokens.dtype), tokens)
        out = jax.vmap(self.apply_experts)(expert_in)
        y = jnp.einsum("gtec,gecd->gtd", combine.astype(out.dtype), out)
        return y.reshape(shape), aux_loss.mean()
