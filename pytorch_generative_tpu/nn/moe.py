"""Sparsely-gated Mixture-of-Experts layer (Switch-style top-1 routing).

The reference framework has no MoE (SURVEY.md section 2.8 lists only DDP data
parallelism); this layer and its expert-parallel execution path
(parallel/ep.py) extend the parallelism portfolio to dp/tp/sp/pp/ep — the full
set of shardings a production TPU stack ships.

TPU-native construction: routing is expressed entirely as static-shape one-hot
einsums (the GShard/Switch dispatch-combine formulation), so the whole layer is
three batched matmuls on the MXU plus elementwise gating — no gather/scatter,
no dynamic shapes, nothing XLA cannot tile. Tokens beyond an expert's capacity
are dropped (their contribution is zero; the surrounding residual connection
carries them through), which keeps every shape static under jit.

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
    """Top-1 (Switch) mixture of E expert MLPs over the feature axis.

    Each expert is a two-layer GELU MLP (C -> hidden -> C) whose weights are
    stacked on a leading expert axis, so the forward pass is batched matmuls
    of shape (E, capacity, *) — MXU-friendly and, under expert parallelism,
    shardable on the expert axis with two ``all_to_all`` collectives
    (parallel/ep.py).
    """

    gate: Linear
    w1: jax.Array  # (E, C, hidden)
    b1: jax.Array  # (E, hidden)
    w2: jax.Array  # (E, hidden, C)
    b2: jax.Array  # (E, C)
    n_experts: int = core.static_field()
    capacity_factor: float = core.static_field()

    def __init__(self, key, n_channels: int, hidden_channels: int,
                 n_experts: int, capacity_factor: float = 2.0):
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

    # --- Routing (shared by the dense path and parallel/ep.py). ---

    def route(self, tokens, capacity: int):
        """Computes the Switch dispatch/combine tensors for (T, C) tokens.

        Returns:
            dispatch: (T, E, capacity) 0/1 — token t occupies slot c of
                expert e. Tokens routed past ``capacity`` are dropped
                (all-zero rows).
            combine: (T, E, capacity) — dispatch scaled by the router
                probability of the chosen expert.
            aux_loss: Switch load-balancing loss
                E * sum_e(fraction_routed_e * mean_prob_e); 1.0 at uniform.
        """
        e = self.n_experts
        logits = self.gate(tokens)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        expert_idx = jnp.argmax(probs, axis=-1)
        gate_val = jnp.max(probs, axis=-1)

        onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.float32)  # (T, E)
        # 0-based arrival order of each token within its expert's queue.
        position = jnp.cumsum(onehot, axis=0) * onehot - onehot
        kept = onehot * (position < capacity)
        slot = jax.nn.one_hot(position.sum(-1).astype(jnp.int32), capacity,
                              dtype=jnp.float32)
        dispatch = kept[:, :, None] * slot[:, None, :]

        frac_routed = jnp.mean(onehot, axis=0)
        mean_prob = jnp.mean(probs, axis=0)
        aux_loss = e * jnp.sum(frac_routed * mean_prob)
        combine = dispatch * gate_val[:, None, None]
        return dispatch.astype(tokens.dtype), combine.astype(tokens.dtype), \
            aux_loss

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
        grouping. This keeps the dispatch/combine tensors at
        (G, Tg, E, capacity) with capacity = cf * Tg / E: a GLOBAL route over
        all B*L tokens would make them (T, E, cf*T/E) — quadratic in token
        count (measured 12x slower than the dense MLP at ImageGPT bench
        shapes before XLA even finishes rescuing the memory).

        Returns:
            (y, aux_loss): y has x's shape; add ``aux_loss`` (scaled by a
            small coefficient, e.g. 0.01) to the training loss to balance
            expert load.
        """
        shape = x.shape
        tokens = (x.reshape(shape[0], -1, shape[-1]) if x.ndim > 2
                  else x[None])  # (G, Tg, C)
        capacity = capacity_for(tokens.shape[1], self.n_experts,
                                self.capacity_factor)
        dispatch, combine, aux_loss = jax.vmap(
            lambda t: self.route(t, capacity))(tokens)
        expert_in = jnp.einsum("gtec,gtd->gecd", dispatch, tokens)
        out = jax.vmap(self.apply_experts)(expert_in)
        y = jnp.einsum("gtec,gecd->gtd", combine, out)
        return y.reshape(shape), aux_loss.mean()
