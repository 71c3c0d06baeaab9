"""Ring attention: causal attention with the sequence sharded across devices.

Sequence parallelism the TPU-native way: each device holds one shard of the
pixel sequence (queries stay local), and the K/V shards rotate around the ICI
ring via ``ppermute`` while an online softmax accumulates partial results — the
same blockwise math as the flash kernel (ops/attention_pallas.py), lifted one
level up so the "blocks" are whole devices. Per-device memory is O(L_local^2)
at most and the full (L, L) attention matrix never exists anywhere.

The reference has no sequence parallelism (its max sequence is 1024 pixels,
SURVEY.md section 2.8); this extends the same attention semantics (including
``mask_center``) to sequences larger than one chip's memory.

Usage (inside shard_map over a mesh axis holding the sequence):

    out = ring_causal_attention(q, k, v, axis_name="seq")

or use :func:`ring_attention_sharded` to wrap the shard_map for you.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def ring_causal_attention(q, k, v, mask_center: bool = False,
                          axis_name: str = "seq"):
    """Causal attention over sequence-sharded (N, H, L_local, d) operands.

    Must run inside shard_map/pmap with ``axis_name`` mapping the sequence
    axis; shard i holds global positions [i * L_local, (i+1) * L_local).
    Semantics match ops.attention.causal_attention on the gathered sequence
    (fully masked rows produce exactly 0).
    """
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    n, h, l_loc, d_k = q.shape
    d_v = v.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d_k, q.dtype))
    offset = 1 if mask_center else 0

    q_pos = my_idx * l_loc + jnp.arange(l_loc)

    m_acc = jnp.full((n, h, l_loc), -jnp.inf, jnp.float32)
    l_acc = jnp.zeros((n, h, l_loc), jnp.float32)
    o_acc = jnp.zeros((n, h, l_loc, d_v), jnp.float32)

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    k_cur, v_cur = k, v
    src_idx = my_idx
    for step in range(n_dev):
        k_pos = src_idx * l_loc + jnp.arange(l_loc)
        scores = jnp.einsum("nhqd,nhkd->nhqk", q, k_cur).astype(
            jnp.float32) * scale
        mask = (k_pos[None, :] + offset) <= q_pos[:, None]
        scores = jnp.where(mask, scores, -jnp.inf)

        m_cur = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m_acc, m_cur)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        alpha = jnp.where(jnp.isfinite(m_acc), jnp.exp(m_acc - m_safe), 0.0)
        p = jnp.where(mask, jnp.exp(scores - m_safe[..., None]), 0.0)

        l_acc = alpha * l_acc + jnp.sum(p, axis=-1)
        o_acc = (o_acc * alpha[..., None]
                 + jnp.einsum("nhqk,nhkd->nhqd", p,
                              v_cur.astype(jnp.float32)))
        m_acc = m_new

        if step < n_dev - 1:
            k_cur, v_cur = jax.lax.ppermute((k_cur, v_cur), axis_name, perm)
            src_idx = (src_idx - 1) % n_dev

    out = o_acc / jnp.where(l_acc == 0.0, 1.0, l_acc)[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh: Mesh, mask_center: bool = False,
                           axis_name: str = "seq"):
    """Applies ring attention with the sequence axis sharded over `mesh`.

    q, k, v: global (N, H, L, d) arrays; L must divide by the mesh axis size.
    """
    spec = P(None, None, axis_name, None)
    fn = functools.partial(ring_causal_attention, mask_center=mask_center,
                           axis_name=axis_name)
    return jax.shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)
