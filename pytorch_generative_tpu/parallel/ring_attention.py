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


# ---------------------------------------------------------------------------
# Flash-kernel ring: each ring step IS a Pallas kernel call (fwd AND bwd).
#
# The per-device work per step is one fused flash tile-pass over (L_local q x
# L_local kv) — the diagonal step runs the causal kernel, cross-shard past
# steps run the kernel's non-causal mode, and future steps are skipped under
# ``lax.cond`` (real compute skipping, not masking). Per-step partials merge
# with the standard logsumexp-weighted online combine, so the math equals
# single-device flash attention exactly. The backward rotates each query
# shard's (q, dout, out, lse) bundle around the ring while k/v stay resident,
# accumulating dq on the moving bundle and dk/dv locally — the mirror image
# of the forward's rotating k/v.
# ---------------------------------------------------------------------------


def _expand_stats(w, d_per_head):
    """(N, H, L) per-head row stats -> (N, L, H*d) packed feature layout."""
    return jnp.repeat(w.transpose(0, 2, 1), d_per_head, axis=-1)


def _merge_partial(acc, o_i, lse_i, d_v):
    """Online-softmax merge of one ring step's normalized partial output.

    acc = (o_acc, m_acc, s_acc): running packed output scaled relative to
    exp(m_acc), the running row max of the per-step lses, and the running
    normalizer sum (also relative to exp(m_acc)).
    """
    o_acc, m_acc, s_acc = acc
    m_new = jnp.maximum(m_acc, lse_i)
    safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    a = jnp.where(jnp.isfinite(m_acc), jnp.exp(m_acc - safe), 0.0)
    b = jnp.where(jnp.isfinite(lse_i), jnp.exp(lse_i - safe), 0.0)
    s_new = s_acc * a + b
    o_new = (o_acc * _expand_stats(a, d_v)
             + o_i.astype(jnp.float32) * _expand_stats(b, d_v))
    return o_new, m_new, s_new


def _ring_fwd_impl(q, k, v, mask_center, n_heads, axis_name):
    from pytorch_generative_tpu.ops import attention_pallas as ap

    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    n, l_loc, f_k = q.shape
    d_v = v.shape[-1] // n_heads
    interpret = ap._INTERPRET

    def kernel_step(causal):
        def run(k_cur, v_cur):
            o, lse = ap._flash_forward(
                q, k_cur, v_cur, n_heads, mask_center and causal,
                ap.DEFAULT_BLOCK_Q, ap.DEFAULT_BLOCK_K, interpret,
                causal=causal)
            # Stats come back lane-replicated (N, H, l_pad, 128); one column
            # is the per-row lse.
            return o.astype(jnp.float32), lse[:, :, :l_loc, 0]
        return run

    def skip_step(k_cur, v_cur):
        return (jnp.zeros((n, l_loc, n_heads * d_v), jnp.float32),
                jnp.full((n, n_heads, l_loc), -jnp.inf, jnp.float32))

    acc = (jnp.zeros((n, l_loc, n_heads * d_v), jnp.float32),
           jnp.full((n, n_heads, l_loc), -jnp.inf, jnp.float32),
           jnp.zeros((n, n_heads, l_loc), jnp.float32))
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    k_cur, v_cur = k, v
    src = my_idx
    for step in range(n_dev):
        o_i, lse_i = jax.lax.cond(
            src == my_idx, kernel_step(True),
            lambda kc, vc: jax.lax.cond(src < my_idx, kernel_step(False),
                                        skip_step, kc, vc),
            k_cur, v_cur)
        acc = _merge_partial(acc, o_i, lse_i, d_v)
        if step < n_dev - 1:
            k_cur, v_cur = jax.lax.ppermute((k_cur, v_cur), axis_name, perm)
            src = (src - 1) % n_dev
    o_acc, m_acc, s_acc = acc
    out = o_acc / _expand_stats(jnp.where(s_acc == 0.0, 1.0, s_acc), d_v)
    lse_glob = jnp.where(s_acc > 0.0, m_acc + jnp.log(jnp.maximum(s_acc,
                                                                  1e-38)),
                         -jnp.inf)
    return out.astype(q.dtype), lse_glob


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ring_flash_attention_packed(q, k, v, mask_center: bool, n_heads: int,
                                axis_name: str = "seq"):
    """Differentiable flash-kernel ring attention over packed shards.

    q, k, v: (N, L_local, heads*d) — the local sequence shard in the packed
    layout of ops/attention_pallas.py. Must run inside shard_map with
    ``axis_name`` mapping the sequence axis (shard i holds global positions
    [i*L_local, (i+1)*L_local)). Semantics match causal_attention_packed on
    the gathered sequence, values and gradients.
    """
    out, _ = _ring_fwd_impl(q, k, v, mask_center, n_heads, axis_name)
    return out


def _ring_vjp_fwd(q, k, v, mask_center, n_heads, axis_name):
    out, lse_glob = _ring_fwd_impl(q, k, v, mask_center, n_heads, axis_name)
    return out, (q, k, v, out, lse_glob)


def _ring_vjp_bwd(mask_center, n_heads, axis_name, residuals, g):
    from pytorch_generative_tpu.ops import attention_pallas as ap

    q, k, v, out, lse_glob = residuals
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    n, l_loc, f_k = q.shape
    interpret = ap._INTERPRET
    # Rotate the query-side bundle the opposite way (i receives from i+1), so
    # at step s this device holds shard (my + s) % n_dev's bundle while its
    # own k/v stay resident.
    perm_back = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def kernel_step(causal):
        def run(bundle):
            q_r, do_r, out_r, lse_r, _ = bundle
            lse_packed = jnp.broadcast_to(
                lse_r[..., None], (*lse_r.shape, 128))
            return ap._flash_backward(
                q_r, k, v, out_r, lse_packed, do_r, n_heads,
                mask_center and causal, ap.DEFAULT_BLOCK_Q,
                ap.DEFAULT_BLOCK_K, interpret, causal=causal)
        return run

    def skip_step(bundle):
        return (jnp.zeros_like(q), jnp.zeros_like(k), jnp.zeros_like(v))

    bundle = (q, g, out, lse_glob, jnp.zeros(q.shape, jnp.float32))
    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)
    src = my_idx
    for step in range(n_dev):
        # Pair (q from src) x (k/v local): contributes iff src >= my (the
        # query shard is at or after the kv shard); diagonal is causal.
        dq_c, dk_c, dv_c = jax.lax.cond(
            src == my_idx, kernel_step(True),
            lambda b: jax.lax.cond(src > my_idx, kernel_step(False),
                                   skip_step, b),
            bundle)
        dk_acc = dk_acc + dk_c.astype(jnp.float32)
        dv_acc = dv_acc + dv_c.astype(jnp.float32)
        bundle = (*bundle[:4], bundle[4] + dq_c.astype(jnp.float32))
        bundle = jax.lax.ppermute(bundle, axis_name, perm_back)
        src = (src + 1) % n_dev
    # After n_dev rotations the bundle (and its accumulated dq) is home.
    dq = bundle[4]
    return dq.astype(q.dtype), dk_acc.astype(k.dtype), dv_acc.astype(v.dtype)


ring_flash_attention_packed.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_flash_attention_sharded(q, k, v, mesh: Mesh,
                                 mask_center: bool = False,
                                 axis_name: str = "seq"):
    """Flash-kernel ring attention over global (N, H, L, d) arrays.

    L must divide by the mesh axis size. Values AND gradients match
    single-device attention on the gathered sequence.
    """
    n, h, l, d = q.shape
    pack = lambda t: t.transpose(0, 2, 1, 3).reshape(n, l, -1)
    spec = P(None, axis_name, None)
    out = jax.shard_map(
        lambda a, b, c: ring_flash_attention_packed(a, b, c, mask_center, h,
                                                    axis_name),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)(pack(q), pack(k), pack(v))
    return out.reshape(n, l, h, -1).transpose(0, 2, 1, 3)
