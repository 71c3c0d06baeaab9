"""Fused flash-style causal attention as Pallas TPU kernels (fwd + bwd).

Replaces the O(L^2)-HBM masked attention at
/root/reference/pytorch_generative/nn/attention.py:120-161 with blockwise
online-softmax kernels: the (L, L) attention matrix only ever exists as a
(BQ, BK) tile in VMEM, fused with the running softmax and the value matmul
(MXU). On TPU this removes the dominant HBM traffic of the XLA attention path
(the materialized probability matrix is read/written several times in both
directions).

Semantics match ops/attention.py exactly, including ``mask_center`` (fully
masked rows produce exactly 0 in the forward and contribute no gradient).
The backward pass is the standard flash-attention recomputation: the forward
saves per-row logsumexp stats; dQ and dK/dV are produced by two kernels that
rebuild each probability tile in VMEM. Numerical equivalence of values AND
gradients with the jnp reference is tested in tests/test_kernels.py.

The kernels are blockwise so a shard_map ring (sequence parallelism) can reuse
them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
_NEG_INF = float("-inf")


def _blocks(l: int, block_q: int, block_k: int):
    block = max(block_q, block_k)
    l_pad = -(-l // block) * block
    return l_pad


def _causal_mask_tile(qi, ki, block_q, block_k, offset):
    row_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)
    col_ids = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    return col_ids + offset <= row_ids


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_q, block_k,
                mask_center, scale):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    offset = 1 if mask_center else 0
    n_k_blocks = jax.lax.div(qi * block_q + block_q - 1, block_k) + 1

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        mask = _causal_mask_tile(qi, ki, block_q, block_k, offset)
        scores = jnp.where(mask, scores, _NEG_INF)

        m_cur = jnp.max(scores, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
        p = jnp.where(mask, jnp.exp(scores - m_safe[:, None]), 0.0)

        l_new = alpha * l_prev + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((block_q, v_ref.shape[-1]), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_k_blocks, body, (m0, l0, acc0))

    # Fully-masked rows (l == 0) output exactly 0 (reference NaN-row behavior,
    # nn/attention.py:154-157); their lse stays -inf so backward zeroes them.
    out = acc / jnp.where(l == 0.0, 1.0, l)[:, None]
    o_ref[0] = out.astype(o_ref.dtype)
    lse = jnp.where(l == 0.0, _NEG_INF, m + jnp.log(jnp.maximum(l, 1e-38)))
    # Stats live sublane-replicated ((8, block_q) tiles) to satisfy TPU tiling.
    lse_ref[0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0])).astype(
        jnp.float32)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
                   block_q, block_k, mask_center, scale):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, :].astype(jnp.float32)
    delta = delta_ref[0, 0, :].astype(jnp.float32)
    offset = 1 if mask_center else 0
    # Column-ize (f32) before the bool ops: Mosaic only supports minor-dim
    # insertion as a no-op for 32-bit types.
    lse_col = lse[:, None]
    finite = jnp.isfinite(lse_col)
    lse_safe = jnp.where(finite, lse_col, 0.0)
    n_k_blocks = jax.lax.div(qi * block_q + block_q - 1, block_k) + 1

    def body(ki, dq):
        k = k_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        mask = _causal_mask_tile(qi, ki, block_q, block_k, offset)
        p = jnp.where(mask & finite, jnp.exp(scores - lse_safe), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dq0 = jnp.zeros((block_q, q_ref.shape[-1]), jnp.float32)
    dq = jax.lax.fori_loop(0, n_k_blocks, body, dq0)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref,
                    dv_ref, *, block_q, block_k, mask_center, scale,
                    n_q_blocks):
    ki = pl.program_id(1)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    offset = 1 if mask_center else 0
    # q blocks before this k block contribute nothing (causality).
    first_q = jax.lax.div(ki * block_k, block_q)

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)].astype(jnp.float32)
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)].astype(
            jnp.float32)
        lse_col = lse[:, None]
        finite = jnp.isfinite(lse_col)
        lse_safe = jnp.where(finite, lse_col, 0.0)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        mask = _causal_mask_tile(qi, ki, block_q, block_k, offset)
        p = jnp.where(mask & finite, jnp.exp(scores - lse_safe), 0.0)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        return dk, dv

    dk0 = jnp.zeros((block_k, k_ref.shape[-1]), jnp.float32)
    dv0 = jnp.zeros((block_k, v_ref.shape[-1]), jnp.float32)
    dk, dv = jax.lax.fori_loop(first_q, n_q_blocks, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_blocks(l, block_q, block_k):
    cap = max(128, 1 << (max(l - 1, 1)).bit_length())
    return min(block_q, cap), min(block_k, cap)


@functools.partial(jax.jit, static_argnames=("mask_center", "block_q",
                                             "block_k", "interpret"))
def _flash_forward(q, k, v, mask_center, block_q, block_k, interpret):
    n, h, l, d_k = q.shape
    d_v = v.shape[-1]
    scale = 1.0 / (d_k ** 0.5)
    block_q, block_k = _pick_blocks(l, block_q, block_k)
    l_pad = _blocks(l, block_q, block_k)

    qf = _pad_to(q.reshape(n * h, l, d_k), l_pad, 1)
    kf = _pad_to(k.reshape(n * h, l, d_k), l_pad, 1)
    vf = _pad_to(v.reshape(n * h, l, d_v), l_pad, 1)

    kernel = functools.partial(_fwd_kernel, block_q=block_q, block_k=block_k,
                               mask_center=mask_center, scale=scale)
    out, lse = pl.pallas_call(
        kernel,
        grid=(n * h, l_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d_v), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_v), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n * h, l_pad, d_v), q.dtype),
            jax.ShapeDtypeStruct((n * h, 8, l_pad), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :l, :].reshape(n, h, l, d_v), lse


@functools.partial(jax.jit, static_argnames=("mask_center", "block_q",
                                             "block_k", "interpret"))
def _flash_backward(q, k, v, out, lse, g, mask_center, block_q, block_k,
                    interpret):
    n, h, l, d_k = q.shape
    d_v = v.shape[-1]
    scale = 1.0 / (d_k ** 0.5)
    block_q, block_k = _pick_blocks(l, block_q, block_k)
    l_pad = _blocks(l, block_q, block_k)

    qf = _pad_to(q.reshape(n * h, l, d_k), l_pad, 1)
    kf = _pad_to(k.reshape(n * h, l, d_k), l_pad, 1)
    vf = _pad_to(v.reshape(n * h, l, d_v), l_pad, 1)
    dof = _pad_to(g.reshape(n * h, l, d_v), l_pad, 1)
    # lse is (n*h, 8, l_pad) sublane-replicated from the forward; padded rows
    # carry lse = -inf so they contribute nothing.
    lse_f = lse
    delta = jnp.sum(dof * _pad_to(out.reshape(n * h, l, d_v), l_pad, 1),
                    axis=-1)
    delta = jnp.broadcast_to(delta[:, None, :], (n * h, 8, l_pad))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_q=block_q, block_k=block_k,
                          mask_center=mask_center, scale=scale),
        grid=(n * h, l_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d_v), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_v), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_k), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * h, l_pad, d_k), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, dof, lse_f, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, block_q=block_q, block_k=block_k,
                          mask_center=mask_center, scale=scale,
                          n_q_blocks=l_pad // block_q),
        grid=(n * h, l_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, l_pad, d_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_v), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d_v), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, l_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, l_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d_k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_v), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n * h, l_pad, d_k), q.dtype),
            jax.ShapeDtypeStruct((n * h, l_pad, d_v), q.dtype),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lse_f, delta)

    return (dq[:, :l].reshape(n, h, l, d_k),
            dk[:, :l].reshape(n, h, l, d_k),
            dv[:, :l].reshape(n, h, l, d_v))


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

_INTERPRET = False  # Flipped by tests to run the kernels on CPU.


def flash_causal_attention(q, k, v, mask_center: bool = False,
                           block_q: int = DEFAULT_BLOCK_Q,
                           block_k: int = DEFAULT_BLOCK_K,
                           interpret: bool | None = None):
    """Fused causal attention over (N, heads, L, d) tensors (forward only)."""
    if interpret is None:
        interpret = _INTERPRET
    out, _ = _flash_forward(q, k, v, mask_center, block_q, block_k, interpret)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def causal_attention_trainable(q, k, v, mask_center: bool = False):
    """Differentiable fused attention: Pallas forward AND backward kernels."""
    out, _ = _flash_forward(q, k, v, mask_center, DEFAULT_BLOCK_Q,
                            DEFAULT_BLOCK_K, _INTERPRET)
    return out


def _vjp_fwd(q, k, v, mask_center):
    out, lse = _flash_forward(q, k, v, mask_center, DEFAULT_BLOCK_Q,
                              DEFAULT_BLOCK_K, _INTERPRET)
    return out, (q, k, v, out, lse)


def _vjp_bwd(mask_center, residuals, g):
    q, k, v, out, lse = residuals
    return _flash_backward(q, k, v, out, lse, g, mask_center, DEFAULT_BLOCK_Q,
                           DEFAULT_BLOCK_K, _INTERPRET)


causal_attention_trainable.defvjp(_vjp_fwd, _vjp_bwd)
