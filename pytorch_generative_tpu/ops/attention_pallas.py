"""Fused flash-style causal attention as a Pallas TPU kernel.

Replaces the O(L^2)-memory masked attention at
/root/reference/pytorch_generative/nn/attention.py:120-161 with a blockwise
online-softmax kernel: the (L, L) attention matrix is never materialized in HBM
— each (BQ, BK) score tile lives only in VMEM, fused with the running softmax
and the value matmul (MXU). Semantics match ops/attention.py exactly, including
``mask_center`` (fully-masked rows produce exactly 0).

The kernel is blockwise so a future shard_map ring (sequence parallelism) can
reuse it. Training uses a custom VJP whose backward is the jnp reference
implementation (XLA-generated gradient); the fused kernel accelerates the
forward/inference path. Numerical equivalence with the jnp reference is tested
in tests/test_kernels.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_generative_tpu.ops import attention as attn_ref

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
_NEG_INF = float("-inf")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_q, block_k, seq_len,
                  mask_center, scale):
    """One (batch*head, q-block) grid cell: online softmax over causal k-blocks."""
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # (block_q, d_k)

    q_start = qi * block_q
    # Only k-blocks with start <= last query index can contribute (causality).
    n_k_blocks = jax.lax.div(q_start + block_q - 1, block_k) + 1

    row_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    offset = 1 if mask_center else 0

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        col_ids = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        mask = col_ids + offset <= row_ids
        scores = jnp.where(mask, scores, _NEG_INF)

        m_cur = jnp.max(scores, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        # Guard fully-masked rows: exp(-inf - -inf) would be NaN.
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
    _, l, acc = jax.lax.fori_loop(0, n_k_blocks, body, (m0, l0, acc0))

    # Fully-masked rows (l == 0) output exactly 0, matching the reference's
    # NaN-row-to-zero behavior (nn/attention.py:154-157).
    out = acc / jnp.where(l == 0.0, 1.0, l)[:, None]
    o_ref[0] = out.astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("mask_center", "block_q",
                                             "block_k", "interpret"))
def flash_causal_attention(q, k, v, mask_center: bool = False,
                           block_q: int = DEFAULT_BLOCK_Q,
                           block_k: int = DEFAULT_BLOCK_K,
                           interpret: bool = False):
    """Fused causal attention over (N, heads, L, d) tensors (forward only).

    Padded internally to block multiples; padded key columns fall outside the
    causal mask, and padded query rows are sliced off.
    """
    n, h, l, d_k = q.shape
    d_v = v.shape[-1]
    scale = 1.0 / (d_k ** 0.5)

    block_q = min(block_q, max(128, 1 << (l - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (l - 1).bit_length()))
    l_pad = -(-l // max(block_q, block_k)) * max(block_q, block_k)

    qf = _pad_to(q.reshape(n * h, l, d_k), l_pad, 1)
    kf = _pad_to(k.reshape(n * h, l, d_k), l_pad, 1)
    vf = _pad_to(v.reshape(n * h, l, d_v), l_pad, 1)

    grid = (n * h, l_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, seq_len=l,
        mask_center=mask_center, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, d_v), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_v), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * h, l_pad, d_v), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    return out[:, :l, :].reshape(n, h, l, d_v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def causal_attention_trainable(q, k, v, mask_center: bool = False):
    """Differentiable wrapper: Pallas forward, XLA-reference backward."""
    return flash_causal_attention(q, k, v, mask_center=mask_center)


def _fwd(q, k, v, mask_center):
    return flash_causal_attention(q, k, v, mask_center=mask_center), (q, k, v)


def _bwd(mask_center, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q, k, v: attn_ref.causal_attention(q, k, v, mask_center), q, k, v)
    return vjp(g)


causal_attention_trainable.defvjp(_fwd, _bwd)
