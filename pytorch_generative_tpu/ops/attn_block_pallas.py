"""Fused attention BLOCK kernel: qkv projection + flash attention + output
projection in ONE Pallas call.

Motivation (PERF.md "Where the remaining 47% goes"): at the C=512 production
point the qkv/out projection dots live in XLA's generic-fusion bucket (20.9%
of the step) where layout-conversion copies at the custom-call boundaries eat
into their MXU efficiency. Folding them into the flash kernel's prologue and
epilogue runs them as in-kernel MXU matmuls on VMEM-resident operands: the
q/k/v intermediates NEVER round-trip HBM in the forward, and the projection
dots inherit the kernel's layout (no boundary copies).

Structure (grid = (batch, q_blocks), same as ops/attention_pallas.py):
  * at q-step 0 the whole row's projections are computed once into VMEM
    scratch: q = x@Wq + bq, [k|v] = x@Wkv + bkv  (three (L, C)x(C, E) MXU
    matmuls per batch row — identical FLOPs to the XLA path);
  * each grid step runs the standard online-softmax flash tile pass reading
    q/k/v from scratch (math identical to attention_pallas._fwd_kernel);
  * the epilogue projects the attention tile through Wo + bo before writing.
The kernel also emits the pre-Wo attention output and the lse stats — the
residuals the backward needs.

Backward: the flash backward kernel is REUSED unchanged; q/k/v are
recomputed from the saved x with three XLA dots (cheaper than storing them:
the recompute replaces the forward's saved-residual HBM traffic 3x), and the
projection gradients (dWq/dWkv/dWo/dbiases, plus the dx chain) are plain XLA
contractions — they are matmul-dense and fuse well in the backward region.

Reference contract: nn/attention.py::CausalAttention (q from x alone, k/v
from one fused projection, mask_center semantics, NaN-row -> 0), mirroring
/root/reference/pytorch_generative/nn/attention.py:93-161.

Opt-in via PGT_FUSED_ATTN=1 (nn/attention.py) until measured on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_generative_tpu.ops.attention_pallas import (
    DEFAULT_BLOCK_K,
    DEFAULT_BLOCK_Q,
    _blocks,
    _causal_mask_tile,
    _flash_backward,
    _pad_to,
    _pick_blocks_and_limit,
)

_NEG_INF = float("-inf")


def _fwd_block_kernel(x_ref, wq_ref, bq_ref, wkv_ref, bkv_ref, wo_ref,
                      bo_ref, y_ref, attn_ref, lse_ref, q_s, k_s, v_s, *,
                      block_q, block_k, mask_center, scale, n_heads):
    qi = pl.program_id(1)
    e = wq_ref.shape[1]           # n_heads * d_k
    o = wo_ref.shape[0]           # n_heads * d_v
    cdt = x_ref.dtype

    @pl.when(qi == 0)
    def _project():
        # Whole-row projections into VMEM scratch, once per batch row. The
        # dots accumulate f32 on the MXU and round to the compute dtype,
        # matching the XLA path (Conv2d 1x1 -> dot_general + bias).
        xb = x_ref[0]
        q = jax.lax.dot_general(xb, wq_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        q_s[...] = (q + bq_ref[0].astype(jnp.float32)).astype(cdt)
        kv = jax.lax.dot_general(xb, wkv_ref[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        kv = kv + bkv_ref[0].astype(jnp.float32)
        k_s[...] = kv[:, :e].astype(cdt)
        v_s[...] = kv[:, e:].astype(cdt)

    d_k = e // n_heads
    d_v = o // n_heads
    offset = 1 if mask_center else 0
    n_k_blocks = jax.lax.div(qi * block_q + block_q - 1, block_k) + 1
    q_all = q_s[pl.ds(qi * block_q, block_q), :]

    outs, lses = [], []
    for hd in range(n_heads):
        q = q_all[:, hd * d_k: (hd + 1) * d_k]

        def body(ki, carry):
            m_prev, l_prev, acc = carry
            k = k_s[pl.ds(ki * block_k, block_k),
                    :][:, hd * d_k: (hd + 1) * d_k]
            v = v_s[pl.ds(ki * block_k, block_k),
                    :][:, hd * d_v: (hd + 1) * d_v]
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            mask = _causal_mask_tile(qi, ki, block_q, block_k, offset)
            scores = jnp.where(mask, scores, _NEG_INF)

            m_cur = jnp.max(scores, axis=1)
            m_new = jnp.maximum(m_prev, m_cur)
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            alpha = jnp.where(jnp.isfinite(m_prev),
                              jnp.exp(m_prev - m_safe), 0.0)
            p = jnp.where(mask, jnp.exp(scores - m_safe[:, None]), 0.0)

            l_new = alpha * l_prev + jnp.sum(p, axis=1)
            acc = acc * alpha[:, None] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc

        m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q,), jnp.float32)
        acc0 = jnp.zeros((block_q, d_v), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_k_blocks, body, (m0, l0, acc0))

        # Fully-masked rows output exactly 0 (reference NaN-row behavior).
        outs.append(acc / jnp.where(l == 0.0, 1.0, l)[:, None])
        lse = jnp.where(l == 0.0, _NEG_INF,
                        m + jnp.log(jnp.maximum(l, 1e-38)))
        lses.append(jnp.broadcast_to(lse[:, None], (lse.shape[0], 128)))

    att = jnp.concatenate(outs, axis=-1).astype(cdt)
    attn_ref[0] = att
    lse_ref[0] = jnp.stack(lses, axis=0).astype(jnp.float32)
    # Epilogue: the output projection on the VMEM-resident attention tile.
    y = jax.lax.dot_general(att, wo_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y_ref[0] = (y + bo_ref[0].astype(jnp.float32)).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "mask_center",
                                             "interpret"))
def _fwd_block(x, wq, bq, wkv, bkv, wo, bo, n_heads, mask_center, interpret):
    b, l, c = x.shape
    e = wq.shape[1]
    o = wo.shape[0]
    d_k = e // n_heads
    scale = 1.0 / (d_k ** 0.5)
    isz = x.dtype.itemsize
    # Full-length VMEM residents: the x row, the q/k/v scratch, the weights.
    resident = (l * (c + 2 * e + (o + e)) * isz
                + (c * e + c * (e + o) + o * c) * isz
                + n_heads * l * 128 * 4)
    block_q, block_k, vmem_limit = _pick_blocks_and_limit(
        l, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, n_heads, resident)
    l_pad = _blocks(l, block_q, block_k)
    xf = _pad_to(x, l_pad, 1)
    row2 = lambda t: t.reshape(1, -1)

    kernel = functools.partial(
        _fwd_block_kernel, block_q=block_q, block_k=block_k,
        mask_center=mask_center, scale=scale, n_heads=n_heads)
    y, attn, lse = pl.pallas_call(
        kernel,
        grid=(b, l_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, l_pad, c), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, e), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, e + o), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e + o), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, c), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, o), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, block_q, 128), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l_pad, c), x.dtype),
            jax.ShapeDtypeStruct((b, l_pad, o), x.dtype),
            jax.ShapeDtypeStruct((b, n_heads, l_pad, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((l_pad, e), x.dtype),
            pltpu.VMEM((l_pad, e), x.dtype),
            pltpu.VMEM((l_pad, o), x.dtype),
        ],
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
                         if vmem_limit else None),
        interpret=interpret,
    )(xf, wq, row2(bq), wkv, row2(bkv), wo, row2(bo))
    return y[:, :l], attn[:, :l], lse


_INTERPRET = False  # Flipped by tests to run the kernel on CPU.


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def attention_block_packed(x, wq, bq, wkv, bkv, wo, bo, mask_center: bool,
                           n_heads: int):
    """``out_proj(flash_attention(q_proj(x), kv_proj(x)))`` in one kernel.

    x: (B, L, C); wq (C, E), wkv (C, E+O), wo (O, C) with packed head-major
    feature order; biases 1-D. Semantics match nn.CausalAttention's flash
    path exactly (same tile math, same NaN-row -> 0 contract).
    """
    y, _, _ = _fwd_block(x, wq, bq, wkv, bkv, wo, bo, n_heads, mask_center,
                         _INTERPRET)
    return y


def _vjp_fwd(x, wq, bq, wkv, bkv, wo, bo, mask_center, n_heads):
    y, attn, lse = _fwd_block(x, wq, bq, wkv, bkv, wo, bo, n_heads,
                              mask_center, _INTERPRET)
    return y, (x, attn, lse, wq, bq, wkv, bkv, wo)


def _vjp_bwd(mask_center, n_heads, res, gy):
    x, attn, lse, wq, bq, wkv, bkv, wo = res
    e = wq.shape[1]
    f32 = jnp.float32

    # Output projection gradients (attn saved from the forward kernel).
    dwo = jax.lax.dot_general(attn, gy, (((0, 1), (0, 1)), ((), ())),
                              preferred_element_type=f32).astype(wo.dtype)
    dbo = jnp.sum(gy.astype(f32), axis=(0, 1)).astype(gy.dtype)
    dattn = jax.lax.dot_general(gy, wo, (((2,), (1,)), ((), ())))

    # Recompute q/k/v from x (3 dots — cheaper than saving 3 HBM residuals).
    q = (jax.lax.dot_general(x, wq, (((2,), (0,)), ((), ())) )
         + bq.astype(x.dtype))
    kv = (jax.lax.dot_general(x, wkv, (((2,), (0,)), ((), ())))
          + bkv.astype(x.dtype))
    k, v = kv[..., :e], kv[..., e:]

    dq, dk, dv = _flash_backward(q, k, v, attn, lse, dattn, n_heads,
                                 mask_center, DEFAULT_BLOCK_Q,
                                 DEFAULT_BLOCK_K, _INTERPRET)
    dkv = jnp.concatenate([dk, dv], axis=-1)

    dwq = jax.lax.dot_general(x, dq, (((0, 1), (0, 1)), ((), ())),
                              preferred_element_type=f32).astype(wq.dtype)
    dbq = jnp.sum(dq.astype(f32), axis=(0, 1)).astype(bq.dtype)
    dwkv = jax.lax.dot_general(x, dkv, (((0, 1), (0, 1)), ((), ())),
                               preferred_element_type=f32).astype(wkv.dtype)
    dbkv = jnp.sum(dkv.astype(f32), axis=(0, 1)).astype(bkv.dtype)
    dx = (jax.lax.dot_general(dq, wq, (((2,), (1,)), ((), ())))
          + jax.lax.dot_general(dkv, wkv, (((2,), (1,)), ((), ()))))
    return dx.astype(x.dtype), dwq, dbq, dwkv, dbkv, dwo, dbo


attention_block_packed.defvjp(_vjp_fwd, _vjp_bwd)
