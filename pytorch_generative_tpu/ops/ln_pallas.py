"""Channel LayerNorm as Pallas TPU kernels (fwd + bwd custom VJP).

Not a FLOPs play — a *layout* play. At batch >= 128, XLA's layout assignment
vectorizes the LN channel reduces by making the residual stream batch-minor
({0,2,1} on (N, L, C)), then pays synchronous layout-conversion copies at
every boundary with the attention custom calls, which require default
layouts (profile: tools/profile_train_step.py at BS=512; the copies +
re-laid-out reduce fusions cost ~17 ms/step of the 155 ms step). A Pallas LN
pins default layouts on both sides, so the whole transformer middle agrees
on {2,1,0} and the copies disappear; as a bonus it is single-pass (XLA's LN
composition reads x in three reduce fusions).

Forward: one pass over row blocks, statistics in f32, nothing but y written.
Backward: the recompute pattern of ops/mlp_pallas.py — re-derive xhat/inv
from x (VPU-only), produce dx for the block's rows, and accumulate
dgamma/dbeta into sublane-replicated (8, C) f32 VMEM-revisited tiles.

Replaces the reference's NCHWLayerNorm compute
(/root/reference/pytorch_generative/nn/convolution.py:69-75) on the TPU
path; numerics match the jnp composition to float tolerance (stats ride in
f32), tested value+grad in tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats(xf, eps):
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (xf - mu) * inv, inv


def _fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    xhat, _ = _stats(xf, eps)
    o_ref[...] = (xhat * g_ref[0].astype(jnp.float32)
                  + b_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, g_ref, dx_ref, dg_ref, db_ref, *, eps):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dg_ref[...] = jnp.zeros(dg_ref.shape, dg_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    xf = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    xhat, inv = _stats(xf, eps)
    dg_ref[...] += jnp.broadcast_to(
        jnp.sum(dy * xhat, axis=0, keepdims=True), dg_ref.shape)
    db_ref[...] += jnp.broadcast_to(
        jnp.sum(dy, axis=0, keepdims=True), db_ref.shape)
    dxhat = dy * g_ref[0].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ref[...] = ((dxhat - m1 - xhat * m2) * inv).astype(dx_ref.dtype)


def _pick_rows(r: int, c: int, budget: int = 48 * 1024 * 1024):
    """Largest multiple-of-8 row block <= 2048 dividing r that fits VMEM
    (~4 live (rows, C) f32 tiles: x, dy/xhat, dxhat, dx)."""
    per_row = 4 * c * 4
    cap = min(2048, max(budget // per_row, 8))
    for b in range(min(r, cap) - min(r, cap) % 8, 7, -8):
        if r % b == 0:
            return b
    return 0  # no divisor: caller pads


def _vec2(v):
    return v.astype(jnp.float32).reshape(1, -1)


def _pad_rows(arrs, r):
    pad = -r % 8
    return [jnp.pad(a, ((0, pad), (0, 0))) for a in arrs], r + pad


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_fwd(x2, gamma, beta, eps, interpret):
    r, c = x2.shape
    rows = _pick_rows(r, c)
    if rows == 0:
        (x2,), r_run = _pad_rows([x2], r)
        rows = _pick_rows(r_run, c)
    else:
        r_run = r
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(r_run // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r_run, c), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x2, _vec2(gamma), _vec2(beta))
    return out[:r]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_bwd(x2, dy2, gamma, eps, interpret):
    r, c = x2.shape
    rows = _pick_rows(r, c)
    if rows == 0:
        (x2, dy2), r_run = _pad_rows([x2, dy2], r)
        rows = _pick_rows(r_run, c)
    else:
        r_run = r
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(r_run // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            # Constant index maps: VMEM-resident f32 accumulators.
            pl.BlockSpec((8, c), lambda i: (0, 0)),
            pl.BlockSpec((8, c), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_run, c), x2.dtype),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x2, dy2, _vec2(gamma))
    return dx[:r], dg[0], db[0]


_INTERPRET = False  # Flipped by tests to run the kernels on CPU.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def channel_layernorm(x, gamma, beta, eps=1e-5):
    """LayerNorm over the last axis of ``x``, fused single-pass on TPU.

    Args:
        x: (..., C) activations (leading dims flattened to rows).
        gamma/beta: (C,) scale/offset.
        eps: epsilon (static).
    """
    shape = x.shape
    return _ln_fwd(x.reshape(-1, shape[-1]), gamma, beta, eps,
                   _INTERPRET).reshape(shape)


def _vjp_fwd(x, gamma, beta, eps):
    return channel_layernorm(x, gamma, beta, eps), (x, gamma)


def _vjp_bwd(eps, res, g):
    x, gamma = res
    shape = x.shape
    dx, dg, db = _ln_bwd(x.reshape(-1, shape[-1]), g.reshape(-1, shape[-1]),
                         gamma, eps, _INTERPRET)
    return dx.reshape(shape), dg.astype(gamma.dtype), db.astype(gamma.dtype)


channel_layernorm.defvjp(_vjp_fwd, _vjp_bwd)
