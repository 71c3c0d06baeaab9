"""Fused LayerNorm + GELU-MLP + residual as Pallas TPU kernels (fwd + bwd).

The transformer block's second half — ``x + mlp_conv2(gelu(mlp_conv1(ln2(x))))``
(reference: /root/reference/pytorch_generative/models/autoregressive/image_gpt.py:60-66)
— is position-wise, so XLA materializes every intermediate in HBM: the
(R, 4C) pre-activation AND its GELU (saved for backward), the (R, 4C) GELU
gradient, two weight-grad matmuls, and four LayerNorm reduce fusions. At
C=512 those fusions cost ~4.5 ms/step more than their matmul FLOPs
(profile: tools/profile_train_step.py).

These kernels run the whole sub-block as two Pallas calls:

- forward: one pass over row blocks — LN statistics in f32, both matmuls on
  the MXU (bf16 operands / f32 accumulation for bf16 inputs), exact GELU via
  an in-kernel erf (Mosaic has no erf lowering), residual added in f32.
  Nothing but the block output ever touches HBM.
- backward: the flash pattern — each row block *recomputes* LN and the
  pre-activation from the saved input (nothing else is saved), then produces
  dx for its rows and accumulates dW1/dW2/db1/db2/dgamma/dbeta into
  VMEM-resident revisited output tiles (constant index maps, f32), exactly
  like the attention backward's dq accumulator (ops/attention_pallas.py).

Numerics match the unfused jnp path to float tolerance (not bitwise: LN
statistics and the residual ride in f32 here, and erf is a 1.5e-7-abs-error
rational approximation); equivalence of values and gradients is tested in
tests/test_kernels.py in f32 and bf16.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _phi_cdf(y):
    """(Phi(y), exp(-y^2/2)) — the normal CDF via the A&S 7.1.26 erf
    approximation (1.5e-7 abs error), sharing its exponential.

    erf(z) for z = y/sqrt(2) needs exp(-z^2) = exp(-y^2/2), which is exactly
    the exponential the GELU derivative's phi(y) needs — so the backward
    kernel evaluates ONE exp and ONE polynomial for both gelu(y) and
    gelu'(y) (the kernels are VPU-bound; a second erf evaluation measured
    ~15% of the whole backward's time).
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    z = jnp.abs(y) * _SQRT_HALF
    e = jnp.exp(-z * z)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    erf = jnp.sign(y) * (1.0 - poly * e)
    return 0.5 * (1.0 + erf), e


def _gelu(y):
    cdf, _ = _phi_cdf(y)
    return y * cdf


def _gelu_and_grad(y):
    cdf, e = _phi_cdf(y)
    return y * cdf, cdf + y * (e * _INV_SQRT_2PI)


def _ln_stats(xf, eps):
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (xf - mu) * inv, inv


def _fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                y_ref=None, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    xhat, _ = _ln_stats(xf, eps)
    ln = xhat * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    y = jax.lax.dot_general(
        ln.astype(x_ref.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    if y_ref is not None:
        # Spill the pre-activation for the backward: +one (rows, F) HBM
        # write here buys the backward its recompute matmul (measured: the
        # bwd kernel runs ~70% MXU-efficient, so dropping 1 of its 5
        # matmuls is worth more than y's HBM round trip at C>=512).
        y_ref[...] = y.astype(y_ref.dtype)
    g = _gelu(y)
    out = jax.lax.dot_general(
        g.astype(x_ref.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    o_ref[...] = (out + xf).astype(o_ref.dtype)


def _bwd_kernel_savey(x_ref, do_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                      y_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                      dg_ref, db_ref, *, eps):
    """Positional adapter: Pallas passes inputs then outputs, so the saved
    pre-activation rides as the last input."""
    _bwd_kernel(x_ref, do_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, dx_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, db_ref,
                y_ref=y_ref, eps=eps)


def _bwd_kernel(x_ref, do_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, dx_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, db_ref,
                y_ref=None, *, eps):
    """Recompute-and-accumulate backward (see module docstring).

    Weight/bias/LN-parameter gradients live in f32 revisited tiles whose
    index maps are constant in the grid step — Pallas keeps them VMEM
    resident and accumulation across row blocks is exact. Bias/LN tiles are
    sublane-replicated (8, C): Mosaic requires the last-two block dims
    (8, 128)-aligned, and every sublane carries the same running total.

    If ``y_ref`` is given it holds the forward's saved pre-activation and
    the recompute matmul is skipped (LN is still recomputed from x — it is
    VPU-only and needed for dw1 and the LN backward anyway).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dw1_ref[...] = jnp.zeros(dw1_ref.shape, dw1_ref.dtype)
        db1_ref[...] = jnp.zeros(db1_ref.shape, db1_ref.dtype)
        dw2_ref[...] = jnp.zeros(dw2_ref.shape, dw2_ref.dtype)
        db2_ref[...] = jnp.zeros(db2_ref.shape, db2_ref.dtype)
        dg_ref[...] = jnp.zeros(dg_ref.shape, dg_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    cdt = x_ref.dtype  # compute dtype for MXU operands (bf16 path stays bf16)
    xf = x_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    gamma = g_ref[0].astype(jnp.float32)

    # Recompute the forward intermediates for this row block.
    xhat, inv = _ln_stats(xf, eps)
    ln = xhat * gamma + b_ref[0].astype(jnp.float32)
    if y_ref is not None:
        y = y_ref[...].astype(jnp.float32)
    else:
        y = jax.lax.dot_general(
            ln.astype(cdt), w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) \
            + b1_ref[0].astype(jnp.float32)
    g, dgelu = _gelu_and_grad(y)

    # MLP backward.
    dw2_ref[...] += jax.lax.dot_general(
        g.astype(cdt), do_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.broadcast_to(
        jnp.sum(do, axis=0, keepdims=True), db2_ref.shape)
    dg_up = jax.lax.dot_general(
        do_ref[...], w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dy = dg_up * dgelu
    dyc = dy.astype(cdt)
    dw1_ref[...] += jax.lax.dot_general(
        ln.astype(cdt), dyc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.broadcast_to(
        jnp.sum(dy, axis=0, keepdims=True), db1_ref.shape)
    dln = jax.lax.dot_general(
        dyc, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # LayerNorm backward.
    dg_ref[...] += jnp.broadcast_to(
        jnp.sum(dln * xhat, axis=0, keepdims=True), dg_ref.shape)
    db_ref[...] += jnp.broadcast_to(
        jnp.sum(dln, axis=0, keepdims=True), db_ref.shape)
    dxhat = dln * gamma
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * inv + do  # + residual path
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _pick_rows(r: int, c: int, budget: int = 64 * 1024 * 1024):
    """Largest multiple-of-8 row block <= the cap that divides r and fits
    VMEM (cap default 1024; PGT_MLP_ROWS_CAP overrides for experiments).

    The VMEM model: ~5 live (rows, 4C) f32 tiles (y, gelu, dg, dy plus
    Mosaic headroom) dominate; weight residents and the f32 grad
    accumulators are counted by the caller via the compile-time limit.
    """
    per_row = 5 * 4 * c * 4
    rows_cap = int(os.environ.get("PGT_MLP_ROWS_CAP", "1024"))
    cap = min(rows_cap, max(budget // per_row, 8))
    for b in range(min(r, cap) - min(r, cap) % 8, 7, -8):
        if r % b == 0:
            return b
    return 0  # no divisor: caller pads


def _vec2(v):
    return v.reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "save_y"))
def _fused_fwd(x2, gamma, beta, w1, b1, w2, b2, eps, interpret, save_y=False):
    r, c = x2.shape
    f = w1.shape[1]
    rows = _pick_rows(r, c)
    if rows == 0:
        pad = -r % 8
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        rows = _pick_rows(r + pad, c)
        r_run = r + pad
    else:
        r_run = r
    out_specs = pl.BlockSpec((rows, c), lambda i: (i, 0))
    out_shape = jax.ShapeDtypeStruct((r_run, c), x2.dtype)
    if save_y:
        out_specs = (out_specs, pl.BlockSpec((rows, f), lambda i: (i, 0)))
        out_shape = (out_shape, jax.ShapeDtypeStruct((r_run, f), x2.dtype))
    # ln = xhat * gamma + beta happens in-kernel; fold beta into the gamma
    # ref? No — pass both (beta feeds y through w1).
    lnb = (gamma.astype(jnp.float32), beta.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(r_run // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, _vec2(lnb[0]), _vec2(lnb[1]), w1, _vec2(b1), w2, _vec2(b2))
    if save_y:
        return out[0][:r], out[1][:r]
    return out[:r]


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _fused_bwd(x2, do2, gamma, beta, w1, b1, w2, eps, interpret, y2=None):
    r, c = x2.shape
    f = w1.shape[1]
    rows = _pick_rows(r, c)
    if rows == 0:
        pad = -r % 8
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        do2 = jnp.pad(do2, ((0, pad), (0, 0)))
        if y2 is not None:
            y2 = jnp.pad(y2, ((0, pad), (0, 0)))
        rows = _pick_rows(r + pad, c)
        r_run = r + pad
    else:
        r_run = r
    in_specs = [
        pl.BlockSpec((rows, c), lambda i: (i, 0)),
        pl.BlockSpec((rows, c), lambda i: (i, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((1, c), lambda i: (0, 0)),
        pl.BlockSpec((c, f), lambda i: (0, 0)),
        pl.BlockSpec((1, f), lambda i: (0, 0)),
        pl.BlockSpec((f, c), lambda i: (0, 0)),
    ]
    operands = [x2, do2, _vec2(gamma.astype(jnp.float32)),
                _vec2(beta.astype(jnp.float32)), w1, _vec2(b1), w2]
    if y2 is None:
        kernel = functools.partial(_bwd_kernel, eps=eps)
    else:
        kernel = functools.partial(_bwd_kernel_savey, eps=eps)
        in_specs.append(pl.BlockSpec((rows, f), lambda i: (i, 0)))
        operands.append(y2)
    dx, dw1, db1, dw2, db2, dgamma, dbeta = pl.pallas_call(
        kernel,
        grid=(r_run // rows,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            # Constant index maps: VMEM-resident accumulators (revisited).
            pl.BlockSpec((c, f), lambda i: (0, 0)),
            pl.BlockSpec((8, f), lambda i: (0, 0)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
            pl.BlockSpec((8, c), lambda i: (0, 0)),
            pl.BlockSpec((8, c), lambda i: (0, 0)),
            pl.BlockSpec((8, c), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_run, c), x2.dtype),
            jax.ShapeDtypeStruct((c, f), jnp.float32),
            jax.ShapeDtypeStruct((8, f), jnp.float32),
            jax.ShapeDtypeStruct((f, c), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
            jax.ShapeDtypeStruct((8, c), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return dx[:r], dw1, db1[0], dw2, db2[0], dgamma[0], dbeta[0]


_INTERPRET = False  # Flipped by tests to run the kernels on CPU.
# Spill the (rows, F) pre-activation in forward so backward skips its
# recompute matmul (see _fwd_kernel). Worth it when the extra HBM round
# trip is cheaper than 1/5 of the backward's MXU time — true at C>=512;
# measured and gated in the model, not here.
_SAVE_PREACT = True


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def ln_mlp_residual(x, gamma, beta, w1, b1, w2, b2, eps=1e-5):
    """``x + w2 @ gelu(w1 @ layernorm(x) + b1) + b2`` fused, differentiable.

    Args:
        x: (..., C) activations (leading dims are flattened to rows).
        gamma/beta: (C,) LayerNorm scale/offset.
        w1/b1: (C, F), (F,) first (expansion) matmul.
        w2/b2: (F, C), (C,) second (projection) matmul.
        eps: LayerNorm epsilon (static).
    """
    shape = x.shape
    out = _fused_fwd(x.reshape(-1, shape[-1]), gamma, beta, w1, b1, w2, b2,
                     eps, _INTERPRET)
    return out.reshape(shape)


def _vjp_fwd(x, gamma, beta, w1, b1, w2, b2, eps):
    shape = x.shape
    if _SAVE_PREACT:
        out, y = _fused_fwd(x.reshape(-1, shape[-1]), gamma, beta, w1, b1,
                            w2, b2, eps, _INTERPRET, save_y=True)
        return out.reshape(shape), (x, y, gamma, beta, w1, b1, w2, b2)
    return ln_mlp_residual(x, gamma, beta, w1, b1, w2, b2, eps), \
        (x, None, gamma, beta, w1, b1, w2, b2)


def _vjp_bwd(eps, res, g):
    x, y, gamma, beta, w1, b1, w2, b2 = res
    shape = x.shape
    dx, dw1, db1, dw2, db2, dgamma, dbeta = _fused_bwd(
        x.reshape(-1, shape[-1]), g.reshape(-1, shape[-1]), gamma, beta, w1,
        b1, w2, eps, _INTERPRET, y2=y)
    return (dx.reshape(shape), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype), dw1.astype(w1.dtype),
            db1.astype(b1.dtype), dw2.astype(w2.dtype), db2.astype(b2.dtype))


ln_mlp_residual.defvjp(_vjp_fwd, _vjp_bwd)
