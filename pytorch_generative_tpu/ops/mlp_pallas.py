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


def _bwd_kernel_pipelined(x_ref, do_ref, dop_ref, g_ref, b_ref, w1_ref,
                          b1_ref, w2_ref, y_ref, dx_ref, dw1_ref, db1_ref,
                          dw2_ref, db2_ref, dg_ref, db_ref, dy_a, ln_a,
                          xhat_a, inv_a, dy_b, ln_b, xhat_b, inv_b, *, eps,
                          n_blocks):
    """Software-pipelined two-stage backward (one-step skew).

    The monolithic backward (``_bwd_kernel``) is a serial chain
    VPU(gelu') -> MXU(dw2, dg_up) -> VPU(dy) -> MXU(dw1, dln) -> VPU(LN bwd)
    per row block: profiled at C=512 it runs at ~0.63 of the forward's MXU
    efficiency because the MXU idles on the VPU dependencies (PERF.md "Where
    the remaining 47% goes"; the accumulator-traffic hypothesis was already
    measured and rejected via PGT_MLP_ROWS_CAP).

    This kernel breaks the chain by skewing the stages one grid step apart:
    at step t it runs the BACK half (dw1/dln matmuls + LN backward + dx) for
    block t-1 from VMEM scratch, then the FRONT half (LN/gelu recompute,
    dw2/dg_up matmuls, dy) for block t. The back half's two matmuls have no
    data dependence on the front half's elementwise work (and vice versa), so
    Mosaic's instruction scheduler can overlay MXU and VPU issue instead of
    alternating. The grid has n_blocks+1 steps; boundary handling is maskless
    where possible (step n_blocks re-reads the last block with ``do`` scaled
    to 0, which zeroes all its FRONT contributions) plus a one-time scratch
    zero-fill at step 0 (so the first BACK half contributes exact zeros, and
    its dx write — overwritten at step 1 before the block is flushed — holds
    no NaNs).

    Scratch is DOUBLE-buffered by grid-step parity with STATICALLY disjoint
    refs: even steps read buffer set B / write set A, odd steps the reverse,
    each under its own ``pl.when`` branch so the compiler sees two distinct
    ref objects and no hazard at all. Two earlier variants measured SLOWER
    than the monolithic kernel: single-buffered (4.54 vs 4.35 ms — the WAR
    hazard on the shared scratch serialized the halves) and dynamically
    indexed parity buffers ``scr[step % 2]`` (4.72 ms — runtime indices defeat
    disjointness analysis, so the conservative hazard remains). The
    tools/probes/probe_overlap.py microbenchmark shows Mosaic overlaps MXU and VPU issue
    at 99.4% for hazard-free work in one body (matmul-only 2.452 ms +
    VPU-only 2.067 ms -> both 2.464 ms), so static disjointness is the
    precondition for the scheduler to overlay the halves.
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
        # Only the set BACK reads at step 0 (B: even step reads B) needs
        # zeroing; its contribution must be exact zeros.
        dy_b[...] = jnp.zeros(dy_b.shape, dy_b.dtype)
        ln_b[...] = jnp.zeros(ln_b.shape, ln_b.dtype)
        xhat_b[...] = jnp.zeros(xhat_b.shape, xhat_b.dtype)
        inv_b[...] = jnp.zeros(inv_b.shape, inv_b.dtype)

    gamma = g_ref[0].astype(jnp.float32)

    def _body(dy_r, ln_r, xhat_r, inv_r, dy_w, ln_w, xhat_w, inv_w):
        # ---- BACK half: block (step - 1) from the read scratch set. ----
        dyc = dy_r[...]
        dw1_ref[...] += jax.lax.dot_general(
            ln_r[...], dyc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dln = jax.lax.dot_general(
            dyc, w1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        xhat_p = xhat_r[...]
        dg_ref[...] += jnp.broadcast_to(
            jnp.sum(dln * xhat_p, axis=0, keepdims=True), dg_ref.shape)
        db_ref[...] += jnp.broadcast_to(
            jnp.sum(dln, axis=0, keepdims=True), db_ref.shape)
        dxhat = dln * gamma
        m1 = jnp.mean(dxhat, axis=1, keepdims=True)
        m2 = jnp.mean(dxhat * xhat_p, axis=1, keepdims=True)
        inv_p = inv_r[:, :1]
        dx = ((dxhat - m1 - xhat_p * m2) * inv_p
              + dop_ref[...].astype(jnp.float32))  # + residual path
        dx_ref[...] = dx.astype(dx_ref.dtype)

        # ---- FRONT half: block (step), masked to zero at the tail step. ----
        cdt = x_ref.dtype
        live = (step < n_blocks).astype(jnp.float32)
        xf = x_ref[...].astype(jnp.float32)
        do = do_ref[...].astype(jnp.float32) * live
        doc = do.astype(cdt)
        xhat, inv = _ln_stats(xf, eps)
        ln = xhat * gamma + b_ref[0].astype(jnp.float32)
        y = y_ref[...].astype(jnp.float32)
        g, dgelu = _gelu_and_grad(y)
        dw2_ref[...] += jax.lax.dot_general(
            g.astype(cdt), doc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db2_ref[...] += jnp.broadcast_to(
            jnp.sum(do, axis=0, keepdims=True), db2_ref.shape)
        dg_up = jax.lax.dot_general(
            doc, w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dy = dg_up * dgelu
        db1_ref[...] += jnp.broadcast_to(
            jnp.sum(dy, axis=0, keepdims=True), db1_ref.shape)
        dy_w[...] = dy.astype(dy_w.dtype)
        ln_w[...] = ln.astype(ln_w.dtype)
        xhat_w[...] = xhat
        inv_w[...] = jnp.broadcast_to(inv, inv_w.shape)

    even = jax.lax.rem(step, 2) == 0

    @pl.when(even)
    def _even():  # read B, write A
        _body(dy_b, ln_b, xhat_b, inv_b, dy_a, ln_a, xhat_a, inv_a)

    @pl.when(jnp.logical_not(even))
    def _odd():  # read A, write B
        _body(dy_a, ln_a, xhat_a, inv_a, dy_b, ln_b, xhat_b, inv_b)


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
def _fused_bwd_pipelined(x2, do2, gamma, beta, w1, b1, w2, y2, eps,
                         interpret):
    """Host wrapper for the skewed two-stage backward (requires saved y)."""
    r, c = x2.shape
    f = w1.shape[1]
    rows = _pick_rows(r, c)
    if rows == 0:
        pad = -r % 8
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        do2 = jnp.pad(do2, ((0, pad), (0, 0)))
        y2 = jnp.pad(y2, ((0, pad), (0, 0)))
        rows = _pick_rows(r + pad, c)
        r_run = r + pad
    else:
        r_run = r
    nb = r_run // rows
    cur = lambda i: (jnp.minimum(i, nb - 1), 0)   # FRONT block (clamped tail)
    prev = lambda i: (jnp.maximum(i - 1, 0), 0)   # BACK block (clamped head)
    const2 = lambda i: (0, 0)
    dx, dw1, db1, dw2, db2, dgamma, dbeta = pl.pallas_call(
        functools.partial(_bwd_kernel_pipelined, eps=eps, n_blocks=nb),
        grid=(nb + 1,),
        in_specs=[
            pl.BlockSpec((rows, c), cur),      # x
            pl.BlockSpec((rows, c), cur),      # do (front)
            pl.BlockSpec((rows, c), prev),     # do (back: residual path)
            pl.BlockSpec((1, c), const2),      # gamma
            pl.BlockSpec((1, c), const2),      # beta
            pl.BlockSpec((c, f), const2),      # w1
            pl.BlockSpec((1, f), const2),      # b1
            pl.BlockSpec((f, c), const2),      # w2
            pl.BlockSpec((rows, f), cur),      # saved pre-activation y
        ],
        out_specs=(
            pl.BlockSpec((rows, c), prev),     # dx (written by BACK)
            # Constant index maps: VMEM-resident accumulators (revisited).
            pl.BlockSpec((c, f), const2),
            pl.BlockSpec((8, f), const2),
            pl.BlockSpec((f, c), const2),
            pl.BlockSpec((8, c), const2),
            pl.BlockSpec((8, c), const2),
            pl.BlockSpec((8, c), const2),
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
        scratch_shapes=[
            # Statically disjoint parity double-buffers (A set then B set):
            # BACK reads one set while FRONT writes the other — no hazard.
            pltpu.VMEM((rows, f), x2.dtype),        # dy_a (next step's operand)
            pltpu.VMEM((rows, c), x2.dtype),        # ln_a
            pltpu.VMEM((rows, c), jnp.float32),     # xhat_a
            pltpu.VMEM((rows, 128), jnp.float32),   # inv_a (lane-replicated)
            pltpu.VMEM((rows, f), x2.dtype),        # dy_b
            pltpu.VMEM((rows, c), x2.dtype),        # ln_b
            pltpu.VMEM((rows, c), jnp.float32),     # xhat_b
            pltpu.VMEM((rows, 128), jnp.float32),   # inv_b
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, do2, do2, _vec2(gamma.astype(jnp.float32)),
      _vec2(beta.astype(jnp.float32)), w1, _vec2(b1), w2, y2)
    return dx[:r], dw1, db1[0], dw2, db2[0], dgamma[0], dbeta[0]


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


def _use_pipelined_bwd():
    """Opt-in (PGT_MLP_BWD=pipe): the skewed two-stage backward measured
    SLOWER than the monolithic kernel on v5e at the C=512 production point
    (4.54 vs 4.35 ms, MXU eff 0.471 vs 0.492, bitwise-equal grads) — the
    one-step skew did not buy MXU/VPU overlap (see PERF.md "Split backward
    attempt"). Kept for the equality test and future Mosaic revisions.
    Requires the saved pre-activation."""
    return os.environ.get("PGT_MLP_BWD", "mono") == "pipe" and _SAVE_PREACT


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
    if y is not None and _use_pipelined_bwd():
        dx, dw1, db1, dw2, db2, dgamma, dbeta = _fused_bwd_pipelined(
            x.reshape(-1, shape[-1]), g.reshape(-1, shape[-1]), gamma, beta,
            w1, b1, w2, y, eps, _INTERPRET)
    else:
        dx, dw1, db1, dw2, db2, dgamma, dbeta = _fused_bwd(
            x.reshape(-1, shape[-1]), g.reshape(-1, shape[-1]), gamma, beta,
            w1, b1, w2, eps, _INTERPRET, y2=y)
    return (dx.reshape(shape), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype), dw1.astype(w1.dtype),
            db1.astype(b1.dtype), dw2.astype(w2.dtype), db2.astype(b2.dtype))


ln_mlp_residual.defvjp(_vjp_fwd, _vjp_bwd)
