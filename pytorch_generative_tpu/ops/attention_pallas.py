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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
_NEG_INF = float("-inf")
# Base-2 softmax domain (see _fwd_kernel): exp2 is the VPU's transcendental
# primitive, so running the online softmax on s2 = s * log2(e) — with the
# constant folded into q's 1/sqrt(d_k) scale — removes two tile-area VPU
# passes per (q, k) tile from each kernel.
_LOG2E = float(np.log2(np.e))
_LN2 = float(np.log(2.0))


def _mxu_dtype(dtype):
    """Operand dtype for the kernels' MXU dots (trace-time).

    ``PGT_FLASH_PRECISION=default`` makes the f32 path's QK^T/PV and backward
    dots cast their operands to bf16 while every accumulator, softmax
    statistic, logsumexp, and output stays f32 — JAX/XLA:TPU's DEFAULT matmul
    precision, which every non-kernel dot in a train step here uses. Measured
    NEUTRAL on v5e (round 5, tools/probes/bench_precision.py: 3069 vs 3038 samples/s at
    the bs64/C=64/d_k=32 headline config, 542 vs 545 at C=512/d_k=128 f32,
    identical losses to 4 decimals) — the f32 kernels are bound by the
    online-softmax VPU work and bandwidth, not multiply throughput (PERF.md
    "headline reproduce() config") — so the shipped default stays ``highest``
    (full f32 multiplies, exact pre-round-5 numerics). bf16 inputs are
    unchanged either way.
    """
    if dtype == jnp.float32 and os.environ.get(
            "PGT_FLASH_PRECISION", "highest") == "default":
        return jnp.bfloat16
    return dtype


def _blocks(l: int, block_q: int, block_k: int):
    """Padded sequence length: the least common multiple-of-both-blocks cover.

    Both grids are l_pad // block; a block not dividing l_pad would leave
    output rows unwritten, so the divisibility is asserted here.
    """
    block = max(block_q, block_k)
    l_pad = -(-l // block) * block
    assert l_pad % block_q == 0 and l_pad % block_k == 0, (
        f"block sizes ({block_q}, {block_k}) must both divide the padded "
        f"length {l_pad}")
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

def _full_mask_tile(ki, block_q, block_k, valid_len):
    """Non-causal tile mask: every key column below ``valid_len`` attends
    (used by the ring's cross-shard steps, where the whole k/v shard is in
    the query shard's past)."""
    col_ids = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    return col_ids < valid_len


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_q, block_k,
                mask_center, scale, n_heads, causal=True, valid_len=None,
                mxu=None):
    """Packed multi-head forward: refs carry the full (block, H*d) feature
    width; heads are a static in-kernel loop over register slices. TPU lane
    tiling forbids sub-128 feature blocks in the BlockSpec, and slicing VMEM
    values is far cheaper than the host-side head-split transposes it
    replaces (measured ~10x the attention math on v5e).

    ``causal=False`` computes full (unmasked) attention against the first
    ``valid_len`` keys — the cross-shard step of the sequence-parallel ring,
    where every key is in the query's past."""
    qi = pl.program_id(1)
    # MXU operands ride in ``mxu`` (input dtype by default; see _mxu_dtype
    # for the opt-in bf16-operand f32 mode); preferred_element_type keeps
    # every accumulation and all softmax statistics in float32.
    q_all = q_ref[0]
    mxu = mxu or q_all.dtype
    d_k = q_all.shape[-1] // n_heads
    d_v = o_ref.shape[-1] // n_heads
    offset = 1 if mask_center else 0
    if causal:
        n_k_blocks = jax.lax.div(qi * block_q + block_q - 1, block_k) + 1
    else:
        n_k_blocks = k_ref.shape[1] // block_k

    outs, lses = [], []
    for hd in range(n_heads):
        # The softmax runs in the base-2 domain: scale * log2(e) is folded
        # into q ONCE per (head, q-tile) — a (block_q, d_k) multiply — so the
        # inner loop's tile-area (block_q, block_k) work drops the post-dot
        # `* scale` pass AND exp's internal x*log2e multiply (the VPU's
        # transcendental primitive is pow2). At d_k=32 that's 2 of ~8
        # tile-area VPU passes in a kernel the headline profile shows is
        # VPU-bound (PERF.md "headline reproduce() config"). Mathematically
        # sum exp2(s2 - m2) == sum exp(s - m); numerically the base change
        # moves low bits only (folded-constant rounding, ~1 ulp).
        q = (q_all[:, hd * d_k: (hd + 1) * d_k].astype(jnp.float32)
             * (scale * _LOG2E)).astype(mxu)

        def body(ki, carry):
            m_prev, l_prev, acc = carry
            k = k_ref[0, pl.ds(ki * block_k, block_k),
                      :][:, hd * d_k: (hd + 1) * d_k]
            v = v_ref[0, pl.ds(ki * block_k, block_k),
                      :][:, hd * d_v: (hd + 1) * d_v]
            scores = jax.lax.dot_general(
                q, k.astype(mxu), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            mask = (_causal_mask_tile(qi, ki, block_q, block_k, offset)
                    if causal
                    else _full_mask_tile(ki, block_q, block_k, valid_len))
            scores = jnp.where(mask, scores, _NEG_INF)

            m_cur = jnp.max(scores, axis=1)
            m_new = jnp.maximum(m_prev, m_cur)
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            alpha = jnp.where(jnp.isfinite(m_prev),
                              jnp.exp2(m_prev - m_safe), 0.0)
            # No mask-where on p: masked entries hold -inf from the scores
            # where above and exp2(-inf - finite) == 0 exactly (fully-masked
            # rows keep m_safe == 0, so the argument is still -inf).
            p = jnp.exp2(scores - m_safe[:, None])

            l_new = alpha * l_prev + jnp.sum(p, axis=1)
            acc = acc * alpha[:, None] + jax.lax.dot_general(
                p.astype(mxu), v.astype(mxu), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc

        m0 = jnp.full((block_q,), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q,), jnp.float32)
        acc0 = jnp.zeros((block_q, d_v), jnp.float32)
        # Measured rejection (round 5): splitting this loop into a mask-free
        # prefix (k-blocks entirely below the causal diagonal) + masked tail
        # lost ~2.5% f32 / ~4% bf16 at the headline config — with
        # exact-divisor blocks there are only 2 k-blocks per q-tile, so the
        # second fori_loop's setup outweighs skipping ~5 tile-area VPU
        # passes on at most one block (PERF.md, "What was measured and
        # rejected").
        m, l, acc = jax.lax.fori_loop(0, n_k_blocks, body, (m0, l0, acc0))

        # Fully-masked rows (l == 0) output exactly 0 (reference NaN-row
        # behavior, nn/attention.py:154-157); their lse stays -inf so
        # backward zeroes them.
        outs.append(acc / jnp.where(l == 0.0, 1.0, l)[:, None])
        # The stored lse stays in the NATURAL-log domain (the ring
        # attention's cross-shard merge and the backward contract both
        # consume it as ln): lse = ln2 * m2 + ln(l).
        lse = jnp.where(l == 0.0, _NEG_INF,
                        m * _LN2 + jnp.log(jnp.maximum(l, 1e-38)))
        # Stats live lane-replicated ((block_q, 128) tiles per head): the
        # lane dim is always 128-aligned, so block_q is free to be any
        # multiple of 8 — which lets _pick_blocks choose exact divisors of L
        # and eliminate sequence padding entirely.
        lses.append(jnp.broadcast_to(lse[:, None], (lse.shape[0], 128)))

    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
    lse_ref[0] = jnp.stack(lses, axis=0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, out_ref, lse_ref, dq_ref,
                      dk_ref, dv_ref, *, block_q, block_k, mask_center, scale,
                      n_q_blocks, n_heads, causal=True, valid_len=None,
                      mxu=None):
    """One-pass backward: dQ, dK, dV from a single probability rebuild.

    The split dq/dkv kernel pair recomputed ``scores`` and ``dp`` twice (7
    matmuls per tile pair where 5 suffice) and read a lane-replicated delta
    array from HBM; this kernel computes every tile's p/dp once, derives
    delta = rowsum(dout * out) in-kernel (so the (B, H, L, 128) delta array is
    never materialized), and accumulates dQ into a VMEM-resident output tile
    that Pallas keeps live across the k-block grid steps (the index map is
    constant in ki, so the tile is revisited, not flushed). Measured on v5e
    (ImageGPT reproduce() config, bf16): total backward-kernel time 10 -> 6 ms
    per train step; with the rank-3 block activations this took the step from
    2388 to 3753 samples/s.
    """
    ki = pl.program_id(1)
    d_k = k_ref.shape[-1] // n_heads
    d_v = v_ref.shape[-1] // n_heads
    offset = 1 if mask_center else 0
    # q blocks strictly before this k block contribute nothing (causality);
    # in the non-causal (ring cross-shard) mode every q block sees every key.
    first_q = jax.lax.div(ki * block_k, block_q) if causal else 0

    @pl.when(ki == 0)
    def _init():
        dq_ref[0] = jnp.zeros(dq_ref.shape[1:], dq_ref.dtype)

    k_all = k_ref[0]
    v_all = v_ref[0]
    mxu = mxu or k_all.dtype
    ks = [k_all[:, hd * d_k: (hd + 1) * d_k] for hd in range(n_heads)]
    vs = [v_all[:, hd * d_v: (hd + 1) * d_v] for hd in range(n_heads)]

    def body(qi, carry):
        dk_all, dv_all = carry
        q_rows = q_ref[0, pl.ds(qi * block_q, block_q), :]
        do_rows = do_ref[0, pl.ds(qi * block_q, block_q), :]
        out_rows = out_ref[0, pl.ds(qi * block_q, block_q), :]
        mask = (_causal_mask_tile(qi, ki, block_q, block_k, offset)
                if causal
                else _full_mask_tile(ki, block_q, block_k, valid_len))

        dqs, dks, dvs = [], [], []
        for hd in range(n_heads):
            q = q_rows[:, hd * d_k: (hd + 1) * d_k]
            do = do_rows[:, hd * d_v: (hd + 1) * d_v]
            out_h = out_rows[:, hd * d_v: (hd + 1) * d_v]
            # Base-2 probability rebuild, mirroring the forward: scale *
            # log2(e) folds into q (a (block_q, d_k) multiply), the stored
            # natural-log lse converts per-row, and the tile-area post-dot
            # `* scale` and exp-internal multiply disappear. dk needs
            # dot(ds, q) * scale = dot(ds, q2) * ln2 since q2 already
            # carries scale * log2e.
            q2 = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(mxu)
            # Stats are lane-replicated (block_q, 128) tiles; a lane
            # reduction recovers the column (all lanes equal, -inf-safe).
            lse_col = jnp.max(
                lse_ref[0, hd, pl.ds(qi * block_q, block_q), :].astype(
                    jnp.float32), axis=1, keepdims=True)
            delta_col = jnp.sum(
                do.astype(jnp.float32) * out_h.astype(jnp.float32),
                axis=1, keepdims=True)
            scores = jax.lax.dot_general(
                q2, ks[hd].astype(mxu), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            finite = jnp.isfinite(lse_col)
            lse_safe = jnp.where(finite, lse_col * _LOG2E, 0.0)
            p = jnp.where(mask & finite, jnp.exp2(scores - lse_safe), 0.0)
            dv_c = jax.lax.dot_general(
                p.astype(mxu), do.astype(mxu), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do.astype(mxu), vs[hd].astype(mxu), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - delta_col)
            dk_c = jax.lax.dot_general(
                ds.astype(mxu), q2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * _LN2
            dq_c = jax.lax.dot_general(
                ds.astype(mxu), ks[hd].astype(mxu), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dqs.append(dq_c)
            dks.append(dk_c)
            dvs.append(dv_c)

        dq_rows = dq_ref[0, pl.ds(qi * block_q, block_q), :]
        dq_ref[0, pl.ds(qi * block_q, block_q), :] = (
            dq_rows + jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype))
        return (dk_all + jnp.concatenate(dks, axis=-1),
                dv_all + jnp.concatenate(dvs, axis=-1))

    dk0 = jnp.zeros((block_k, n_heads * d_k), jnp.float32)
    dv0 = jnp.zeros((block_k, n_heads * d_v), jnp.float32)
    # Mask-free/masked loop split rejected here too — see the forward.
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


# Block-picking budgets and the per-kernel Mosaic scoped-VMEM ceiling. v5e
# has 128MB of physical VMEM per core, but Mosaic's default scoped limit is
# 16MB and raising it is not free: measured on the reproduce() config (C=64),
# compiling with an elevated vmem_limit_bytes costs ~4% step throughput even
# when the chosen blocks are identical (Mosaic buffers more aggressively).
# So the limit is raised ONLY when the default budget would force smaller
# blocks — e.g. C=512/8-heads, where full-length operand residents alone
# approach 16MB once dq accumulates in f32; there the raised ceiling restores
# 392-wide blocks (382 -> 556 samples/s, 42% MFU).
_VMEM_BUDGET = 12 * 1024 * 1024
_VMEM_RAISED_BUDGET = 48 * 1024 * 1024
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _pick_blocks(l, block_q, block_k, n_heads=1, resident_bytes=0,
                 budget=_VMEM_BUDGET):
    """Picks the largest multiple-of-8 block <= the requested sizes that
    divides l exactly AND fits the scoped-VMEM budget.

    An exact divisor removes sequence padding entirely: for L=784 the pow2
    scheme padded to 1024, wasting ~50% of the causal tile work plus a
    pad/slice copy of every operand around each kernel call (measured on v5e
    to rival the attention math itself). The stats arrays are lane-replicated
    (block_q, 128) tiles, so any multiple-of-8 block_q is legal.

    The VMEM model: the in-kernel head loop is a static unroll, so Mosaic may
    allocate every head's (block_q, block_k) f32 score/probability tiles at
    once (~4 live f32 tiles per head measured from the compiler's scoped-vmem
    accounting at n_embedding_channels=512), on top of the full-length
    operand refs (``resident_bytes``). Without the cap a wide-feature config
    dies in compile with "Ran out of memory in memory space vmem".
    """
    cap = min(max(block_q, block_k), l)
    avail = max(budget - resident_bytes, 1 << 20)
    per_block2 = max(16 * n_heads, 1)  # ~4 f32 tiles per unrolled head
    vmem_cap = int((avail / per_block2) ** 0.5)
    cap = min(cap, max(vmem_cap, 64))
    for b in range(cap - cap % 8, 7, -8):
        if l % b == 0:
            return b, b
    # No exact divisor: fall back to ONE multiple-of-8 size for both blocks.
    # Unequal (or non-multiple-of-8) user sizes must not survive here — the
    # grid is l_pad // block, so a block that does not divide the padded
    # length would leave output rows unwritten (silent garbage).
    cap2 = max(128, 1 << (max(l - 1, 1)).bit_length())
    b = min(block_q, block_k, cap2, cap - cap % 8 or 8)
    b -= b % 8
    return max(b, 8), max(b, 8)


def _pick_blocks_and_limit(l, block_q, block_k, n_heads, resident_bytes):
    """Block sizes plus the Mosaic vmem_limit_bytes to compile with (None =
    the default 16MB scope). The limit is raised only when doing so buys
    bigger blocks — see the budget constants above for the measured
    trade-off."""
    small = _pick_blocks(l, block_q, block_k, n_heads, resident_bytes)
    big = _pick_blocks(l, block_q, block_k, n_heads, resident_bytes,
                       _VMEM_RAISED_BUDGET)
    if big == small:
        return small[0], small[1], None
    return big[0], big[1], _VMEM_LIMIT_BYTES


@functools.partial(jax.jit, static_argnames=("n_heads", "mask_center",
                                             "block_q", "block_k",
                                             "interpret", "causal", "mxu"))
def _flash_forward(q, k, v, n_heads, mask_center, block_q, block_k,
                   interpret, causal=True, mxu=None):
    """Packed-layout forward: q/k (B, L, H*d_k), v (B, L, H*d_v).

    Heads are never materialized on the host — the per-head tiles are carved
    out by the BlockSpec index maps. This keeps the projection outputs in
    their natural (B, L, features) layout end-to-end: profiling on v5e showed
    the (B, L, H, d) -> (B, H, L, d) head-split transposes around the kernels
    cost ~10x the attention math itself.
    """
    b, l, _ = q.shape
    d_k = q.shape[-1] // n_heads
    d_v = v.shape[-1] // n_heads
    scale = 1.0 / (d_k ** 0.5)
    # None resolves against PGT_FLASH_PRECISION at trace time (the same
    # trace-time-env contract as the PGT_FUSED_* gates: a toggle needs new
    # shapes or a new process to take effect under jit caching).
    mxu = mxu or _mxu_dtype(q.dtype)
    # Full-length VMEM residents: the k/v refs (+ the lse output tile).
    resident = (l * (q.shape[-1] + v.shape[-1]) * q.dtype.itemsize
                + n_heads * l * 128 * 4)
    block_q, block_k, vmem_limit = _pick_blocks_and_limit(
        l, block_q, block_k, n_heads, resident)
    l_pad = _blocks(l, block_q, block_k)

    qf = _pad_to(q, l_pad, 1)
    kf = _pad_to(k, l_pad, 1)
    vf = _pad_to(v, l_pad, 1)

    kernel = functools.partial(_fwd_kernel, block_q=block_q, block_k=block_k,
                               mask_center=mask_center, scale=scale,
                               n_heads=n_heads, causal=causal, valid_len=l,
                               mxu=mxu)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, l_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, n_heads * d_k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, n_heads * d_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, n_heads * d_v), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, n_heads * d_v), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, block_q, 128), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l_pad, n_heads * d_v), q.dtype),
            jax.ShapeDtypeStruct((b, n_heads, l_pad, 128), jnp.float32),
        ),
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
                         if vmem_limit else None),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :l, :], lse


@functools.partial(jax.jit, static_argnames=("n_heads", "mask_center",
                                             "block_q", "block_k",
                                             "interpret", "causal", "mxu"))
def _flash_backward(q, k, v, out, lse, g, n_heads, mask_center, block_q,
                    block_k, interpret, causal=True, mxu=None):
    """Packed-layout backward (see _flash_forward for the layout contract)."""
    b, l, _ = q.shape
    d_k = q.shape[-1] // n_heads
    d_v = v.shape[-1] // n_heads
    scale = 1.0 / (d_k ** 0.5)
    mxu = mxu or _mxu_dtype(q.dtype)
    # Full-length VMEM residents: q, do, out, dq refs + the lse stats.
    # dq rides in f32 (see out_shape below), hence the extra q-width term.
    resident = (l * (2 * q.shape[-1] + 2 * v.shape[-1] + v.shape[-1])
                * q.dtype.itemsize + l * q.shape[-1] * 4
                + n_heads * l * 128 * 4)
    block_q, block_k, vmem_limit = _pick_blocks_and_limit(
        l, block_q, block_k, n_heads, resident)
    l_pad = _blocks(l, block_q, block_k)

    qf = _pad_to(q, l_pad, 1)
    kf = _pad_to(k, l_pad, 1)
    vf = _pad_to(v, l_pad, 1)
    dof = _pad_to(g, l_pad, 1)
    outf = _pad_to(out, l_pad, 1)
    # The forward may have picked different blocks (VMEM budget differs);
    # align the stats array to this pass's padded length. Padded rows carry
    # lse = 0 (finite) but contribute nothing: their dout rows are zero.
    if lse.shape[2] != l_pad:
        lse = _pad_to(lse[:, :, :l_pad], l_pad, 2)
    # lse is (B, H, l_pad, 128) lane-replicated from the forward. NOTE:
    # padded query rows can carry a *finite* lse (zero q against real keys);
    # their dk/dv/dq contributions vanish because the padded dout rows are
    # zero (ds = p * (0 - 0)), not because of the lse value — don't build
    # logic on padded-row lse being -inf.

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, block_q=block_q,
                          block_k=block_k, mask_center=mask_center,
                          scale=scale, n_q_blocks=l_pad // block_q,
                          n_heads=n_heads, causal=causal, valid_len=l,
                          mxu=mxu),
        grid=(b, l_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, l_pad, n_heads * d_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, n_heads * d_k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, n_heads * d_v), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, n_heads * d_v), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l_pad, n_heads * d_v), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_heads, l_pad, 128), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # Constant-in-ki index map: the dq tile stays VMEM-resident and
            # is accumulated across the k-block grid steps (revisited).
            pl.BlockSpec((1, l_pad, n_heads * d_k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, n_heads * d_k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, n_heads * d_v), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # dq is f32: it is accumulated by read-modify-write across the
            # k-block grid steps, and rounding the partial sum to bf16 at
            # every revisit would compound error that dk/dv (f32 fori-loop
            # carries) do not see.
            jax.ShapeDtypeStruct((b, l_pad, n_heads * d_k), jnp.float32),
            jax.ShapeDtypeStruct((b, l_pad, n_heads * d_k), q.dtype),
            jax.ShapeDtypeStruct((b, l_pad, n_heads * d_v), q.dtype),
        ),
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
                         if vmem_limit else None),
        interpret=interpret,
    )(qf, kf, vf, dof, outf, lse)

    return dq[:, :l].astype(q.dtype), dk[:, :l], dv[:, :l]


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

_INTERPRET = False  # Flipped by tests to run the kernels on CPU.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def causal_attention_packed(q, k, v, mask_center: bool, n_heads: int):
    """Differentiable fused attention over packed (B, L, heads*d) tensors.

    The hot-path entry point: consumes the q/kv projections' natural
    (batch, sequence, features) layout directly (head-major feature order,
    matching the reference's head restacking, nn/attention.py:131-161) and
    produces the same layout — zero host-side transposes.
    """
    out, _ = _flash_forward(q, k, v, n_heads, mask_center, DEFAULT_BLOCK_Q,
                            DEFAULT_BLOCK_K, _INTERPRET)
    return out


def _vjp_fwd(q, k, v, mask_center, n_heads):
    out, lse = _flash_forward(q, k, v, n_heads, mask_center, DEFAULT_BLOCK_Q,
                              DEFAULT_BLOCK_K, _INTERPRET)
    return out, (q, k, v, out, lse)


def _vjp_bwd(mask_center, n_heads, residuals, g):
    q, k, v, out, lse = residuals
    return _flash_backward(q, k, v, out, lse, g, n_heads, mask_center,
                           DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, _INTERPRET)


causal_attention_packed.defvjp(_vjp_fwd, _vjp_bwd)


def _pack(t):
    n, h, l, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(n, l, h * d)


def _unpack(t, n_heads):
    b, l, hd = t.shape
    return t.reshape(b, l, n_heads, hd // n_heads).transpose(0, 2, 1, 3)


def flash_causal_attention(q, k, v, mask_center: bool = False,
                           block_q: int = DEFAULT_BLOCK_Q,
                           block_k: int = DEFAULT_BLOCK_K,
                           interpret: bool | None = None):
    """Fused causal attention over (N, heads, L, d) tensors (forward only).

    Compatibility wrapper over the packed kernel; the hot path
    (nn.CausalAttention) uses :func:`causal_attention_packed` directly.
    """
    if interpret is None:
        interpret = _INTERPRET
    n_heads = q.shape[1]
    out, _ = _flash_forward(_pack(q), _pack(k), _pack(v), n_heads,
                            mask_center, block_q, block_k, interpret)
    return _unpack(out, n_heads)


def causal_attention_trainable(q, k, v, mask_center: bool = False):
    """Differentiable fused attention over (N, heads, L, d) tensors."""
    n_heads = q.shape[1]
    out = causal_attention_packed(_pack(q), _pack(k), _pack(v), mask_center,
                                  n_heads)
    return _unpack(out, n_heads)
