"""Fused per-pixel decode step for the ImageGPT sampler (Pallas).

The KV-cache sampler (ops/sampling.py) is op-count-bound at small sample
batches: each raster position runs ~25 tiny XLA ops per transformer block
(LayerNorm, qkv matmul, cached attention, MLP) and every op carries a ~1-2 us
fixed cost on v5e, so the n=16 sample grid decodes at ~380 us/pixel while the
arithmetic is microseconds. This kernel runs the ENTIRE block stack for one
position in a single Pallas call: weights stay VMEM-resident across blocks,
heads are static in-kernel loops, and the only XLA ops left per pixel are the
masked input conv, one fused cache write, the output head, and the sampling
draw.

Numerics match the XLA fast path to float tolerance (not bitwise — MXU/VPU
op ordering differs), so the Pallas step is used on TPU where it is fastest
and the XLA path remains the default under exact-equivalence tests; parity is
tested per step against the XLA block stack (tests/test_sampling.py).

Cache layout: one packed (n_blocks, N, L, H*d_k + H*d_v) array — k and v
concatenated on the feature axis so the feature width is 128 lanes at the
reference config (2 heads x 32 + 2 heads x 32), one DMA per step, one
dynamic_update_slice write per step.

Reference parity target: the per-pixel step of
/root/reference/pytorch_generative/models/autoregressive/image_gpt.py:86-109
(sampling contract models/base.py:97-120).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _ln(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _erf(x):
    """erf to 1.5e-7 abs error (Abramowitz & Stegun 7.1.26).

    Mosaic has no erf/erfc lowering, so exact GELU inside the kernel uses
    this rational-exponential approximation; the fused sampler therefore
    matches the XLA decode path to ~1e-6 on logits (not bitwise), which the
    module docstring's tolerance contract covers.
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + p * z)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _step_kernel(i_ref, x_ref, kv_cache_ref, ln1_w, ln1_b, qkv_w, qkv_b,
                 out_w, out_b, ln2_w, ln2_b, mlp1_w, mlp1_b, mlp2_w, mlp2_b,
                 lnf_w, lnf_b, act_ref, kv_new_ref, x_state, *, n_heads,
                 d_k, d_v, window):
    """One raster position through ONE transformer block (grid = blocks).

    The grid iterates over blocks so Pallas double-buffers the per-block
    cache/weight DMAs — block b's compute overlaps block b+1's cache fetch,
    which matters because the step is cache-DMA-bound. The running
    activations persist across grid steps in the ``x_state`` VMEM scratch.

    i_ref: SMEM (1,) current global position; kv_cache_ref carries the first
    ``window`` positions of this block's packed K|V cache. Positions >= i
    are stale — past keys are masked with pos < i and the current position's
    k/v enter the softmax as an explicitly appended column.
    """
    b = pl.program_id(0)
    i = i_ref[0]

    @pl.when(b == 0)
    def _init():
        x_state[:] = x_ref[:]

    x = x_state[:]
    c_k = n_heads * d_k
    scale = 1.0 / (d_k ** 0.5)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
    past = pos < i  # (1, window), broadcasts over rows

    t = _ln(x, ln1_w[0], ln1_b[0])
    qkv = jnp.dot(t, qkv_w[0], preferred_element_type=jnp.float32) \
        + qkv_b[0]
    q = qkv[:, :c_k]
    kv_i = qkv[:, c_k:]
    kv_new_ref[0] = kv_i.astype(kv_new_ref.dtype)

    head_outs = []
    for h in range(n_heads):
        qh = q[:, h * d_k:(h + 1) * d_k] * scale          # (n, d_k)
        kh_i = kv_i[:, h * d_k:(h + 1) * d_k]
        vh_i = kv_i[:, c_k + h * d_v:c_k + (h + 1) * d_v]
        kh = kv_cache_ref[0, :, :, h * d_k:(h + 1) * d_k].astype(
            jnp.float32)                                   # (n, win, dk)
        vh = kv_cache_ref[0, :, :,
                          c_k + h * d_v:c_k + (h + 1) * d_v].astype(
            jnp.float32)

        s_past = jnp.sum(qh[:, None, :] * kh, axis=-1)     # (n, win)
        s_past = jnp.where(past, s_past, _NEG_INF)
        s_self = jnp.sum(qh * kh_i, axis=-1)               # (n,)

        m = jnp.maximum(jnp.max(s_past, axis=-1), s_self)
        e_past = jnp.exp(s_past - m[:, None])              # 0 where masked
        e_self = jnp.exp(s_self - m)
        denom = jnp.sum(e_past, axis=-1) + e_self
        num = (jnp.sum(e_past[:, :, None] * vh, axis=1)
               + e_self[:, None] * vh_i)                   # (n, d_v)
        head_outs.append(num / denom[:, None])

    attn = jnp.concatenate(head_outs, axis=-1)
    attn = jnp.dot(attn, out_w[0], preferred_element_type=jnp.float32) \
        + out_b[0]
    x1 = x + attn
    tt = _ln(x1, ln2_w[0], ln2_b[0])
    hmid = _gelu_exact(
        jnp.dot(tt, mlp1_w[0], preferred_element_type=jnp.float32)
        + mlp1_b[0])
    mout = jnp.dot(hmid, mlp2_w[0], preferred_element_type=jnp.float32) \
        + mlp2_b[0]
    # Block residual + model-level extra skip: x = x + (x1 + mlp(x1)).
    x = x + (x1 + mout)
    x_state[:] = x
    # Constant-index output blocks are copied out after every grid step, so
    # keep act_ref defined on each; the final block's write is the result.
    act_ref[:] = _ln(x, lnf_w[0], lnf_b[0])


@functools.partial(jax.jit, static_argnames=("n_heads", "d_k", "d_v",
                                             "window", "interpret"))
def fused_decode_step(i, x, kv_cache, weights, n_heads, d_k, d_v, window,
                      interpret=False):
    """Runs the whole ImageGPT block stack for one raster position.

    Args:
        i: scalar int32 — current global position.
        x: (N, C) input activations (masked input conv + positional).
        kv_cache: (n_blocks, N, L, H*d_k + H*d_v) packed K|V cache.
        weights: dict of stacked per-block parameters (see
            ``stack_image_gpt_weights``).
        window: static — how many leading cache positions the kernel may
            read (i < window).
    Returns:
        act: (N, C) final pre-head activations (after the model-level LN).
        kv_new: (n_blocks, N, H*d_k + H*d_v) — this position's k|v per
            block, for the caller to write into the cache at position i.
    """
    n_blocks, n, l, f = kv_cache.shape
    c = x.shape[-1]
    kernel = functools.partial(
        _step_kernel, n_heads=n_heads, d_k=d_k, d_v=d_v, window=window)
    w_order = ("ln1_w", "ln1_b", "qkv_w", "qkv_b", "out_w", "out_b",
               "ln2_w", "ln2_b", "mlp1_w", "mlp1_b", "mlp2_w", "mlp2_b",
               "lnf_w", "lnf_b")

    def per_block_spec(shape):
        # (B, ...) stacked weight -> (1, ...) block for grid step b.
        nd = len(shape)
        return pl.BlockSpec((1,) + shape[1:],
                            lambda b, *_, nd=nd: (b,) + (0,) * (nd - 1))

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda *_, nd=nd: (0,) * nd)

    in_specs = [
        const_spec((n, c)),
        pl.BlockSpec((1, n, window, f), lambda b, *_: (b, 0, 0, 0)),
    ] + [const_spec(weights[k].shape) if k.startswith("lnf")
         else per_block_spec(weights[k].shape) for k in w_order]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            const_spec((n, c)),
            pl.BlockSpec((1, n, f), lambda b, *_: (b, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((n, c), jnp.float32)],
    )
    # Three cache blocks resident (Mosaic keeps an extra in-flight buffer
    # beyond the compute/fetch pair — measured: n=64/window=560 allocates
    # ~180K past a 2-block budget) + weights + headroom.
    block_bytes = n * window * f * kv_cache.dtype.itemsize
    act, kv_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, c), jnp.float32),
                   jax.ShapeDtypeStruct((n_blocks, n, f), kv_cache.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(3 * block_bytes + 32 * 1024 * 1024,
                                 115 * 1024 * 1024)),
        interpret=interpret,
    )(jnp.asarray([i], jnp.int32), x, kv_cache,
      *[weights[k] for k in w_order])
    return act, kv_new


def stack_image_gpt_weights(model):
    """Stacks an ImageGPT's per-block parameters for the fused step kernel."""
    blocks = model.blocks
    qkv_w = jnp.stack([
        jnp.concatenate([blk.attn.q_proj.weight[0, 0],
                         blk.attn.kv_proj.weight[0, 0]], axis=-1)
        for blk in blocks])
    qkv_b = jnp.stack([
        jnp.concatenate([blk.attn.q_proj.bias, blk.attn.kv_proj.bias])
        for blk in blocks])

    def stack_vec(vecs):
        # (B, 1, C): the singleton middle axis makes the per-block (1, 1, C)
        # BlockSpec legal (Mosaic wants last-two block dims divisible by
        # (8, 128) or equal to the array dims) and broadcasts in-kernel.
        return jnp.stack(list(vecs))[:, None, :]

    return {
        "ln1_w": stack_vec(blk.ln1.scale for blk in blocks),
        "ln1_b": stack_vec(blk.ln1.offset for blk in blocks),
        "qkv_w": qkv_w,
        "qkv_b": qkv_b[:, None, :],
        "out_w": jnp.stack([blk.attn.out_proj.weight[0, 0]
                            for blk in blocks]),
        "out_b": stack_vec(blk.attn.out_proj.bias for blk in blocks),
        "ln2_w": stack_vec(blk.ln2.scale for blk in blocks),
        "ln2_b": stack_vec(blk.ln2.offset for blk in blocks),
        "mlp1_w": jnp.stack([blk.mlp_conv1.weight[0, 0] for blk in blocks]),
        "mlp1_b": stack_vec(blk.mlp_conv1.bias for blk in blocks),
        "mlp2_w": jnp.stack([blk.mlp_conv2.weight[0, 0] for blk in blocks]),
        "mlp2_b": stack_vec(blk.mlp_conv2.bias for blk in blocks),
        "lnf_w": model.ln.scale[None, None, :],
        "lnf_b": model.ln.offset[None, None, :],
    }


# ---------------------------------------------------------------------------
# Whole-loop sampler: the ENTIRE raster scan in one pallas_call.
# ---------------------------------------------------------------------------


def _sample_loop_kernel(canvas0_ref, pos_ref, u_ref, in_w4, in_b, head_w,
                        head_b, fselk_ref, fselv_ref, qsel_ref, expsel_ref,
                        dmask_ref, ln1_w, ln1_b, qkv_w, qkv_b, out_w, out_b,
                        ln2_w, ln2_b, mlp1_w, mlp1_b, mlp2_w, mlp2_b,
                        lnf_w, lnf_b, canvas_ref, kf_ref,
                        vf_ref, *, n_blocks, n_heads, d_k, d_v, h, w,
                        seq_len):
    """One raster position through the WHOLE block stack (grid = (1, L)).

    Unlike ``_step_kernel`` (grid over blocks, cache re-fetched from HBM per
    pixel), the K/V caches of ALL blocks live in VMEM scratches that persist
    across grid steps, so the only HBM traffic for an entire image is the
    weights once, the uniforms (one (1, n) row per pixel) and the final
    canvas write-back. The canvas (stored canvas+pos, in (position, batch)
    layout so per-pixel updates are single-tile sublane writes) is the
    OUTPUT ref itself; the 4-tap type-A masked input conv, the block stack,
    the output head, the Bernoulli draw (uniform < sigmoid, exactly
    jax.random.bernoulli's definition) and the inpainting merge all happen
    in-kernel. Per-pixel XLA op count: zero.

    Attention runs on the MXU, not the VPU. The first-cut per-head VPU
    formulation (broadcast multiply + minor-lane reduce over (L, n, d_k))
    measured 98.7 img/s at n=16 — SLOWER than the per-position fused step —
    because minor-dim reductions are cross-lane shuffle chains. Mosaic also
    cannot shape-cast across the sublane/lane boundary ((n, c) -> (1, n*c)),
    so everything is expressed with static 0/1 masks instead of reshapes:

    - caches are FLAT, K (L, n*c_k) / V (L, n*c_v), sample-major columns
      p = j*c + cc; a row is built as sum_sublanes(tile(k, n) * fsel) where
      fsel[j, p] = [p // c == j];
    - scores fold q into the K operand: S (L, n*H) =
      (Kflat * q_row) @ qsel, with q_row the fsel-flattened scaled q and
      qsel[p, (j,h)] = [p in sample j, head h] summing each group — ONE
      matmul for all heads and samples;
    - softmax normalizes S columnwise (sublane reduces, cheap), then
      E (L, n*H) is expanded to per-channel columns Eexp = E @ expsel and
      the weighted sum is a columnwise product-reduce
      attn_row = sum_L(Eexp * Vflat) (1, n*c_v);
    - the output projection consumes attn_row block-diagonally:
      (attn_row * dmask) @ out_w_tiled, where out_w_tiled vertically tiles
      out_w n times — extraction folded into the matmul that was already
      there.
    """
    i = pl.program_id(1)
    wp = w + 2
    c_k = n_heads * d_k
    c_v = n_heads * d_v
    tile = canvas_ref.shape[1]
    scale = 1.0 / (d_k ** 0.5)

    @pl.when(i == 0)
    def _init():
        canvas_ref[:] = canvas0_ref[:]
        kf_ref[:] = jnp.zeros_like(kf_ref)
        vf_ref[:] = jnp.zeros_like(vf_ref)

    row = i // w
    col = i % w
    p0 = row * wp + col

    # --- masked 3x3 type-A input conv at (row, col): 4 live taps. ---
    patch = jnp.concatenate(
        [canvas_ref[pl.ds(p0, 1), :], canvas_ref[pl.ds(p0 + 1, 1), :],
         canvas_ref[pl.ds(p0 + 2, 1), :], canvas_ref[pl.ds(p0 + wp, 1), :]],
        axis=0)  # (4, n) raw canvas values
    pos_taps = jnp.concatenate(
        [pos_ref[pl.ds(p0, 1), :], pos_ref[pl.ds(p0 + 1, 1), :],
         pos_ref[pl.ds(p0 + 2, 1), :], pos_ref[pl.ds(p0 + wp, 1), :]],
        axis=0)  # (4, 1)
    patch = patch + pos_taps
    x = jax.lax.dot_general(patch, in_w4[:],
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + in_b[:]

    pos_l = jax.lax.broadcasted_iota(jnp.int32, (seq_len, 1), 0)
    valid = pos_l <= i  # (L, 1), broadcasts over the batch lane dim

    def flat_row(vals, fsel):
        """(n, c) -> (1, n*c) sample-major row, no shape cast."""
        rep = jnp.concatenate([vals] * tile, axis=1)        # (n, n*c)
        return jnp.sum(rep * fsel, axis=0, keepdims=True)

    for b in range(n_blocks):
        t = _ln(x, ln1_w[b], ln1_b[b])
        qkv = jnp.dot(t, qkv_w[b], preferred_element_type=jnp.float32) \
            + qkv_b[b]
        k_i = qkv[:, c_k:2 * c_k]                               # (n, c_k)
        v_i = qkv[:, 2 * c_k:]                                  # (n, c_v)
        kf_ref[b, pl.ds(i, 1), :] = flat_row(
            k_i, fselk_ref[:]).astype(kf_ref.dtype)
        vf_ref[b, pl.ds(i, 1), :] = flat_row(
            v_i, fselv_ref[:]).astype(vf_ref.dtype)

        q_row = flat_row(qkv[:, :c_k] * scale, fselk_ref[:])    # (1, n*c_k)
        kflat = kf_ref[b].astype(jnp.float32)                   # (L, n*c_k)
        s = jax.lax.dot_general(kflat * q_row, qsel_ref[:],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(valid, s, _NEG_INF)                       # (L, n*H)
        m = jnp.max(s, axis=0, keepdims=True)                   # (1, n*H)
        e = jnp.where(valid, jnp.exp(s - m), 0.0)
        e = e / jnp.sum(e, axis=0, keepdims=True)
        eexp = jnp.dot(e, expsel_ref[:],
                       preferred_element_type=jnp.float32)      # (L, n*c_v)
        vflat = vf_ref[b].astype(jnp.float32)                   # (L, n*c_v)
        attn_row = jnp.sum(eexp * vflat, axis=0, keepdims=True)
        attn = jnp.dot(attn_row * dmask_ref[:], out_w[b],
                       preferred_element_type=jnp.float32) + out_b[b]
        x1 = x + attn
        tt = _ln(x1, ln2_w[b], ln2_b[b])
        hmid = _gelu_exact(
            jnp.dot(tt, mlp1_w[b], preferred_element_type=jnp.float32)
            + mlp1_b[b])
        mout = jnp.dot(hmid, mlp2_w[b],
                       preferred_element_type=jnp.float32) + mlp2_b[b]
        x = x + (x1 + mout)  # block residual + model-level extra skip

    act = _ln(x, lnf_w[0], lnf_b[0])
    logits = jnp.dot(act, head_w[:],
                     preferred_element_type=jnp.float32) + head_b[:]  # (n, 1)
    prob = jax.nn.sigmoid(logits)
    sampled = (u_ref[0] < prob).astype(jnp.float32)             # (n, 1)
    sampled_row = jnp.transpose(sampled, (1, 0))                # (1, n)

    p_write = (row + 1) * wp + (col + 1)
    cur = canvas_ref[pl.ds(p_write, 1), :]                      # (1, n)
    merged = jnp.where(cur < 0.0, sampled_row, cur)
    canvas_ref[pl.ds(p_write, 1), :] = merged


def fused_sample_loop(canvas0, pos_pad, uniforms, weights, n_blocks, n_heads,
                      d_k, d_v, h, w, cache_dtype=jnp.float32, tile=None,
                      interpret=False):
    """Runs the whole ImageGPT raster-scan sampler as ONE Pallas call.

    Args:
        canvas0: (Hp*Wp, N) f32 — zero-padded canvas flattened to
            (position, batch) layout; inpainting markers are values < 0.
            (The positional embedding is added at conv-tap read time, so
            canvas writes stay exact — sampled pixels are stored as
            bit-exact 0.0/1.0.)
        pos_pad: (Hp*Wp, 1) f32 — the padded positional embedding (c == 1).
        uniforms: (L, N, 1) f32 — per-position uniform draws, exactly
            jax.random.uniform(split(rng, L)[i], (N, 1)).
        weights: dict from :func:`stack_image_gpt_weights` plus ``in_w4`` (4,
            C) live taps of the masked 3x3 type-A input conv, ``in_b`` (1,
            C), ``head_w`` (C, 1), ``head_b`` (1, 1).
        tile: batch tile size; each tile runs a full raster pass with its
            own VMEM-resident cache, chunked by an outer ``lax.fori_loop``
            over dynamic slices (the Mosaic lane-dim rule forbids sub-128
            lane BLOCKS of a wider array, but a whole array of ``tile``
            lanes is fine; ``lax.map`` would stage its stacked operands
            into scoped VMEM and OOM, and unrolling recompiles the kernel
            per tile). Default: whole batch.
    Returns:
        (Hp*Wp, N) f32 — the final canvas (still + pos; subtract pos_pad and
        unflatten outside).
    """
    lp, n = canvas0.shape
    seq_len = h * w
    if tile is None:
        tile = n
    assert n % tile == 0, (n, tile)
    c_k = n_heads * d_k
    c_v = n_heads * d_v
    f = c_k + c_v
    w_order = ("ln1_w", "ln1_b", "qkv_w", "qkv_b", "out_w_tiled", "out_b",
               "ln2_w", "ln2_b", "mlp1_w", "mlp1_b", "mlp2_w", "mlp2_b",
               "lnf_w", "lnf_b")

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda *_, nd=nd: (0,) * nd)

    # Static selectors for the MXU attention (see _sample_loop_kernel's
    # docstring): row-flatten masks, the scores group-sum, the E column
    # expansion, and the block-diagonal redistribution of attn_row.
    j_n = np.arange(tile)
    p_k = np.arange(tile * c_k)
    p_v = np.arange(tile * c_v)
    col_jh = np.arange(tile * n_heads)
    fselk = (p_k[None, :] // c_k == j_n[:, None]).astype(np.float32)
    fselv = (p_v[None, :] // c_v == j_n[:, None]).astype(np.float32)
    qsel = ((p_k[:, None] // c_k == col_jh[None, :] // n_heads)
            & ((p_k[:, None] % c_k) // d_k == col_jh[None, :] % n_heads)
            ).astype(np.float32)
    expsel = ((col_jh[:, None] // n_heads == p_v[None, :] // c_v)
              & (col_jh[:, None] % n_heads == (p_v[None, :] % c_v) // d_v)
              ).astype(np.float32)
    dmask = fselv
    fselk = jnp.asarray(fselk)
    fselv = jnp.asarray(fselv)
    qsel = jnp.asarray(qsel)
    expsel = jnp.asarray(expsel)
    dmask = jnp.asarray(dmask)
    weights = dict(weights)
    weights["out_w_tiled"] = jnp.tile(weights["out_w"], (1, tile, 1))

    kernel = functools.partial(
        _sample_loop_kernel, n_blocks=n_blocks, n_heads=n_heads, d_k=d_k,
        d_v=d_v, h=h, w=w, seq_len=seq_len)
    cache_bytes = n_blocks * seq_len * tile * f * jnp.dtype(
        cache_dtype).itemsize

    def one_tile(canvas_c, uniforms_c):
        in_specs = [
            pl.BlockSpec((lp, tile), lambda t, i: (0, 0)),       # canvas0
            const_spec(pos_pad.shape),                           # pos_pad
            pl.BlockSpec((1, tile, 1), lambda t, i: (i, 0, 0)),  # uniforms
            const_spec(weights["in_w4"].shape),
            const_spec(weights["in_b"].shape),
            const_spec(weights["head_w"].shape),
            const_spec(weights["head_b"].shape),
            const_spec(fselk.shape),
            const_spec(fselv.shape),
            const_spec(qsel.shape),
            const_spec(expsel.shape),
            const_spec(dmask.shape),
        ] + [const_spec(weights[k].shape) for k in w_order]
        return pl.pallas_call(
            kernel,
            grid=(1, seq_len),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((lp, tile), lambda t, i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((lp, tile), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_blocks, seq_len, tile * c_k), cache_dtype),
                pltpu.VMEM((n_blocks, seq_len, tile * c_v), cache_dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(cache_bytes + 48 * 1024 * 1024,
                                     120 * 1024 * 1024),
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(canvas_c, pos_pad, uniforms_c, weights["in_w4"], weights["in_b"],
          weights["head_w"], weights["head_b"], fselk, fselv, qsel, expsel,
          dmask, *[weights[k] for k in w_order])

    if tile == n:
        return one_tile(canvas0, uniforms)
    # fori_loop + dynamic slices, NOT lax.map or unrolling: map's stacked
    # carry operands get forced into scoped VMEM and OOM at large n
    # (measured at n=256), and unrolled calls compile the kernel once per
    # tile (~19 min at n=256). This compiles ONE kernel for any n.
    nt = n // tile

    def body(t, acc):
        c = jax.lax.dynamic_slice(canvas0, (0, t * tile), (lp, tile))
        u = jax.lax.dynamic_slice(uniforms, (0, t * tile, 0),
                                  (seq_len, tile, 1))
        return jax.lax.dynamic_update_slice(acc, one_tile(c, u),
                                            (0, t * tile))

    return jax.lax.fori_loop(0, nt, body,
                             jnp.zeros((lp, n), jnp.float32))
