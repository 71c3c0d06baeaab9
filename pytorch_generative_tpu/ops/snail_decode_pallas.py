"""Whole-loop fused sampler for PixelSNAIL (Pallas).

Same construction as ops/decode_pallas.py::fused_sample_loop for ImageGPT:
the ENTIRE raster scan runs in one pallas_call with grid (batch_tiles, H*W).
All per-pixel state lives in VMEM scratch that persists across grid steps —
the per-(block, residual-block) elu/mid activation maps for the 2x2 convs,
the per-block attention K/V caches, and the canvas (the output ref itself) —
so per pixel there are ZERO XLA ops and zero HBM round-trips. The XLA
incremental sampler (ops/sampling.py::pixel_snail_sample_fast) is
op-dispatch-bound at ~250 tiny ops per pixel; this kernel replaces them with
a handful of (n, C) matmuls and VPU reductions on VMEM-resident state.

Semantics match pixel_snail_sample_fast exactly (same post-merge K/V append,
same strict mask_center attention with the denom==0 guard, same inpainting
merge); the Bernoulli draw is uniform < sigmoid — jax.random.bernoulli's
definition (models/base.py:28-30) — with uniforms precomputed per position
from the same split keys. Equivalence is float-tolerance (MXU/VPU op
ordering), tested in interpret mode in tests/test_sampling.py.

Cache layouts (per batch tile of n samples, f32):
  elu/mid maps: (B, 2*(w+1), n, R*C) ROLLING two-row buffers — the R
    residual blocks packed on the lane axis (R*C = 128 at the reproduce
    config: zero padding waste). The 2x2 pad-1-crop convs at raster position
    (row, col) only ever read conv-cache rows {row, row+1}, so a full
    (h+1)*(w+1) map wastes 14.5x VMEM: logical cache row r lives at parity
    r % 2, the current entry is written at ((row+1) % 2, col+1), and the
    left-pad entry ((row+1) % 2, 0) — stale row-1 data in a rolling buffer —
    is re-zeroed at col == 0. The VMEM saved goes into batch tile (8 -> 32
    at the reproduce config), which quarters the serial tile passes.
  K/V: (B*H, L, n*32) FLAT per-(block, head) slabs, keys zero-padded from
    d_k to the 32-lane slot (padded lanes contribute exactly 0 to scores);
    attention runs on the MXU with static slot masks, mirroring
    decode_pallas.py::_sample_loop_kernel.

Reference parity target: the per-pixel step of
/root/reference/pytorch_generative/models/autoregressive/pixel_snail.py
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
_KSLOT = 32  # per-block lane slot for (zero-padded) keys and values


def _pad_slot(x, n):
    """Zero-pads (n, d) to (n, _KSLOT); Mosaic rejects zero-width
    concatenands, so d == _KSLOT returns x unchanged."""
    d = x.shape[-1]
    if d == _KSLOT:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n, _KSLOT - d), jnp.float32)], axis=-1)


def _elu(x):
    # exp(x)-1, not expm1: Mosaic has no expm1 lowering. The argument is
    # clamped at 0 so the worst cancellation error is ~1e-7 abs (x -> 0-),
    # inside the float-tolerance contract of this sampler.
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _snail_loop_kernel(canvas0_ref, u_ref, fslot_ref, qselt_ref, in_w4, in_b,
                       rb1_w, rb1_b, rb2_w, rb2_b, q_w, q_b, kv_w, kv_b,
                       op_wt, op_b, ro_w, ro_b, ao_w, ao_b, o_w, o_b, h1_w,
                       h1_b, h2_w, h2_b, canvas_ref, elu_c, mid_c, k_all,
                       v_all, *, n_blocks, n_rb, n_heads, d_k, d_v, h, w,
                       c_ch, seq_len):
    i = pl.program_id(1)
    wp = w + 2   # padded canvas width (3x3 input conv, pad 1)
    wc = w + 1   # conv-cache width (2x2 convs, pad-1-crop)
    n = canvas0_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        canvas_ref[:] = canvas0_ref[:]
        elu_c[:] = jnp.zeros_like(elu_c)
        mid_c[:] = jnp.zeros_like(mid_c)
        v_all[:] = jnp.zeros_like(v_all)
        k_all[:] = jnp.zeros_like(k_all)

    row = i // w
    col = i % w

    # --- masked 3x3 type-A input conv (raw canvas, 4 live taps). ---
    p0 = row * wp + col
    patch = jnp.concatenate(
        [canvas_ref[pl.ds(p0, 1), :], canvas_ref[pl.ds(p0 + 1, 1), :],
         canvas_ref[pl.ds(p0 + 2, 1), :], canvas_ref[pl.ds(p0 + wp, 1), :]],
        axis=0)  # (4, n)
    x = jax.lax.dot_general(patch, in_w4[:], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + in_b[:]

    # Conv-cache flat coordinates: LOGICAL entry (r+1, c+1) holds position
    # (r, c); logical row r lives at rolling parity (r % 2) * wc. The 2x2
    # patch at (row, col) reads logical rows {row, row+1} = parities
    # {row % 2, (row + 1) % 2}.
    par_w = ((row + 1) % 2) * wc               # parity row being written
    par_r = (row % 2) * wc                     # parity row of the prev row
    pw2 = par_w + (col + 1)                    # current entry
    taps = (par_r + col, par_r + col + 1, par_w + col, par_w + col + 1)

    @pl.when(col == 0)
    def _zero_left_pad():
        # Left-pad entry of the parity row being (re)used this raster row:
        # stale data from row-2 in a rolling buffer, zero in the full map.
        z = jnp.zeros((1, 1) + elu_c.shape[2:], jnp.float32)
        for bb in range(n_blocks):
            elu_c[bb, pl.ds(par_w, 1), :, :] = z[0]
            mid_c[bb, pl.ds(par_w, 1), :, :] = z[0]

    pos_l = jax.lax.broadcasted_iota(jnp.int32, (seq_len, 1), 0)
    valid = pos_l < i  # strict: mask_center attention

    pos2 = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.float32)
         + (row.astype(jnp.float32) / h - 0.5),
         jnp.zeros((n, 1), jnp.float32)
         + (col.astype(jnp.float32) / w - 0.5)], axis=-1)  # (n, 2)

    def conv2x2(cache_ref, b, lane0, width, wmat, bias):
        """Sum of 4 tap matmuls == the 2x2 pad-1-crop conv at (row, col)."""
        out = bias
        for kk, tp in enumerate(taps):
            tap = cache_ref[b, pl.ds(tp, 1), :, :][0, :, lane0:lane0 + width]
            out = out + jnp.dot(tap, wmat[kk],
                                preferred_element_type=jnp.float32)
        return out

    q_ins = []
    for b in range(n_blocks):
        res = x
        for j in range(n_rb):
            lane0 = j * c_ch
            ev = _elu(res)
            elu_c[b, pl.ds(pw2, 1), :, lane0:lane0 + c_ch] = ev[None]
            mid = _elu(conv2x2(elu_c, b, lane0, c_ch, rb1_w[b, j],
                               rb1_b[b, j]))
            mid_c[b, pl.ds(pw2, 1), :, lane0:lane0 + c_ch] = mid[None]
            out2 = conv2x2(mid_c, b, lane0, c_ch, rb2_w[b, j], rb2_b[b, j])
            res = res + out2[:, :c_ch] * jax.nn.sigmoid(out2[:, c_ch:])

        q_in = jnp.concatenate([pos2, res], axis=-1)       # (n, C+2)
        q = jnp.dot(q_in, q_w[b],
                    preferred_element_type=jnp.float32) + q_b[b]  # (n, H*dk)
        # MXU attention over flat (L, n*_KSLOT) caches — same static-mask
        # algebra as decode_pallas.py::_sample_loop_kernel (the per-head VPU
        # broadcast/minor-lane-reduce formulation is shuffle-chain-bound).
        # Keys/queries are zero-padded to the 32-lane slot, so summing the
        # full slot equals the d_k-dim dot product exactly, and the
        # per-sample block extraction is folded into the (zero-row-padded,
        # vertically tiled) output projection op_wt.
        att = op_b[b]
        for hh in range(n_heads):
            qp = _pad_slot(q[:, hh * d_k:(hh + 1) * d_k] / (d_k ** 0.5), n)
            q_row = jnp.sum(jnp.concatenate([qp] * n, axis=1) * fslot_ref[:],
                            axis=0, keepdims=True)          # (1, n*K)
            kflat = k_all[b * n_heads + hh]                 # (L, n*K)
            s = jax.lax.dot_general(kflat * q_row, qselt_ref[:],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = jnp.where(valid, s, _NEG_INF)               # (L, n)
            m = jnp.max(s, axis=0, keepdims=True)
            m = jnp.where(jnp.isfinite(m), m, 0.0)
            e = jnp.where(valid, jnp.exp(s - m), 0.0)
            den = jnp.sum(e, axis=0, keepdims=True)
            e = e / jnp.where(den == 0.0, 1.0, den)
            eexp = jnp.dot(e, fslot_ref[:],
                           preferred_element_type=jnp.float32)  # (L, n*K)
            attn_row = jnp.sum(eexp * v_all[b * n_heads + hh], axis=0,
                               keepdims=True)               # (1, n*K)
            att = att + jnp.dot(attn_row * fslot_ref[:], op_wt[b, hh],
                                preferred_element_type=jnp.float32)

        res2 = _elu(jnp.dot(_elu(res), ro_w[b],
                            preferred_element_type=jnp.float32) + ro_b[b])
        att2 = _elu(jnp.dot(_elu(att), ao_w[b],
                            preferred_element_type=jnp.float32) + ao_b[b])
        block_out = _elu(jnp.dot(_elu(res2 + att2), o_w[b],
                                 preferred_element_type=jnp.float32) + o_b[b])
        q_ins.append(q_in)
        x = x + block_out

    mid_h = jnp.dot(x, h1_w[:], preferred_element_type=jnp.float32) + h1_b[:]
    logits = jnp.dot(mid_h, h2_w[:],
                     preferred_element_type=jnp.float32) + h2_b[:]  # (n, 1)
    prob = jax.nn.sigmoid(logits)
    sampled = (u_ref[0] < prob).astype(jnp.float32)        # (n, 1)
    sampled_row = jnp.transpose(sampled, (1, 0))           # (1, n)

    p_write = (row + 1) * wp + (col + 1)
    cur = canvas_ref[pl.ds(p_write, 1), :]
    merged = jnp.where(cur < 0.0, sampled_row, cur)
    canvas_ref[pl.ds(p_write, 1), :] = merged
    merged_n = jnp.transpose(merged, (1, 0))               # (n, 1)

    # Post-merge K/V append: k_i/v_i read the *merged* pixel (extra_x).
    for b in range(n_blocks):
        kv_in = jnp.concatenate([q_ins[b], merged_n], axis=-1)  # (n, C+3)
        kv = jnp.dot(kv_in, kv_w[b],
                     preferred_element_type=jnp.float32) + kv_b[b]
        for hh in range(n_heads):
            kh = kv[:, hh * d_k:(hh + 1) * d_k]
            vh = kv[:, n_heads * d_k + hh * d_v:n_heads * d_k
                    + (hh + 1) * d_v]
            kp = _pad_slot(kh, n)
            vp = _pad_slot(vh, n)
            k_row = jnp.sum(jnp.concatenate([kp] * n, axis=1) * fslot_ref[:],
                            axis=0, keepdims=True)          # (1, n*K)
            v_row = jnp.sum(jnp.concatenate([vp] * n, axis=1) * fslot_ref[:],
                            axis=0, keepdims=True)
            k_all[b * n_heads + hh, pl.ds(i, 1), :] = k_row
            v_all[b * n_heads + hh, pl.ds(i, 1), :] = v_row


def stack_pixel_snail_weights(model):
    """Stacks PixelSNAIL parameters for the whole-loop sampler kernel."""
    blocks = model.pixel_snail_blocks
    wm = model.input_conv.weight * model.input_conv.mask   # (3, 3, 1, C)

    def conv2x2_taps(conv):
        # (2, 2, Ci, Co) -> (4, Ci, Co), tap order (0,0),(0,1),(1,0),(1,1).
        return conv.weight.reshape(4, *conv.weight.shape[2:])

    def w1x1(conv):
        return conv.weight[0, 0]

    return {
        "in_w4": jnp.stack([wm[0, 0, 0], wm[0, 1, 0], wm[0, 2, 0],
                            wm[1, 0, 0]]),
        "in_b": model.input_conv.bias[None],
        "rb1_w": jnp.stack([jnp.stack([conv2x2_taps(rb.input_conv)
                                       for rb in blk.residual_blocks])
                            for blk in blocks]),
        "rb1_b": jnp.stack([jnp.stack([rb.input_conv.bias[None]
                                       for rb in blk.residual_blocks])
                            for blk in blocks]),
        "rb2_w": jnp.stack([jnp.stack([conv2x2_taps(rb.output_conv)
                                       for rb in blk.residual_blocks])
                            for blk in blocks]),
        "rb2_b": jnp.stack([jnp.stack([rb.output_conv.bias[None]
                                       for rb in blk.residual_blocks])
                            for blk in blocks]),
        "q_w": jnp.stack([w1x1(blk.attention.q_proj) for blk in blocks]),
        "q_b": jnp.stack([blk.attention.q_proj.bias[None] for blk in blocks]),
        "kv_w": jnp.stack([w1x1(blk.attention.kv_proj) for blk in blocks]),
        "kv_b": jnp.stack([blk.attention.kv_proj.bias[None]
                           for blk in blocks]),
        "op_w": jnp.stack([w1x1(blk.attention.out_proj) for blk in blocks]),
        "op_b": jnp.stack([blk.attention.out_proj.bias[None]
                           for blk in blocks]),
        "ro_w": jnp.stack([w1x1(blk.residual_out) for blk in blocks]),
        "ro_b": jnp.stack([blk.residual_out.bias[None] for blk in blocks]),
        "ao_w": jnp.stack([w1x1(blk.attention_out) for blk in blocks]),
        "ao_b": jnp.stack([blk.attention_out.bias[None] for blk in blocks]),
        "o_w": jnp.stack([w1x1(blk.out) for blk in blocks]),
        "o_b": jnp.stack([blk.out.bias[None] for blk in blocks]),
        "h1_w": w1x1(model.output_conv1),
        "h1_b": model.output_conv1.bias[None],
        "h2_w": w1x1(model.output_conv2),
        "h2_b": model.output_conv2.bias[None],
    }


W_ORDER = ("in_w4", "in_b", "rb1_w", "rb1_b", "rb2_w", "rb2_b", "q_w", "q_b",
           "kv_w", "kv_b", "op_w_tiled", "op_b", "ro_w", "ro_b", "ao_w",
           "ao_b", "o_w", "o_b", "h1_w", "h1_b", "h2_w", "h2_b")


def fused_snail_sample_loop(canvas0, uniforms, weights, n_blocks, n_rb,
                            n_heads, d_k, d_v, h, w, c_ch, tile=None,
                            interpret=False):
    """Runs the whole PixelSNAIL raster-scan sampler as ONE Pallas call.

    Args:
        canvas0: (Hp*Wp, N) f32 — zero-padded raw canvas, (position, batch)
            layout; inpainting markers are values < 0.
        uniforms: (L, N, 1) f32 per-position uniform draws.
        weights: dict from :func:`stack_pixel_snail_weights`.
        c_ch: model channel width (n_channels).
        tile: batch tile; tiles run inside a ``lax.fori_loop`` over inner
            whole-tile pallas_calls (Mosaic forbids sub-128 lane BLOCKS of
            a wider array; a whole ``tile``-lane array is legal, and the
            tile loop is serial on one core either way).
    Returns:
        (Hp*Wp, N) f32 final canvas.
    """
    lp, n = canvas0.shape
    seq_len = h * w
    if tile is None:
        tile = n
    assert n % tile == 0, (n, tile)
    lc = 2 * (w + 1)  # rolling two-row conv caches (kernel docstring)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda *_, nd=nd: (0,) * nd)

    # Static masks for the MXU attention (kernel docstring): fslot flattens
    # per-sample slot rows / expands E / redistributes attn_row; its
    # transpose sums each sample's slot group in the scores matmul. op_w is
    # zero-row-padded to the slot width and vertically tiled per sample so
    # diagonal-block extraction folds into the output projection.
    j_n = np.arange(tile)
    p_s = np.arange(tile * _KSLOT)
    fslot = (p_s[None, :] // _KSLOT == j_n[:, None]).astype(np.float32)
    fslot = jnp.asarray(fslot)
    qselt = fslot.T.copy()
    op_w = weights["op_w"]  # (n_blocks, H*d_v, C)
    opw_heads = op_w.reshape(op_w.shape[0], n_heads, d_v, op_w.shape[-1])
    opw_pad = jnp.pad(opw_heads, ((0, 0), (0, 0), (0, _KSLOT - d_v), (0, 0)))
    weights = dict(weights)
    weights["op_w_tiled"] = jnp.tile(opw_pad, (1, 1, tile, 1))

    kernel = functools.partial(
        _snail_loop_kernel, n_blocks=n_blocks, n_rb=n_rb, n_heads=n_heads,
        d_k=d_k, d_v=d_v, h=h, w=w, c_ch=c_ch, seq_len=seq_len)
    kv_lanes = n_blocks * n_heads * _KSLOT
    cache_bytes = 4 * (2 * n_blocks * lc * tile * n_rb * c_ch
                       + 2 * seq_len * tile * kv_lanes)

    def one_tile(canvas_c, uniforms_c):
        in_specs = [
            pl.BlockSpec((lp, tile), lambda t, i: (0, 0)),
            pl.BlockSpec((1, tile, 1), lambda t, i: (i, 0, 0)),
            const_spec(fslot.shape),
            const_spec(qselt.shape),
        ] + [const_spec(weights[k].shape) for k in W_ORDER]
        scratch = [
            pltpu.VMEM((n_blocks, lc, tile, n_rb * c_ch), jnp.float32),
            pltpu.VMEM((n_blocks, lc, tile, n_rb * c_ch), jnp.float32),
            pltpu.VMEM((n_blocks * n_heads, seq_len, tile * _KSLOT),
                       jnp.float32),                                 # K
            pltpu.VMEM((n_blocks * n_heads, seq_len, tile * _KSLOT),
                       jnp.float32),                                 # V
        ]
        return pl.pallas_call(
            kernel,
            grid=(1, seq_len),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((lp, tile), lambda t, i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((lp, tile), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(cache_bytes + 40 * 1024 * 1024,
                                     120 * 1024 * 1024),
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(canvas_c, uniforms_c, fslot, qselt,
          *[weights[k] for k in W_ORDER])

    if tile == n:
        return one_tile(canvas0, uniforms)
    # fori_loop + dynamic slices, NOT lax.map or unrolling: map's stacked
    # carry operands get forced into scoped VMEM and OOM at large n, and
    # unrolled calls compile the kernel once per tile (~19 min at n=256 for
    # the ImageGPT loop). This compiles ONE kernel for any n.
    nt = n // tile

    def body(t, acc):
        c = jax.lax.dynamic_slice(canvas0, (0, t * tile), (lp, tile))
        u = jax.lax.dynamic_slice(uniforms, (0, t * tile, 0),
                                  (seq_len, tile, 1))
        return jax.lax.dynamic_update_slice(acc, one_tile(c, u),
                                            (0, t * tile))

    return jax.lax.fori_loop(0, nt, body,
                             jnp.zeros((lp, n), jnp.float32))
