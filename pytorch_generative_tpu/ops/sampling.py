"""Fast autoregressive sampling: KV-cache incremental decoding.

The reference samples by running one FULL network forward per pixel
(/root/reference/pytorch_generative/models/base.py:97-120): O(L) forwards of
O(L) positions each. The generic TPU port already turns that into a single
compiled lax.scan (models/base.py here). This module goes further for
transformer models (ImageGPT): per step, only the *new* position's activations
are computed — the masked input conv is evaluated on a 3x3 patch, attention
reads cached K/V, and the MLP/LayerNorm run on one position. Per-step cost
drops from O(L·C^2 + L^2·C) to O(C^2 + L·C), an ~L-fold reduction (L = H·W =
784 on MNIST), while remaining numerically equivalent to the naive sampler
(tested in tests/test_sampling.py).

This realizes the reference's own TODO at
/root/reference/pytorch_generative/nn/attention.py:196-202 ("we can do O(N)
work during sampling by storing previous activations").
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _masked_conv_at(padded_x, weight, mask, bias, row, col, n):
    """Evaluates a masked conv at one output position.

    Args:
        padded_x: (N, H + 2p, W + 2p, Cin) input, already zero-padded.
        weight: (kh, kw, Cin, Cout) kernel; mask: (kh, kw, 1, 1).
        row/col: output position (traced); n: batch size.
    Returns:
        (N, Cout) activations.
    """
    kh, kw = weight.shape[:2]
    cin = padded_x.shape[-1]
    patch = jax.lax.dynamic_slice(
        padded_x, (0, row, col, 0), (n, kh, kw, cin))
    out = jnp.einsum("nhwc,hwco->no", patch, weight * mask)
    if bias is not None:
        out = out + bias
    return out


def _conv1x1(x, conv):
    """Applies a 1x1 Conv2d module to per-position activations (N, C)."""
    y = x @ conv.weight[0, 0]
    if conv.bias is not None:
        y = y + conv.bias
    return y


def _run_segmented(step_for_window, carry, seq_len, rngs):
    """Drives segmented KV-cache decoding.

    Pixels in segment r only ever attend to positions < (r+1)*seg, so each
    segment's scan reads a prefix-static slice of the cache — roughly halving
    cache traffic vs attending over the full (mostly empty) cache at every
    pixel. Identical math (masked softmax over a prefix), so draws match the
    naive samplers exactly.

    Args:
        step_for_window: fn(window) -> scan step whose attention reads only
            the first `window` cache positions.
        carry: Initial scan carry.
        seq_len: Total number of decode positions.
        rngs: (seq_len, ...) per-position RNG keys.
    Returns:
        The final carry.
    """
    all_ids = jnp.arange(seq_len)
    n_segments = 7 if seq_len % 7 == 0 else (4 if seq_len % 4 == 0 else 1)
    seg = seq_len // n_segments
    for r in range(n_segments):
        sl = slice(r * seg, (r + 1) * seg)
        carry, _ = jax.lax.scan(step_for_window((r + 1) * seg), carry,
                                (all_ids[sl], rngs[sl]))
    return carry


def pixel_cnn_sample_fast(model, rng, n_samples=None, conditioned_on=None):
    """Incremental-decoding sampler for PixelCNN via per-layer activation
    caching (Ramachandran et al. 2017, "Fast Generation for Convolutional
    Autoregressive Models").

    Only spatially-mixing layers need caches. In PixelCNN those are the 7x7
    masked input conv (reads the canvas, already cached by construction) and
    each residual block's 3x3 causal conv, whose input h1 = relu(conv1(relu(x)))
    is cached per block. Everything else is pointwise, so per pixel the cost is
    O(sum_k k^2 * C^2) instead of a full O(H*W) forward — an ~H*W-fold
    reduction. Exact equivalence with the naive sampler is tested.
    """
    conditioned_on = model._get_conditioned_on(n_samples, conditioned_on)
    n, h, w, c = conditioned_on.shape

    in_conv = model.input_conv
    kh, kw = in_conv.weight.shape[:2]
    pad_in = kh // 2  # 7x7, padding=3
    padded_canvas = jnp.pad(
        conditioned_on, ((0, 0), (pad_in, pad_in), (pad_in, pad_in), (0, 0)))

    # One h1-cache per residual block, zero-padded by 1 for the 3x3 conv.
    h1_caches = tuple(
        jnp.zeros((n, h + 2, w + 2, block.conv1.weight.shape[-1]))
        for block in model.causal_layers)

    def step(carry, inputs):
        padded_canvas, h1_caches = carry
        i, step_rng = inputs
        row, col = i // w, i % w

        x = _masked_conv_at(padded_canvas, in_conv.weight, in_conv.mask,
                            in_conv.bias, row, col, n)  # (n, 2*res_channels)

        new_caches = []
        for block, cache in zip(model.causal_layers, h1_caches):
            # conv2's actual input: relu(conv1(relu(x))) — that's what's cached.
            h1 = jax.nn.relu(_conv1x1(jax.nn.relu(x), block.conv1))
            cache = jax.lax.dynamic_update_slice(
                cache, h1[:, None, None, :], (0, row + 1, col + 1, 0))
            new_caches.append(cache)
            h2 = jax.nn.relu(_masked_conv_at(
                cache, block.conv2.weight, block.conv2.mask, block.conv2.bias,
                row, col, n))
            net_out = _conv1x1(h2, block.conv3)
            # Model adds x + layer(x) where layer(x) = x + net(x)
            # (pixel_cnn.py:106-110's intentional double residual).
            x = 2.0 * x + net_out

        logits = _conv1x1(jax.nn.relu(_conv1x1(jax.nn.relu(x),
                                               model.head_conv1)),
                          model.head_conv2)
        sampled = model.sample_fn(step_rng, logits).reshape(n, 1, 1, c)
        current = jax.lax.dynamic_slice(
            padded_canvas, (0, row + pad_in, col + pad_in, 0), (n, 1, 1, c))
        merged = jnp.where(current < 0, sampled, current)
        padded_canvas = jax.lax.dynamic_update_slice(
            padded_canvas, merged, (0, row + pad_in, col + pad_in, 0))
        return (padded_canvas, tuple(new_caches)), None

    idxs = jnp.arange(h * w)
    rngs = jax.random.split(rng, h * w)
    (padded_canvas, _), _ = jax.lax.scan(
        step, (padded_canvas, h1_caches), (idxs, rngs))
    return padded_canvas[:, pad_in:-pad_in, pad_in:-pad_in, :]


def gated_pixel_cnn_sample_fast(model, rng, n_samples=None, conditioned_on=None):
    """Incremental-decoding sampler for GatedPixelCNN.

    Per layer, the two consecutive *linear* vertical-stack convolutions
    (1xN then (N//2+1)x1, gated_pixel_cnn.py:62-85) compose into one effective
    (N//2+1)xN kernel reading strictly-above rows, so the v-stack value at one
    pixel is a single small einsum over the cached layer-input map. The
    horizontal stack reads a leftward 1x(N//2+1) window of the cached h-input
    row. Exact equivalence with the naive sampler is tested.
    """
    conditioned_on = model._get_conditioned_on(n_samples, conditioned_on)
    n, h, w, c = conditioned_on.shape
    layers = (model.input_layer,) + model.gated_layers

    def layer_geometry(layer):
        k = layer.vstack_1xN.weight.shape[1]
        p = (k - 1) // 2
        kk = k // 2 + 1
        return k, p, kk

    def effective_vkernel(layer):
        """Composes vstack_1xN (1,k,Ci,Co1) with vstack_Nx1 (kk,1,Co1,Co2)
        into K_eff (kk,k,Ci,Co2) plus the composed bias (the 1xN bias flows
        through every row tap of the Nx1 kernel)."""
        w1 = layer.vstack_1xN.weight[0]      # (k, Ci, Co1)
        b1 = layer.vstack_1xN.bias
        w2 = layer.vstack_Nx1.weight[:, 0]   # (kk, Co1, Co2)
        b_eff = layer.vstack_Nx1.bias
        k_eff = jnp.einsum("bim,amo->abio", w1, w2)
        if b1 is not None:
            b_eff = b_eff + jnp.einsum("m,amo->o", b1, w2)
        return k_eff, b_eff

    geos = [layer_geometry(layer) for layer in layers]
    v_kernels = [effective_vkernel(layer) for layer in layers]
    max_p = max(p for _, p, _ in geos)

    # Caches: layer 0 reads the canvas for both streams; each gated layer
    # reads the previous layer's v/h outputs. One shared padding (max needs).
    vpad_t = max(p + 1 for _, p, _ in geos)   # rows above
    cpad = max_p + 1                           # columns both sides
    canvas = jnp.pad(conditioned_on,
                     ((0, 0), (vpad_t, 0), (cpad, cpad), (0, 0)))

    def zero_cache(channels):
        return jnp.zeros((n, h + vpad_t, w + 2 * cpad, channels))

    v_caches0 = tuple(zero_cache(layer.vstack_1x1.weight.shape[2])
                      for layer in layers[1:])
    h_caches0 = tuple(zero_cache(layer.hstack_1xN.weight.shape[2])
                      for layer in layers[1:])

    def gated(y):
        half = y.shape[-1] // 2
        return jnp.tanh(y[..., :half]) * jax.nn.sigmoid(y[..., half:])

    def vpre_link_at(layer, geo, vker, v_cache, row, col):
        """The v-stack pre-activation + link at (row, col): reads strictly-above
        rows of the cached layer-input map, so it never sees the current pixel."""
        k, p, kk = geo
        k_eff, b_eff = vker
        # Cache coords: (row + vpad_t, col + cpad) holds (row, col).
        r0 = row + vpad_t - (p + 1)
        c0 = col + cpad - p
        patch = jax.lax.dynamic_slice(
            v_cache, (0, r0, c0, 0), (n, kk, k, v_cache.shape[-1]))
        vpre = jnp.einsum("nabc,abco->no", patch, k_eff) + b_eff
        return vpre, _conv1x1(vpre, layer.link)

    def h_at(layer, geo, link, h_cache, h_val, row, col):
        """The h-stack output + skip at (row, col). The cached h row includes
        the current position's value (h_val, written by the caller)."""
        k, p, kk = geo
        mc = int(layer.mask_center)
        hc0 = col + cpad - (p + mc)
        hpatch = jax.lax.dynamic_slice(
            h_cache, (0, row + vpad_t, hc0, 0), (n, 1, kk, h_cache.shape[-1]))
        w_h = layer.hstack_1xN.weight[0]  # (kk, Ci, Co)
        hpre = link + jnp.einsum("nac,aco->no", hpatch[:, 0], w_h)
        if layer.hstack_1xN.bias is not None:
            hpre = hpre + layer.hstack_1xN.bias
        hg = gated(hpre)
        skip = _conv1x1(hg, layer.hstack_skip)
        h_out = _conv1x1(hg, layer.hstack_residual)
        if not layer.mask_center:
            h_out = h_out + h_val
        return h_out, skip

    pos_ids = jnp.arange(h * w)

    def step(carry, inputs):
        canvas, v_caches, h_caches = carry
        i, step_rng = inputs
        row, col = i // w, i % w

        # --- Pass 1 (pre-merge): h stream + skips. Nothing here may read the
        # current canvas pixel (the v patches are strictly above; the h window
        # of the input layer is strictly left since it's mask_center=True). ---
        vpres, links = [], []
        vpre, link = vpre_link_at(layers[0], geos[0], v_kernels[0], canvas,
                                  row, col)
        vpres.append(vpre)
        links.append(link)
        h_out, skip_sum = h_at(layers[0], geos[0], link, canvas,
                               jnp.zeros((n, c)), row, col)

        new_h = []
        for li, layer in enumerate(layers[1:]):
            h_cache = jax.lax.dynamic_update_slice(
                h_caches[li], h_out[:, None, None, :],
                (0, row + vpad_t, col + cpad, 0))
            new_h.append(h_cache)
            vpre, link = vpre_link_at(layer, geos[1 + li], v_kernels[1 + li],
                                      v_caches[li], row, col)
            vpres.append(vpre)
            links.append(link)
            h_out, skip = h_at(layer, geos[1 + li], link, h_cache, h_out, row,
                               col)
            skip_sum = skip_sum + skip

        out = _conv1x1(jax.nn.relu(skip_sum), model.head_conv1)
        logits = _conv1x1(jax.nn.relu(out), model.head_conv2)
        sampled = model.sample_fn(step_rng, logits).reshape(n, 1, 1, c)
        current = jax.lax.dynamic_slice(
            canvas, (0, row + vpad_t, col + cpad, 0), (n, 1, 1, c))
        merged = jnp.where(current < 0, sampled, current)
        canvas = jax.lax.dynamic_update_slice(
            canvas, merged, (0, row + vpad_t, col + cpad, 0))

        # --- Pass 2 (post-merge): v-stack outputs at (row, col). These include
        # vstack_1x1 of the layer input AT the current pixel, so they must see
        # the merged value (later pixels' naive forwards would). ---
        v_val = merged.reshape(n, c)
        new_v = list(v_caches)
        for li, layer in enumerate(layers):
            v_out = gated(vpres[li] + _conv1x1(v_val, layer.vstack_1x1))
            if li < len(layers) - 1:  # the last layer's v output is unused
                new_v[li] = jax.lax.dynamic_update_slice(
                    new_v[li], v_out[:, None, None, :],
                    (0, row + vpad_t, col + cpad, 0))
            v_val = v_out

        return (canvas, tuple(new_v), tuple(new_h)), None

    rngs = jax.random.split(rng, h * w)
    (canvas, _, _), _ = jax.lax.scan(
        step, (canvas, v_caches0, h_caches0), (pos_ids, rngs))
    return canvas[:, vpad_t:, cpad:-cpad, :]


def _snail_loop_eligible(model):
    """Whole-loop kernel eligibility for PixelSNAIL (mirrors
    :func:`_whole_loop_eligible`)."""
    from pytorch_generative_tpu.models.base import _default_sample_fn

    h, w, c = model.in_shape
    conv = model.input_conv
    return (c == 1
            and model.output_conv2.weight.shape[-1] == 1
            and model.sample_fn is _default_sample_fn
            and conv.weight.shape[:3] == (3, 3, 1)
            and conv.padding == ((1, 1), (1, 1)))


def _snail_loop_tile(model, n):
    """Largest batch tile whose VMEM-resident caches stay under ~72 MB."""
    from pytorch_generative_tpu.ops.snail_decode_pallas import _KSLOT

    h, w, _ = model.in_shape
    blocks = model.pixel_snail_blocks
    n_rb = len(blocks[0].residual_blocks)
    c_ch = model.input_conv.weight.shape[-1]
    n_heads = blocks[0].attention.n_heads
    # elu/mid conv caches are rolling two-row buffers (2*(w+1) entries, not
    # (h+1)*(w+1) — snail_decode_pallas.py docstring), so K/V dominates.
    per_row = 4 * (2 * len(blocks) * 2 * (w + 1) * n_rb * c_ch
                   + 2 * h * w * len(blocks) * n_heads * _KSLOT)
    budget = 72 * 1024 * 1024
    tile = n
    while tile > 1 and (tile * per_row > budget or n % tile != 0):
        tile //= 2
    return tile if tile * per_row <= budget and n % tile == 0 else None


def _pixel_snail_sample_loop(model, rng, n_samples, conditioned_on,
                             interpret=False, tile=None):
    """Whole-raster-scan PixelSNAIL sampling as ONE Pallas kernel
    (ops/snail_decode_pallas.py). Same semantics as
    :func:`pixel_snail_sample_fast` to float tolerance."""
    from pytorch_generative_tpu.ops import snail_decode_pallas as sdp

    conditioned_on = model._get_conditioned_on(n_samples, conditioned_on)
    n, h, w, c = conditioned_on.shape
    seq_len = h * w
    blocks = model.pixel_snail_blocks
    attn0 = blocks[0].attention
    n_heads = attn0.n_heads
    d_k = attn0.embed_channels // n_heads
    d_v = attn0.out_channels // n_heads
    c_ch = model.input_conv.weight.shape[-1]
    if tile is None:
        tile = _snail_loop_tile(model, n)
    assert tile is not None and n % tile == 0

    pad = 1
    padded_canvas = jnp.pad(
        conditioned_on, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    canvas0 = padded_canvas[..., 0].reshape(n, -1).T     # (Lp, n)
    uniforms = jax.vmap(lambda k: jax.random.uniform(k, (n, 1)))(
        jax.random.split(rng, seq_len))
    weights = sdp.stack_pixel_snail_weights(model)
    out = sdp.fused_snail_sample_loop(
        canvas0, uniforms, weights, len(blocks),
        len(blocks[0].residual_blocks), n_heads, d_k, d_v, h, w, c_ch,
        tile=tile, interpret=interpret)
    canvas = out.T.reshape(n, h + 2 * pad, w + 2 * pad, 1)
    return canvas[:, pad:-pad, pad:-pad, :]


def pixel_snail_sample_fast(model, rng, n_samples=None, conditioned_on=None,
                            use_loop_kernel=None):
    """Incremental-decoding sampler for PixelSNAIL: per-layer activation caches
    for the 2x2 residual convs + per-block attention KV caches.

    On TPU (auto mode), eligible models run the whole-loop Pallas kernel
    instead (ops/snail_decode_pallas.py — the entire raster scan in one
    kernel, caches VMEM-resident; PGT_SAMPLE_LOOP=0 or
    PGT_NO_FUSED_DECODE=1 disables).

    Correctness subtleties handled exactly:
      * All conv/residual features at position i depend only on canvas pixels
        < i (the input conv is mask_center=True), so they can be computed
        before pixel i is sampled.
      * The attention k/v at position i read the *raw image* (extra_x) at i,
        so k_i/v_i are appended only AFTER pixel i is merged into the canvas —
        matching the naive sampler, where later forwards see the merged value.
      * mask_center=True attention: position i attends strictly to < i; i=0
        attends to nothing and contributes exactly out_proj(0) (the bias).
    Exact equivalence with the naive sampler is tested.
    """
    if use_loop_kernel is None:
        n = (n_samples if n_samples is not None else conditioned_on.shape[0])
        tile = _snail_loop_tile(model, n)
        # nt <= 2: the serial-tile passes overtake the XLA path's batch
        # scaling past two passes — measured at the bench config with the
        # rolling two-row conv caches (tile=32): n=16 (1 tile) 292 vs 119
        # img/s, n=64 (2 tiles) 752 vs 373, n=256 (8 tiles) 1021 vs 1035
        # (XLA's batch scaling wins the near-tie).
        use_loop_kernel = (jax.default_backend() != "cpu"
                           and os.environ.get("PGT_NO_FUSED_DECODE") != "1"
                           and os.environ.get("PGT_SAMPLE_LOOP", "1") != "0"
                           and _snail_loop_eligible(model)
                           and (tile or 0) >= 8 and n // tile <= 2)
    if use_loop_kernel:
        return _pixel_snail_sample_loop(model, rng, n_samples, conditioned_on)

    conditioned_on = model._get_conditioned_on(n_samples, conditioned_on)
    n, h, w, c = conditioned_on.shape
    seq_len = h * w
    n_blocks = len(model.pixel_snail_blocks)
    attn0 = model.pixel_snail_blocks[0].attention
    n_heads = attn0.n_heads
    d_k = attn0.embed_channels // n_heads
    d_v = attn0.out_channels // n_heads
    n_rb = len(model.pixel_snail_blocks[0].residual_blocks)
    n_channels = model.input_conv.weight.shape[-1]

    in_conv = model.input_conv
    pad = 1  # 3x3 input conv, padding=1
    padded_canvas = jnp.pad(conditioned_on,
                            ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    # Per (block, residual-block): caches of elu(x) and of the mid features
    # mid = elu(input_conv(elu(x))). 2x2 convs with pad 1 + crop read the
    # (r-1..r, c-1..c) window, so a 1-pixel top/left zero pad suffices.
    def zero_maps(channels):
        return tuple(
            tuple(jnp.zeros((n, h + 1, w + 1, channels)) for _ in range(n_rb))
            for _ in range(n_blocks))

    elu_caches0 = zero_maps(n_channels)
    mid_caches0 = zero_maps(n_channels)
    k_cache0 = jnp.zeros((n_blocks, n, n_heads, seq_len, d_k))
    v_cache0 = jnp.zeros((n_blocks, n, n_heads, seq_len, d_v))

    def conv2x2_at(cache, conv, row, col):
        """Evaluates a 2x2 conv (pad-1-crop semantics) at (row, col) from a
        (n, h+1, w+1, C) cache whose (r+1, c+1) entry holds position (r, c)."""
        patch = jax.lax.dynamic_slice(
            cache, (0, row, col, 0), (n, 2, 2, cache.shape[-1]))
        out = jnp.einsum("nhwc,hwco->no", patch, conv.weight)
        return out + conv.bias if conv.bias is not None else out

    def gated_identity(y):
        half = y.shape[-1] // 2
        return y[..., :half] * jax.nn.sigmoid(y[..., half:])

    # Segment r's pixels attend strictly below (r+1)*seg, so the scores read
    # a prefix-static cache slice (see image_gpt_sample_fast); `window` is
    # bound per segment via functools.partial.
    def step(carry, inputs, *, window):
        pos_ids = jnp.arange(window)
        padded_canvas, elu_caches, mid_caches, k_cache, v_cache = carry
        i, step_rng = inputs
        row, col = i // w, i % w
        pos_val = jnp.broadcast_to(
            jnp.stack([row.astype(jnp.float32) / h - 0.5,
                       col.astype(jnp.float32) / w - 0.5]), (n, 2))

        x = _masked_conv_at(padded_canvas, in_conv.weight, in_conv.mask,
                            in_conv.bias, row, col, n)  # (n, n_channels)

        new_elu, new_mid = [], []
        pending_kv = []  # (block_idx, q_input at i) -> kv appended post-merge.
        for b, block in enumerate(model.pixel_snail_blocks):
            res = x
            block_elu, block_mid = [], []
            for j, rb in enumerate(block.residual_blocks):
                ecache, mcache = elu_caches[b][j], mid_caches[b][j]
                ecache = jax.lax.dynamic_update_slice(
                    ecache, jax.nn.elu(res)[:, None, None, :],
                    (0, row + 1, col + 1, 0))
                mid = jax.nn.elu(conv2x2_at(ecache, rb.input_conv, row, col))
                mcache = jax.lax.dynamic_update_slice(
                    mcache, mid[:, None, None, :], (0, row + 1, col + 1, 0))
                out = gated_identity(conv2x2_at(mcache, rb.output_conv,
                                                row, col))
                res = res + out
                block_elu.append(ecache)
                block_mid.append(mcache)
            new_elu.append(tuple(block_elu))
            new_mid.append(tuple(block_mid))

            # Attention at i over cached k/v of positions < i (mask_center).
            q_in = jnp.concatenate([pos_val, res], axis=-1)
            q = _conv1x1(q_in, block.attention.q_proj).reshape(n, n_heads, d_k)
            scores = jnp.einsum("nhd,nhld->nhl", q,
                                k_cache[b, :, :, :window]) / jnp.sqrt(
                jnp.asarray(d_k, x.dtype))
            scores = jnp.where(pos_ids < i, scores, -jnp.inf)
            maxval = jnp.max(scores, axis=-1, keepdims=True)
            maxval = jnp.where(jnp.isfinite(maxval), maxval, 0.0)
            unnorm = jnp.where(pos_ids < i, jnp.exp(scores - maxval), 0.0)
            denom = jnp.sum(unnorm, axis=-1, keepdims=True)
            probs = unnorm / jnp.where(denom == 0.0, 1.0, denom)
            attn = jnp.einsum("nhl,nhlv->nhv", probs, v_cache[b, :, :, :window])
            attn = _conv1x1(attn.reshape(n, n_heads * d_v),
                            block.attention.out_proj)
            pending_kv.append((b, q_in))

            res2 = jax.nn.elu(_conv1x1(jax.nn.elu(res), block.residual_out))
            attn2 = jax.nn.elu(_conv1x1(jax.nn.elu(attn), block.attention_out))
            block_out = jax.nn.elu(_conv1x1(jax.nn.elu(res2 + attn2),
                                            block.out))
            x = x + block_out

        logits = _conv1x1(_conv1x1(x, model.output_conv1), model.output_conv2)
        sampled = model.sample_fn(step_rng, logits).reshape(n, 1, 1, c)
        current = jax.lax.dynamic_slice(
            padded_canvas, (0, row + pad, col + pad, 0), (n, 1, 1, c))
        merged = jnp.where(current < 0, sampled, current)
        padded_canvas = jax.lax.dynamic_update_slice(
            padded_canvas, merged, (0, row + pad, col + pad, 0))

        # Append k_i/v_i from the *merged* pixel value (extra_x reads it).
        merged_val = merged.reshape(n, c)
        for b, q_in in pending_kv:
            block = model.pixel_snail_blocks[b]
            kv_in = jnp.concatenate([q_in, merged_val], axis=-1)
            kv = _conv1x1(kv_in, block.attention.kv_proj)
            k_i = kv[:, : attn0.embed_channels].reshape(n, n_heads, d_k)
            v_i = kv[:, attn0.embed_channels:].reshape(n, n_heads, d_v)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_i[None, :, :, None, :], (b, 0, 0, i, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_i[None, :, :, None, :], (b, 0, 0, i, 0))

        carry = (padded_canvas, tuple(new_elu), tuple(new_mid), k_cache,
                 v_cache)
        return carry, None

    rngs = jax.random.split(rng, seq_len)
    carry = (padded_canvas, elu_caches0, mid_caches0, k_cache0, v_cache0)
    carry = _run_segmented(
        lambda window: functools.partial(step, window=window),
        carry, seq_len, rngs)
    return carry[0][:, pad:-pad, pad:-pad, :]


def _image_gpt_decode(model, rng, n_samples, conditioned_on, mlp_fn):
    """Shared KV-cache decode loop for the ImageGPT family.

    ImageGPT and ImageGPTMoE differ only in the per-block MLP; everything else
    (canvas/pos handling, fused qkv projection, cached attention, merge/
    write-back, segmented windows) is identical and lives here once.

    Args:
        mlp_fn: fn(block, t) -> (n, C) applying the block's MLP to the
            ln2-normalized per-position activations t.
    """
    conditioned_on = model._get_conditioned_on(n_samples, conditioned_on)
    n, h, w, c = conditioned_on.shape
    seq_len = h * w
    attn0 = model.blocks[0].attn
    n_heads = attn0.n_heads
    embed = attn0.embed_channels
    out_ch = attn0.out_channels
    d_k = embed // n_heads
    d_v = out_ch // n_heads

    # The input conv is 3x3 padding=1 -> keep a zero-padded canvas so a (row,
    # col) output position maps to patch origin (row, col) in padded coords.
    pad = 1
    padded_canvas = jnp.pad(conditioned_on, ((0, 0), (pad, pad), (pad, pad),
                                             (0, 0)))
    padded_pos = jnp.pad(jnp.broadcast_to(model.pos, (n, h, w, c)),
                         ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    in_w = model.input_conv.weight
    in_mask = model.input_conv.mask
    in_b = model.input_conv.bias

    # The scan step is op-count-bound (hundreds of tiny ops per pixel), so the
    # per-block work is fused down: q and kv projections share their input
    # (ln1(x)), so each block gets ONE fused qkv matmul. K and V stay in
    # separate caches — a combined cache would need per-step window slices
    # that materialize copies.
    qkv_ws = [jnp.concatenate([blk.attn.q_proj.weight[0, 0],
                               blk.attn.kv_proj.weight[0, 0]], axis=-1)
              for blk in model.blocks]
    qkv_bs = [jnp.concatenate([blk.attn.q_proj.bias, blk.attn.kv_proj.bias])
              for blk in model.blocks]

    def step_for_window(window):
        """A scan step whose attention reads only the first `window` cache
        positions (static slice) — segmented decoding (see below)."""

        def step(carry, inputs):
            padded_canvas, k_cache, v_cache = carry
            i, step_rng = inputs
            row, col = i // w, i % w
            pos_ids = jnp.arange(window)

            # Masked 3x3 input conv at (row, col) + positional embedding.
            x = _masked_conv_at(padded_canvas + padded_pos, in_w, in_mask,
                                in_b, row, col, n)

            for b, block in enumerate(model.blocks):
                x_in = x
                # --- attention on one query position with cached K/V ---
                qkv = block.ln1(x_in) @ qkv_ws[b] + qkv_bs[b]
                q = qkv[:, :embed].reshape(n, n_heads, d_k)
                k_i = qkv[:, embed: 2 * embed].reshape(n, n_heads, d_k)
                v_i = qkv[:, 2 * embed:].reshape(n, n_heads, d_v)
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k_i[None, :, :, None, :], (b, 0, 0, i, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v_i[None, :, :, None, :], (b, 0, 0, i, 0))

                scores = jnp.einsum(
                    "nhd,nhld->nhl", q, k_cache[b, :, :, :window]) / jnp.sqrt(
                        jnp.asarray(d_k, x.dtype))
                scores = jnp.where(pos_ids <= i, scores, -jnp.inf)
                probs = jax.nn.softmax(scores, axis=-1)
                attn_out = jnp.einsum("nhl,nhlv->nhv", probs,
                                      v_cache[b, :, :, :window])
                attn_out = _conv1x1(attn_out.reshape(n, n_heads * d_v),
                                    block.attn.out_proj)
                x1 = x_in + attn_out
                block_out = x1 + mlp_fn(block, block.ln2(x1))
                # Model-level extra skip: x = x + block(x)
                # (image_gpt.py:105-109).
                x = x_in + block_out

            logits = _conv1x1(model.ln(x), model.out_conv)  # (n, out_c)
            sampled = model.sample_fn(step_rng, logits).reshape(n, 1, 1, c)
            current = jax.lax.dynamic_slice(
                padded_canvas, (0, row + pad, col + pad, 0), (n, 1, 1, c))
            merged = jnp.where(current < 0, sampled, current)
            padded_canvas = jax.lax.dynamic_update_slice(
                padded_canvas, merged, (0, row + pad, col + pad, 0))
            return (padded_canvas, k_cache, v_cache), None

        return step

    k_cache0 = jnp.zeros((len(model.blocks), n, n_heads, seq_len, d_k))
    v_cache0 = jnp.zeros((len(model.blocks), n, n_heads, seq_len, d_v))
    rngs = jax.random.split(rng, seq_len)
    carry = _run_segmented(step_for_window, (padded_canvas, k_cache0, v_cache0),
                           seq_len, rngs)
    return carry[0][:, pad:-pad, pad:-pad, :]


def _image_gpt_decode_fused(model, rng, n_samples, conditioned_on,
                            interpret=False, cache_dtype=None):
    """KV-cache decode where each pixel's block stack is ONE Pallas call.

    Same raster/inpainting semantics as :func:`_image_gpt_decode`; numerics
    match to float tolerance (the kernel's op ordering differs from XLA's).
    See ops/decode_pallas.py for why this is much faster at small sample
    batches on TPU. ``cache_dtype`` (default f32; env
    PGT_DECODE_CACHE_DTYPE=bfloat16 to override) stores the K|V cache in a
    narrower dtype — the decode is cache-DMA-bound, so bf16 buys ~25% more
    throughput at a ~1e-2 logit perturbation (quantization noise; samples
    remain draws from a negligibly perturbed model).
    """
    from pytorch_generative_tpu.ops import decode_pallas as dp

    if cache_dtype is None:
        cache_dtype = jnp.dtype(
            os.environ.get("PGT_DECODE_CACHE_DTYPE", "float32"))

    conditioned_on = model._get_conditioned_on(n_samples, conditioned_on)
    n, h, w, c = conditioned_on.shape
    seq_len = h * w
    attn0 = model.blocks[0].attn
    n_heads = attn0.n_heads
    d_k = attn0.embed_channels // n_heads
    d_v = attn0.out_channels // n_heads
    feat = attn0.embed_channels + attn0.out_channels

    pad = 1
    padded_canvas = jnp.pad(conditioned_on, ((0, 0), (pad, pad), (pad, pad),
                                             (0, 0)))
    padded_pos = jnp.pad(jnp.broadcast_to(model.pos, (n, h, w, c)),
                         ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    in_w = model.input_conv.weight
    in_mask = model.input_conv.mask
    in_b = model.input_conv.bias
    weights = dp.stack_image_gpt_weights(model)

    def step_for_window(window):
        def step(carry, inputs):
            padded_canvas, kv_cache = carry
            i, step_rng = inputs
            row, col = i // w, i % w
            x = _masked_conv_at(padded_canvas + padded_pos, in_w, in_mask,
                                in_b, row, col, n)
            act, kv_new = dp.fused_decode_step(
                i, x, kv_cache, weights, n_heads, d_k, d_v, window,
                interpret=interpret)
            kv_cache = jax.lax.dynamic_update_slice(
                kv_cache, kv_new[:, :, None, :], (0, 0, i, 0))
            logits = _conv1x1(act, model.out_conv)
            sampled = model.sample_fn(step_rng, logits).reshape(n, 1, 1, c)
            current = jax.lax.dynamic_slice(
                padded_canvas, (0, row + pad, col + pad, 0), (n, 1, 1, c))
            merged = jnp.where(current < 0, sampled, current)
            padded_canvas = jax.lax.dynamic_update_slice(
                padded_canvas, merged, (0, row + pad, col + pad, 0))
            return (padded_canvas, kv_cache), None

        return step

    kv_cache0 = jnp.zeros((len(model.blocks), n, seq_len, feat), cache_dtype)
    rngs = jax.random.split(rng, seq_len)
    carry = _run_segmented(step_for_window, (padded_canvas, kv_cache0),
                           seq_len, rngs)
    return carry[0][:, pad:-pad, pad:-pad, :]


def _whole_loop_eligible(model, n):
    """The single-kernel raster sampler handles the common ImageGPT shape:
    1-channel images, 3x3/pad-1 type-A input conv, default Bernoulli
    sample_fn (the kernel draws uniform < sigmoid, which IS
    jax.random.bernoulli's definition — models/base.py:28-30)."""
    from pytorch_generative_tpu.models.base import _default_sample_fn

    h, w, c = model.in_shape
    conv = model.input_conv
    return (c == 1
            and model.out_conv.weight.shape[-1] == 1
            and model.sample_fn is _default_sample_fn
            and conv.weight.shape[:3] == (3, 3, 1)
            and conv.padding == ((1, 1), (1, 1)))


def _sample_loop_tile(model, n, cache_dtype):
    """Largest batch tile whose VMEM-resident working set stays under ~56 MB.

    The working set is the K/V cache (linear in tile) PLUS the static MXU
    selector masks fselk/fselv/dmask/qsel/expsel (decode_pallas.py builds
    them at (tile·C, tile·H)-class shapes — QUADRATIC in tile) and the
    vertically tiled output projection (linear in tile). At today's configs
    (tile <= 16) the cache dominates, but at wide-model/large-tile points
    the selectors would silently outgrow the budget and kill the compile.
    """
    h, w, _ = model.in_shape
    attn = model.blocks[0].attn
    c_k, c_v = attn.embed_channels, attn.out_channels
    n_heads = attn.n_heads
    n_blocks = len(model.blocks)
    f = c_k + c_v
    per_row = n_blocks * h * w * f * jnp.dtype(cache_dtype).itemsize

    def working_set(tile):
        cache = tile * per_row
        # f32 selectors: fselk (tile, tile*c_k), fselv + dmask
        # (tile, tile*c_v) each, qsel (tile*c_k, tile*H),
        # expsel (tile*H, tile*c_v).
        sel = tile * tile * (c_k + 2 * c_v
                             + c_k * n_heads + n_heads * c_v) * 4
        # out_w_tiled: (n_blocks, tile*c_v, c_v) f32 (out_proj is c_v -> c_v).
        out_w = n_blocks * tile * c_v * c_v * 4
        return cache + sel + out_w

    budget = 56 * 1024 * 1024
    tile = n
    while tile > 1 and (working_set(tile) > budget or n % tile != 0):
        tile //= 2
    return tile if working_set(tile) <= budget and n % tile == 0 else None


def _image_gpt_sample_loop(model, rng, n_samples, conditioned_on,
                           interpret=False, cache_dtype=None, tile=None):
    """Whole-raster-scan sampling as ONE Pallas kernel (decode_pallas.py::
    fused_sample_loop): KV caches VMEM-resident across all H*W positions,
    canvas updates / Bernoulli draws / inpainting merge in-kernel. Same
    semantics as :func:`_image_gpt_decode` to float tolerance."""
    from pytorch_generative_tpu.ops import decode_pallas as dp

    if cache_dtype is None:
        cache_dtype = jnp.dtype(
            os.environ.get("PGT_DECODE_CACHE_DTYPE", "float32"))
    conditioned_on = model._get_conditioned_on(n_samples, conditioned_on)
    n, h, w, c = conditioned_on.shape
    seq_len = h * w
    attn0 = model.blocks[0].attn
    n_heads = attn0.n_heads
    d_k = attn0.embed_channels // n_heads
    d_v = attn0.out_channels // n_heads
    if tile is None:
        tile = _sample_loop_tile(model, n, cache_dtype)
    assert tile is not None and n % tile == 0

    pad = 1
    padded_pos = jnp.pad(model.pos[0], ((pad, pad), (pad, pad), (0, 0)))
    pos_col = padded_pos[..., 0].reshape(-1, 1)          # (Lp, 1)
    padded_canvas = jnp.pad(
        conditioned_on, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    canvas0 = padded_canvas[..., 0].reshape(n, -1).T     # (Lp, n), raw

    uniforms = jax.vmap(lambda k: jax.random.uniform(k, (n, 1)))(
        jax.random.split(rng, seq_len))                  # (L, n, 1)

    weights = dp.stack_image_gpt_weights(model)
    wm = model.input_conv.weight * model.input_conv.mask  # (3, 3, 1, C)
    weights["in_w4"] = jnp.stack(
        [wm[0, 0, 0], wm[0, 1, 0], wm[0, 2, 0], wm[1, 0, 0]])
    weights["in_b"] = model.input_conv.bias[None]
    weights["head_w"] = model.out_conv.weight[0, 0]      # (C, 1)
    weights["head_b"] = model.out_conv.bias[None]        # (1, 1)

    out = dp.fused_sample_loop(
        canvas0, pos_col, uniforms, weights, len(model.blocks), n_heads,
        d_k, d_v, h, w, cache_dtype=cache_dtype, tile=tile,
        interpret=interpret)
    canvas = out.T.reshape(n, h + 2 * pad, w + 2 * pad, 1)
    return canvas[:, pad:-pad, pad:-pad, :]


def image_gpt_sample_fast(model, rng, n_samples=None, conditioned_on=None,
                          use_fused_step=None):
    """Incremental-decoding sampler for ImageGPT; exact inpainting semantics.

    Args:
        model: An ImageGPT instance.
        rng: jax.random key.
        n_samples / conditioned_on: As in AutoregressiveModel.sample.
        use_fused_step: If True, run each pixel's block stack as one Pallas
            kernel per position (ops/decode_pallas.py::fused_decode_step);
            if None (auto) on TPU, the sampler first tries the whole-loop
            kernel (fused_sample_loop: the ENTIRE raster scan in one Pallas
            call, MXU attention over VMEM-resident f32 KV caches, zero
            per-pixel XLA ops — batch-tiled so any n works; fastest at
            every measured n; PGT_SAMPLE_LOOP=0 disables, bf16
            PGT_DECODE_CACHE_DTYPE falls through), then the per-position
            kernel for n <= PGT_FUSED_DECODE_MAX_N (default 32), then the
            XLA scan. CPU defaults to the XLA path, which is
            bitwise-equal to the naive sampler. PGT_NO_FUSED_DECODE=1
            forces the XLA path everywhere.
    Returns:
        (N, H, W, C) samples.
    """
    if use_fused_step is None:
        n = n_samples if n_samples is not None else conditioned_on.shape[0]
        on_tpu = (jax.default_backend() != "cpu"
                  and os.environ.get("PGT_NO_FUSED_DECODE") != "1")
        cache_dtype = jnp.dtype(
            os.environ.get("PGT_DECODE_CACHE_DTYPE", "float32"))
        # The whole-loop kernel is f32-cache only: Mosaic cannot prove
        # sublane alignment for single-row dynamic stores into a bf16
        # (16, 128)-tiled cache ("index in dimension 1 is a multiple of
        # 8"), and the f32 MXU loop is already 2.6x the old bf16-cache
        # per-position path. A bf16-cache request keeps the per-position
        # kernel, which genuinely uses it.
        if (on_tpu and os.environ.get("PGT_SAMPLE_LOOP", "1") != "0"
                and cache_dtype == jnp.float32
                and _whole_loop_eligible(model, n)):
            tile = _sample_loop_tile(model, n, cache_dtype)
            if tile is not None and tile >= 8:
                return _image_gpt_sample_loop(
                    model, rng, n_samples, conditioned_on,
                    cache_dtype=cache_dtype, tile=tile)
        max_n = int(os.environ.get("PGT_FUSED_DECODE_MAX_N", "32"))
        use_fused_step = on_tpu and n <= max_n
    if use_fused_step:
        return _image_gpt_decode_fused(model, rng, n_samples, conditioned_on)

    def dense_mlp(block, t):
        return _conv1x1(jax.nn.gelu(_conv1x1(t, block.mlp_conv1),
                                    approximate=False), block.mlp_conv2)

    return _image_gpt_decode(model, rng, n_samples, conditioned_on, dense_mlp)


def _moe_at(moe, tokens):
    """Drop-free top-k MoE on (n, C) tokens: run all experts, select.

    Gating matches nn/moe.py::SparseMoE._top_k (raw prob for top-1 Switch,
    pair-normalized for top-2 GShard).
    """
    idx, gates, _ = moe._top_k(tokens)  # (n, S)
    hdn = jax.nn.gelu(
        jnp.einsum("nc,ech->neh", tokens, moe.w1) + moe.b1[None],
        approximate=False)
    outs = jnp.einsum("neh,ehd->ned", hdn, moe.w2) + moe.b2[None]
    sel = jax.nn.one_hot(idx, moe.n_experts, dtype=tokens.dtype)  # (n, S, E)
    weights = jnp.einsum("nse,ns->ne", sel, gates.astype(tokens.dtype))
    return jnp.einsum("ne,ned->nd", weights, outs)


def image_gpt_moe_sample_fast(model, rng, n_samples=None, conditioned_on=None):
    """Incremental-decoding sampler for ImageGPTMoE (KV caches + MoE MLPs).

    Identical KV-cache decode to :func:`image_gpt_sample_fast` (shared via
    :func:`_image_gpt_decode`); the MLP at each position routes through its
    top-1 expert. With one token per sample per step, expert selection is
    computed drop-free: every expert's MLP runs on the (tiny) token batch and
    a one-hot select keeps the argmax expert's output scaled by its router
    probability — no gather/scatter, no capacity accounting. This is the
    correct inference-time semantics; it matches the naive full-forward
    sampler exactly whenever the full forward drops no tokens (e.g.
    capacity_factor >= n_experts), which is also the only regime where the
    full forward itself is strictly causal (a dropped token's keep/drop bit
    depends on the routing of *later* raster positions in its sample through
    the per-group arrival-order cumsum — an inherent property of
    capacity-based MoE, documented here rather than replicated).
    """
    return _image_gpt_decode(model, rng, n_samples, conditioned_on,
                             lambda block, t: _moe_at(block.moe, t))
