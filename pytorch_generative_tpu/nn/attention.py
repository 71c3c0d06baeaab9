"""Attention blocks and positional encodings (NHWC pytree modules).

Public surface mirrors /root/reference/pytorch_generative/nn/attention.py; the
compute path routes through ``ops.attention`` (jnp) or the fused Pallas kernel in
``ops.attention_pallas`` when running on TPU with supported shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_generative_tpu import core
from pytorch_generative_tpu.nn.convolution import Conv2d
from pytorch_generative_tpu.ops import attention as attn_ops


def _use_fused_block():
    """Opt-in (PGT_FUSED_ATTN=1): the whole-attention-block kernel
    (ops/attn_block_pallas.py). Off by default until its hardware win is
    measured (PERF.md)."""
    import os

    return os.environ.get("PGT_FUSED_ATTN") == "1"


def positional_encoding(d_model: int, max_len: int):
    """1-D sinusoidal positional encodings, shape (max_len, 1, d_model).

    Parity with /root/reference/pytorch_generative/nn/attention.py:18-34 (unused by
    any model there, kept for API completeness).
    """
    position = np.arange(max_len)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, 1, d_model), np.float32)
    pe[:, 0, 0::2] = np.sin(position * div_term)
    pe[:, 0, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe)


@functools.lru_cache(maxsize=32)
def _image_positional_encoding_cached(n, h, w):
    # Cached as NumPy: constants created inside a jit trace must not be cached
    # across traces (tracer leak); NumPy hoists to a compile-time constant.
    ys = (np.arange(h, dtype=np.float32) / h) - 0.5
    xs = (np.arange(w, dtype=np.float32) / w) - 0.5
    yy = np.broadcast_to(ys[None, :, None, None], (n, h, w, 1))
    xx = np.broadcast_to(xs[None, None, :, None], (n, h, w, 1))
    return np.concatenate([yy, xx], axis=-1)


def image_positional_encoding(shape):
    """(x, y) coordinate channels in [-0.5, 0.5), shape (N, H, W, 2) for NHWC input.

    Channel 0 varies along H, channel 1 along W — same ordering as the reference's
    NCHW version (/root/reference/pytorch_generative/nn/attention.py:37-57).
    """
    n, h, w = shape[0], shape[1], shape[2]
    return _image_positional_encoding_cached(n, h, w)


class CausalAttention(core.Module):
    """Autoregressively-masked multihead self-attention over image pixels.

    Operates on NHWC images; the sequence is the H*W raster scan. q is projected
    from ``x`` alone; k and v come from one fused 1x1 conv of ``concat(x, extra_x)``
    so that ``extra_input_channels`` condition the values without influencing the
    attention pattern (they feed k/v only, not q) — the PixelSNAIL trick
    (/root/reference/pytorch_generative/nn/attention.py:93-96). With
    ``mask_center=True`` pixel i attends to pixels < i only and pixel 0's output is
    exactly zero.
    """

    q_proj: Conv2d
    kv_proj: Conv2d
    out_proj: Conv2d
    n_heads: int = core.static_field()
    embed_channels: int = core.static_field()
    out_channels: int = core.static_field()
    mask_center: bool = core.static_field()
    use_flash: bool = core.static_field()

    def __init__(self, key, in_channels: int, n_heads: int = 1,
                 embed_channels: int | None = None, out_channels: int | None = None,
                 mask_center: bool = False, extra_input_channels: int = 0,
                 use_flash: bool | None = None):
        qk, kvk, pk = jax.random.split(key, 3)
        self.n_heads = n_heads
        self.embed_channels = embed_channels or in_channels
        self.out_channels = out_channels or in_channels
        self.mask_center = mask_center
        # Default: the fused Pallas flash kernels (fwd + bwd) on TPU — measured
        # 15% faster end-to-end than XLA attention on the ImageGPT train step
        # (1213 vs 1058 samples/sec on v5e) with f32 tile math (the XLA path
        # uses bf16 passes). PGT_NO_FLASH=1 is the escape hatch.
        if use_flash is None:
            import os

            use_flash = (jax.default_backend() == "tpu"
                         and os.environ.get("PGT_NO_FLASH") != "1")
        self.use_flash = use_flash
        self.q_proj = Conv2d(qk, in_channels, self.embed_channels, 1)
        self.kv_proj = Conv2d(kvk, in_channels + extra_input_channels,
                              self.embed_channels + self.out_channels, 1)
        self.out_proj = Conv2d(pk, self.out_channels, self.out_channels, 1)

    def __call__(self, x, extra_x=None):
        """Accepts NHWC images (N, H, W, C) or flat sequences (N, L, C).

        The flat form lets transformer stacks (ImageGPT) run their whole
        middle on rank-3 tensors: profiling on v5e showed XLA assigning
        batch-minor layouts to rank-4 block activations and inserting a
        layout-conversion copy at every block boundary (~40% of the train
        step's HBM traffic); with a single flatten outside the block loop
        those copies disappear.
        """
        rank3 = x.ndim == 3
        if rank3:
            n, l, _ = x.shape
        else:
            n, h, w, _ = x.shape
            l = h * w
        if (rank3 and extra_x is None and self.use_flash
                and _use_fused_block()):
            # Whole-block fusion: qkv projection + flash attention + output
            # projection in ONE kernel (ops/attn_block_pallas.py) — the
            # projections run on VMEM-resident operands with no custom-call
            # boundary between them and the attention tiles.
            from pytorch_generative_tpu.ops.attn_block_pallas import (
                attention_block_packed,
            )
            return attention_block_packed(
                x, self.q_proj.weight[0, 0], self.q_proj.bias,
                self.kv_proj.weight[0, 0], self.kv_proj.bias,
                self.out_proj.weight[0, 0], self.out_proj.bias,
                self.mask_center, self.n_heads)
        q_feat = self.q_proj(x)
        if extra_x is not None:
            x = jnp.concatenate([x, extra_x], axis=-1)
        kv = self.kv_proj(x)
        flat = lambda t: t if rank3 else t.reshape(n, l, t.shape[-1])
        if self.use_flash:
            # Packed path: (N, L, features) straight into the kernel — the
            # per-head tiles are carved out by the kernel's index maps, so no
            # head-split transposes ever materialize (they cost ~10x the
            # attention math on v5e).
            from pytorch_generative_tpu.ops.attention_pallas import (
                causal_attention_packed,
            )
            out = causal_attention_packed(
                flat(q_feat), flat(kv[..., : self.embed_channels]),
                flat(kv[..., self.embed_channels:]), self.mask_center,
                self.n_heads)
        else:
            to_heads = lambda t: flat(t).reshape(
                n, l, self.n_heads, -1).transpose(0, 2, 1, 3)
            out = attn_ops.causal_attention(
                to_heads(q_feat), to_heads(kv[..., : self.embed_channels]),
                to_heads(kv[..., self.embed_channels:]),
                mask_center=self.mask_center)
            out = out.transpose(0, 2, 1, 3).reshape(n, l, self.out_channels)
        if not rank3:
            out = out.reshape(n, h, w, self.out_channels)
        return self.out_proj(out)


class LinearCausalAttention(core.Module):
    """O(L)-memory linear causal attention (Katharopoulos et al. 2020).

    Parity with /root/reference/pytorch_generative/nn/attention.py:208-275 (which
    is unused by any reference model and lacks mask_center/extra_x). The sequential
    hand-written autograd.Function becomes a chunked ``lax.scan`` that carries only
    the running (d_k, d_v) state (see ops/attention.py), which XLA differentiates
    directly — genuinely O(L) memory, tested vs naive attention's compiled temps.

    Documented divergence (reference defect, do-not-replicate): the reference's
    denominator einsum (attention.py:267) labels Q/K as "nlhi" although their
    layout is (n, heads, seq, dim), so its K.cumsum(1) accumulates over *heads*
    and the normalizer ends up per-position instead of causal-cumulative. This
    implementation normalizes by sum_{j<=i} phi(q_i).phi(k_j) as in the paper;
    the numerator matches the reference exactly (tested incl. gradients).
    """

    q_proj: Conv2d
    kv_proj: Conv2d
    n_heads: int = core.static_field()
    embed_channels: int = core.static_field()
    out_channels: int = core.static_field()
    feature_fn: object = core.static_field()

    def __init__(self, key, in_channels: int, feature_fn=None, n_heads: int = 1,
                 embed_channels: int | None = None, out_channels: int | None = None):
        qk, kvk = jax.random.split(key)
        self.n_heads = n_heads
        self.embed_channels = embed_channels or in_channels
        self.out_channels = out_channels or in_channels
        self.feature_fn = feature_fn
        self.q_proj = Conv2d(qk, in_channels, self.embed_channels, 1)
        self.kv_proj = Conv2d(kvk, in_channels,
                              self.embed_channels + self.out_channels, 1)

    def __call__(self, x):
        n, h, w, _ = x.shape
        q = attn_ops.nhwc_to_heads(self.q_proj(x), self.n_heads)
        kv = self.kv_proj(x)
        k = attn_ops.nhwc_to_heads(kv[..., : self.embed_channels], self.n_heads)
        v = attn_ops.nhwc_to_heads(kv[..., self.embed_channels:], self.n_heads)
        out = attn_ops.linear_causal_attention(q, k, v, feature_fn=self.feature_fn)
        return attn_ops.heads_to_nhwc(out, h, w)
