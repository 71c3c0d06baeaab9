"""Functional attention ops (jnp reference implementations).

The Pallas flash-style fused kernel lives in ``attention_pallas.py``; these jnp
versions define the semantics (and are the fallback on CPU / in tests). Shapes use
the TPU-native sequence layout (N, n_heads, L, head_dim) where L = H*W pixels.

Reference semantics being reproduced:
  /root/reference/pytorch_generative/nn/attention.py:120-161 (CausalAttention) and
  :168-275 (LinearCausalAttention). Quirks preserved: with ``mask_center=True`` the
  first sequence position attends to nothing and its output is exactly zero; the
  softmax scale is 1/sqrt(head_dim of K).
"""

import jax
import jax.numpy as jnp

from pytorch_generative_tpu.ops.masks import causal_attention_mask


def causal_attention(q, k, v, mask_center: bool = False):
    """Masked multihead attention over (N, heads, L, d) tensors.

    Returns (N, heads, L, d_v). Fully-masked rows (row 0 when mask_center) yield 0.
    """
    seq_len = q.shape[-2]
    scale = 1.0 / jnp.sqrt(jnp.asarray(k.shape[-1], q.dtype))
    mask = causal_attention_mask(seq_len, mask_center)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k) * scale
    logits = jnp.where(mask, logits, -jnp.inf)
    # Numerically-safe softmax that returns exactly 0 on fully-masked rows instead
    # of NaN (the reference post-masks NaNs to zero, attention.py:154-157).
    maxval = jnp.max(logits, axis=-1, keepdims=True)
    maxval = jnp.where(jnp.isfinite(maxval), maxval, 0.0)
    unnorm = jnp.where(mask, jnp.exp(logits - maxval), 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / jnp.where(denom == 0.0, 1.0, denom)
    return jnp.einsum("nhqk,nhkd->nhqd", probs, v)


def linear_causal_attention(q, k, v, feature_fn=None, eps=1e-10):
    """O(L) linear causal attention (Katharopoulos et al. 2020).

    q, k, v: (N, heads, L, d). The reference implements the numerator with a
    hand-written sequential autograd.Function
    (/root/reference/pytorch_generative/nn/attention.py:168-195); here the running
    sum of k_i^T v_i outer products is a cumulative sum that XLA differentiates
    natively — no custom VJP needed.
    """
    if feature_fn is None:
        feature_fn = lambda x: jax.nn.elu(x) + 1.0
    q = feature_fn(q)
    k = feature_fn(k)
    den = 1.0 / (jnp.einsum("nhld,nhld->nhl", q, jnp.cumsum(k, axis=2)) + eps)
    # S_l = sum_{i<=l} k_i^T v_i  -> out_l = q_l @ S_l.
    kv = jnp.einsum("nhlk,nhlv->nhlkv", k, v)
    s = jnp.cumsum(kv, axis=2)
    num = jnp.einsum("nhlk,nhlkv->nhlv", q, s)
    return num * den[..., None]


def nhwc_to_heads(x, n_heads: int):
    """(N, H, W, C) -> (N, n_heads, H*W, C // n_heads)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h * w, n_heads, c // n_heads)
    return x.transpose(0, 2, 1, 3)


def heads_to_nhwc(x, h: int, w: int):
    """(N, n_heads, H*W, d) -> (N, H, W, n_heads*d)."""
    n, n_heads, l, d = x.shape
    x = x.transpose(0, 2, 1, 3).reshape(n, h, w, n_heads * d)
    return x
