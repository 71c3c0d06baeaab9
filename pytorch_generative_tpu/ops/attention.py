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


def linear_causal_attention(q, k, v, feature_fn=None, eps=1e-10,
                            chunk_size: int = 128):
    """O(L)-memory linear causal attention (Katharopoulos et al. 2020).

    q, k, v: (N, heads, L, d). The reference implements the numerator with a
    hand-written sequential autograd.Function
    (/root/reference/pytorch_generative/nn/attention.py:168-195); here the
    sequence is processed in MXU-sized chunks under one ``lax.scan`` that
    carries only the running state — the (d_k, d_v) sum of k_i^T v_i outer
    products and the (d_k,) sum of k_i. Per chunk the causal part is a masked
    (C, C) score matmul and the cross-chunk part is a (C, d_k) @ (d_k, d_v)
    matmul, so peak live memory is O(L·d + C² + d_k·d_v) instead of the
    O(L·d_k·d_v) a materialized cumsum of outer products would need (at the
    reference's shapes d² = 4096 > L = 784, i.e. worse than naive attention).
    XLA differentiates the scan natively — no custom VJP needed.
    """
    if feature_fn is None:
        feature_fn = lambda x: jax.nn.elu(x) + 1.0
    q = feature_fn(q)
    k = feature_fn(k)
    n, h, seq_len, d_k = q.shape
    d_v = v.shape[-1]
    c = min(chunk_size, seq_len)
    pad = -seq_len % c
    if pad:
        # Zero-padded k rows contribute nothing to the running state or the
        # denominators; padded q rows produce garbage that is sliced off.
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n_chunks = (seq_len + pad) // c
    # (n_chunks, N, H, C, d) so scan iterates the leading axis.
    qc = q.reshape(n, h, n_chunks, c, d_k).transpose(2, 0, 1, 3, 4)
    kc = k.reshape(n, h, n_chunks, c, d_k).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(n, h, n_chunks, c, d_v).transpose(2, 0, 1, 3, 4)
    # Inclusive causal mask: position i attends to j <= i within the chunk.
    intra_mask = jnp.tril(jnp.ones((c, c), bool))

    def step(carry, inputs):
        s, z = carry  # (N, H, d_k, d_v) running kv-state, (N, H, d_k) k-sum.
        qi, ki, vi = inputs
        scores = jnp.einsum("nhqd,nhkd->nhqk", qi, ki)
        scores = jnp.where(intra_mask, scores, 0.0)
        num = (jnp.einsum("nhqk,nhkv->nhqv", scores, vi)
               + jnp.einsum("nhqd,nhdv->nhqv", qi, s))
        den = (jnp.sum(scores, axis=-1)
               + jnp.einsum("nhqd,nhd->nhq", qi, z))
        out = num / (den + eps)[..., None]
        s = s + jnp.einsum("nhkd,nhkv->nhdv", ki, vi)
        z = z + jnp.sum(ki, axis=2)
        return (s, z), out

    init = (jnp.zeros((n, h, d_k, d_v), q.dtype), jnp.zeros((n, h, d_k), q.dtype))
    _, outs = jax.lax.scan(step, init, (qc, kc, vc))
    out = outs.transpose(1, 2, 0, 3, 4).reshape(n, h, n_chunks * c, d_v)
    return out[:, :, :seq_len]


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
