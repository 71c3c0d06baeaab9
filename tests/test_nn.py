"""Numerics tests for nn blocks — including cross-framework checks against
torch (CPU) to lock down layout/semantics translations (NHWC vs NCHW)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as torch_F

from pytorch_generative_tpu import core, nn
from pytorch_generative_tpu.ops import attention as attn_ops

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# Convolution vs torch
# ---------------------------------------------------------------------------

def test_conv2d_matches_torch():
    conv = nn.Conv2d(KEY, 3, 5, 3, stride=2, padding=1)
    x = np.random.default_rng(0).standard_normal((2, 9, 9, 3)).astype(np.float32)
    ours = np.asarray(conv(jnp.asarray(x)))

    tconv = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1)
    # HWIO -> OIHW.
    tconv.weight.data = torch.tensor(np.asarray(conv.weight)).permute(3, 2, 0, 1)
    tconv.bias.data = torch.tensor(np.asarray(conv.bias))
    theirs = tconv(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs.detach().numpy(), atol=1e-5)


def test_conv_transpose2d_matches_torch():
    conv = nn.ConvTranspose2d(KEY, 3, 5, 4, stride=2, padding=1)
    x = np.random.default_rng(0).standard_normal((2, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(conv(jnp.asarray(x)))
    assert ours.shape == (2, 16, 16, 5)

    tconv = torch.nn.ConvTranspose2d(3, 5, 4, stride=2, padding=1)
    # Ours is (kh, kw, out, in); torch wants (in, out, kh, kw).
    tconv.weight.data = torch.tensor(np.asarray(conv.weight)).permute(3, 2, 0, 1)
    tconv.bias.data = torch.tensor(np.asarray(conv.bias))
    theirs = tconv(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs.detach().numpy(), atol=1e-5)


def test_causal_conv_masks_weights():
    conv = nn.CausalConv2d(KEY, False, 1, 1, 3, padding=1)
    x = jnp.zeros((1, 5, 5, 1)).at[0, 4, 4, 0].set(1.0)  # bottom-right pixel
    y = conv(x) - (conv.bias if conv.bias is not None else 0.0)
    # A type-B causal conv can never propagate information up/left.
    assert float(jnp.abs(y[0, :4, :, 0]).sum()) == 0.0
    assert float(jnp.abs(y[0, 4, :4, 0]).sum()) == 0.0


def test_channel_layernorm_matches_torch():
    ln = nn.ChannelLayerNorm(6)
    x = np.random.default_rng(0).standard_normal((2, 4, 4, 6)).astype(np.float32)
    ours = np.asarray(ln(jnp.asarray(x)))
    theirs = torch_F.layer_norm(torch.tensor(x), (6,)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_gated_activation():
    g = nn.GatedActivation()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 3, 8)),
                    jnp.float32)
    out = np.asarray(g(x))
    expected = np.tanh(np.asarray(x[..., :4])) * (
        1 / (1 + np.exp(-np.asarray(x[..., 4:]))))
    np.testing.assert_allclose(out, expected, atol=1e-6)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

def _np_masked_attention(q, k, v, mask_center):
    """Naive O(L^2) reference in NumPy (the reference's exact semantics)."""
    n, h, l, d = q.shape
    scale = 1.0 / np.sqrt(k.shape[-1])
    logits = np.einsum("nhqd,nhkd->nhqk", q, k) * scale
    mask = np.tril(np.ones((l, l)), -1 if mask_center else 0).astype(bool)
    logits = np.where(mask, logits, -np.inf)
    with np.errstate(invalid="ignore"):
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
    probs = np.where(mask, probs, 0.0)
    probs = np.nan_to_num(probs)
    return np.einsum("nhqk,nhkd->nhqd", probs, v)


@pytest.mark.parametrize("mask_center", [False, True])
def test_causal_attention_matches_naive(mask_center):
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 2, 16, 4)).astype(np.float32)
    k = rng.standard_normal((2, 2, 16, 4)).astype(np.float32)
    v = rng.standard_normal((2, 2, 16, 8)).astype(np.float32)
    ours = np.asarray(attn_ops.causal_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask_center=mask_center))
    naive = _np_masked_attention(q, k, v, mask_center)
    np.testing.assert_allclose(ours, naive, atol=1e-5)
    if mask_center:
        np.testing.assert_allclose(ours[:, :, 0], 0.0)  # row 0 exactly zero


def test_linear_causal_attention_matches_naive_normalization():
    """Linear attention == explicit feature-map attention with causal cumsum."""
    rng = np.random.default_rng(0)
    q = rng.standard_normal((1, 1, 10, 4)).astype(np.float32)
    k = rng.standard_normal((1, 1, 10, 4)).astype(np.float32)
    v = rng.standard_normal((1, 1, 10, 3)).astype(np.float32)

    ours = np.asarray(attn_ops.linear_causal_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    def feat(x):
        return np.where(x > 0, x, np.exp(x) - 1) + 1.0  # elu(x) + 1

    fq, fk = feat(q[0, 0]), feat(k[0, 0])
    expected = np.zeros((10, 3), np.float32)
    for i in range(10):
        weights = fq[i] @ fk[: i + 1].T  # (i+1,)
        expected[i] = (weights @ v[0, 0, : i + 1]) / (weights.sum() + 1e-10)
    np.testing.assert_allclose(ours[0, 0], expected, atol=1e-4)


def test_linear_causal_attention_is_sub_naive_memory():
    """The chunked-scan formulation must beat naive O(L²) attention on compiled
    temp memory at the reference's shapes (L=784, d=32 per head) — the claimed
    O(L) memory. The old materialized cumsum of (d_k, d_v) outer products used
    ~6x the naive path's memory here (d² > L)."""
    q = jnp.zeros((1, 2, 784, 32))
    lin = jax.jit(attn_ops.linear_causal_attention).lower(q, q, q).compile()
    naive = jax.jit(attn_ops.causal_attention).lower(q, q, q).compile()
    assert (lin.memory_analysis().temp_size_in_bytes
            < naive.memory_analysis().temp_size_in_bytes / 2)


def test_linear_causal_attention_chunk_size_invariance():
    """Output must not depend on the chunk split (incl. ragged final chunk)."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 2, 37, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 37, 5)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, 37, 4)), jnp.float32)
    base = attn_ops.linear_causal_attention(q, k, v, chunk_size=37)
    for c in (1, 8, 16, 128):
        got = attn_ops.linear_causal_attention(q, k, v, chunk_size=c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=2e-5)


def test_causal_attention_extra_x_only_feeds_kv():
    """extra_x must influence values but not break causality (first position of
    a mask_center block stays zero regardless of extra_x)."""
    att = nn.CausalAttention(KEY, in_channels=4, n_heads=2, mask_center=True,
                             extra_input_channels=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 3, 4)),
                    jnp.float32)
    extra = jnp.ones((1, 3, 3, 2))
    out1 = att(x, extra_x=extra)
    out2 = att(x, extra_x=2 * extra)
    bias_only = att.out_proj(jnp.zeros((1, 3, 3, att.out_channels)))
    np.testing.assert_allclose(np.asarray(out1[:, 0, 0]),
                               np.asarray(bias_only[:, 0, 0]), atol=1e-6)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


# ---------------------------------------------------------------------------
# VectorQuantizer
# ---------------------------------------------------------------------------

def test_vq_quantizes_to_codebook_rows():
    vq = nn.VectorQuantizer(KEY, n_embeddings=4, embedding_dim=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 3, 2)),
                    jnp.float32)
    quantized, loss, _ = vq(x)
    flat = np.asarray(quantized).reshape(-1, 2)
    codebook = np.asarray(vq.codebook)
    for row in flat:
        dists = ((codebook - row) ** 2).sum(-1)
        assert dists.min() < 1e-10  # every output is an exact codebook row


def test_vq_straight_through_gradient():
    vq = nn.VectorQuantizer(KEY, n_embeddings=4, embedding_dim=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 2, 2)),
                    jnp.float32)

    def f(x):
        quantized, _, _ = vq(x)
        return jnp.sum(quantized)

    grads = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(grads), 1.0)  # d(x + sg(q-x))/dx = 1


def test_vq_ema_update_matches_manual():
    vq = nn.VectorQuantizer(KEY, n_embeddings=4, embedding_dim=2,
                            ema_decay=0.9)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 2, 2)),
                    jnp.float32)
    _, _, new_vq = vq(x, training=True)

    flat = np.asarray(x).reshape(-1, 2)
    codebook = np.asarray(vq.codebook)
    idxs = ((flat[:, None] - codebook[None]) ** 2).sum(-1).argmin(1)
    one_hot = np.eye(4)[idxs]
    cluster = 0.9 * np.asarray(vq.ema_cluster_size) + 0.1 * one_hot.sum(0)
    avg = 0.9 * np.asarray(vq.ema_embedding_avg) + 0.1 * (one_hot.T @ flat)
    np.testing.assert_allclose(np.asarray(new_vq.ema_cluster_size), cluster,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_vq.ema_embedding),
                               avg / (cluster + 1e-5)[:, None], atol=1e-6)


def test_vq_non_ema_embedding_receives_gradient():
    vq = nn.VectorQuantizer(KEY, n_embeddings=4, embedding_dim=2, use_ema=False)
    params, rest = core.partition(vq)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 2, 2)),
                    jnp.float32)

    def f(p):
        m = core.combine(p, rest)
        _, loss, _ = m(x, training=True)
        return loss

    grads = jax.grad(f)(params)
    assert float(jnp.abs(grads.embedding).sum()) > 0


def test_rezero_wrapper():
    lin = nn.Linear(KEY, 4, 4)
    rz = nn.ReZeroWrapper(lin)
    x = jnp.ones((2, 4))
    np.testing.assert_allclose(np.asarray(rz(x)), np.asarray(x))  # alpha = 0


# ---------------------------------------------------------------------------
# Initializer parity with torch defaults
# ---------------------------------------------------------------------------

def test_torch_default_init_bounds():
    from pytorch_generative_tpu.ops import init as init_ops

    w = init_ops.torch_default_weight(KEY, (1000, 100), fan_in=1000)
    bound = 1.0 / np.sqrt(1000)
    assert float(jnp.max(jnp.abs(w))) <= bound
    # Roughly uniform: std of U(-b, b) is b/sqrt(3).
    np.testing.assert_allclose(float(jnp.std(w)), bound / np.sqrt(3), rtol=0.05)


def test_kaiming_normal_std():
    from pytorch_generative_tpu.ops import init as init_ops

    w = init_ops.kaiming_normal(KEY, (500, 784), fan_in=784)
    np.testing.assert_allclose(float(jnp.std(w)), np.sqrt(2.0 / 784), rtol=0.05)
