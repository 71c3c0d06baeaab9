"""Fused VQ Pallas kernel vs the jnp path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_generative_tpu import nn
from pytorch_generative_tpu.ops import vq as vq_ops
from pytorch_generative_tpu.ops.vq_pallas import vq_quantize_fused


def test_fused_vq_matches_jnp_path():
    rng = np.random.default_rng(0)
    flat_x = jnp.asarray(rng.standard_normal((300, 16)), jnp.float32)
    codebook = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)

    quantized, counts, sums = vq_quantize_fused(flat_x, codebook,
                                                block_m=128, interpret=True)

    idxs = vq_ops.nearest_codebook(flat_x, codebook)
    one_hot = jax.nn.one_hot(idxs, 32)
    np.testing.assert_allclose(np.asarray(quantized),
                               np.asarray(one_hot @ codebook), atol=1e-5)
    np.testing.assert_allclose(np.asarray(counts),
                               np.asarray(one_hot.sum(0)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sums),
                               np.asarray(one_hot.T @ flat_x), atol=1e-4)
    # Padding rows (300 -> 384) contributed nothing.
    assert float(counts.sum()) == 300.0


def test_vector_quantizer_fused_equals_unfused():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 4, 4, 8)),
                    jnp.float32)

    import pytorch_generative_tpu.ops.vq_pallas as vqp

    baseline = nn.VectorQuantizer(key, 16, 8, use_fused=False)
    q0, l0, new0 = baseline(x, training=True)

    # Force the fused path with the interpreter (no TPU in tests).
    orig = vqp.vq_quantize_fused

    def interpreted(flat_x, codebook, **kw):
        kw["interpret"] = True
        return orig(flat_x, codebook, **kw)

    vqp.vq_quantize_fused = interpreted
    try:
        fused = nn.VectorQuantizer(key, 16, 8, use_fused=True)
        # Construction must match (same rng).
        q1, l1, new1 = fused(x, training=True)
    finally:
        vqp.vq_quantize_fused = orig

    np.testing.assert_allclose(np.asarray(q1), np.asarray(q0), atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new1.ema_embedding),
                               np.asarray(new0.ema_embedding), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new1.ema_cluster_size),
                               np.asarray(new0.ema_cluster_size), atol=1e-5)
