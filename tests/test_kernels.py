"""Pallas kernel vs jnp reference numerics (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_generative_tpu.ops import attention as attn_ref
from pytorch_generative_tpu.ops import attention_pallas


@pytest.mark.parametrize("mask_center", [False, True])
@pytest.mark.parametrize("l", [64, 200, 784])
def test_flash_attention_matches_reference(mask_center, l):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 2, l, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, l, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, l, 16)), jnp.float32)

    expected = attn_ref.causal_attention(q, k, v, mask_center=mask_center)
    got = attention_pallas.flash_causal_attention(
        q, k, v, mask_center=mask_center, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)
    if mask_center:
        np.testing.assert_allclose(np.asarray(got[:, :, 0]), 0.0)


def test_trainable_wrapper_gradients_match_reference():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 1, 64, 4)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 64, 4)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, 64, 4)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(attn_ref.causal_attention(q, k, v, True) ** 2)

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # The custom-VJP backward is definitionally the reference vjp; check it
    # composes (forward interpreted here since there is no TPU in tests).
    got = attention_pallas._bwd(
        True, (q, k, v),
        2 * attn_ref.causal_attention(q, k, v, True))
    for a, b in zip(got, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
