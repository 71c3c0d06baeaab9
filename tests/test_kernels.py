"""Pallas kernels vs jnp reference numerics — values AND gradients
(interpret mode on CPU; the same code compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_generative_tpu.ops import attention as attn_ref
from pytorch_generative_tpu.ops import attention_pallas


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(attention_pallas, "_INTERPRET", True)


def _qkv(l, d_k=8, d_v=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((2, 2, l, d_k)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, l, d_k)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, l, d_v)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("mask_center", [False, True])
@pytest.mark.parametrize("l", [64, 200, 784])
def test_flash_attention_matches_reference(mask_center, l):
    q, k, v = _qkv(l)
    expected = attn_ref.causal_attention(q, k, v, mask_center=mask_center)
    got = attention_pallas.flash_causal_attention(
        q, k, v, mask_center=mask_center, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)
    if mask_center:
        np.testing.assert_allclose(np.asarray(got[:, :, 0]), 0.0)


@pytest.mark.parametrize("mask_center", [False, True])
@pytest.mark.parametrize("l", [64, 200])
def test_flash_backward_matches_reference(mask_center, l):
    """The Pallas dQ/dK/dV kernels must agree with XLA autodiff of the
    reference implementation."""
    q, k, v = _qkv(l, seed=1)

    def loss_ref(q, k, v):
        return jnp.sum(attn_ref.causal_attention(q, k, v, mask_center) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(
            attention_pallas.causal_attention_trainable(q, k, v, mask_center)
            ** 2)

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    grads_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(grads_flash, grads_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4,
            err_msg=f"d{name} mismatch")


def test_flash_backward_fully_masked_rows_no_grad():
    """With mask_center=True, row 0 is fully masked: its output is zero and no
    gradient may flow through it."""
    q, k, v = _qkv(64, seed=2)

    def loss(q, k, v):
        out = attention_pallas.causal_attention_trainable(q, k, v, True)
        return jnp.sum(out[:, :, 0] ** 2)  # only the masked row

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        np.testing.assert_allclose(np.asarray(g), 0.0)
