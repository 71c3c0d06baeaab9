"""Unit tests for the pytree module system (core.py)."""

import jax
import jax.numpy as jnp
import pytest

from pytorch_generative_tpu import core, nn


def test_pytree_roundtrip():
    lin = nn.Linear(jax.random.PRNGKey(0), 4, 3)
    leaves, treedef = jax.tree_util.tree_flatten(lin)
    lin2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert core.tree_equal(lin, lin2)


def test_partition_excludes_buffers():
    ml = nn.MaskedLinear(jax.random.PRNGKey(0), 4, 3)
    params, rest = core.partition(ml)
    assert params.mask is None and rest.mask is not None
    assert params.weight is not None and rest.weight is None
    assert core.tree_equal(core.combine(params, rest), ml)


def test_grad_only_touches_params():
    ml = nn.MaskedLinear(jax.random.PRNGKey(0), 4, 3)
    params, rest = core.partition(ml)
    x = jnp.ones((2, 4))

    def loss(p):
        return jnp.sum(core.combine(p, rest)(x) ** 2)

    grads = jax.grad(loss)(params)
    assert grads.mask is None
    assert grads.weight.shape == ml.weight.shape


def test_jit_specializes_on_static_fields():
    calls = []

    def f(m, x):
        calls.append(1)
        return m(x)

    jf = jax.jit(f)
    k = jax.random.PRNGKey(0)
    x = jnp.ones((2, 4, 4, 2))
    g1 = nn.GatedActivation()
    g2 = nn.GatedActivation(activation_fn=jax.nn.relu)
    jf(g1, x)
    jf(g1, x)
    assert len(calls) == 1  # same static config: cached
    jf(g2, x)
    assert len(calls) == 2  # different activation_fn: recompile
    del k


def test_replace_validates_fields():
    lin = nn.Linear(jax.random.PRNGKey(0), 4, 3)
    lin2 = lin.replace(bias=None)
    assert lin2.bias is None and lin.bias is not None
    with pytest.raises(AttributeError):
        lin.replace(nonexistent=1)


def test_n_parameters():
    lin = nn.Linear(jax.random.PRNGKey(0), 4, 3)
    assert core.n_parameters(lin) == 4 * 3 + 3
    ml = nn.MaskedLinear(jax.random.PRNGKey(0), 4, 3)
    assert core.n_parameters(ml) == 4 * 3 + 3  # mask buffer not counted


def test_cast_floating_skips_state_fields():
    """core.cast_floating casts params/constant buffers but leaves stateful
    (state_field) buffers in stored precision — the mixed-precision contract."""
    import jax.numpy as jnp

    from pytorch_generative_tpu import nn

    vq = nn.VectorQuantizer(jax.random.PRNGKey(0), n_embeddings=4,
                            embedding_dim=2)
    cast = core.cast_floating(vq, jnp.bfloat16)
    assert cast.ema_embedding.dtype == jnp.float32
    assert cast.ema_cluster_size.dtype == jnp.float32
    assert cast.ema_embedding_avg.dtype == jnp.float32
    # Non-state floating leaves are cast.
    assert cast.embedding.dtype == jnp.bfloat16
    # cast_state=True casts everything.
    full = core.cast_floating(vq, jnp.bfloat16, cast_state=True)
    assert full.ema_embedding.dtype == jnp.bfloat16
