"""Tests for the SparseMoE layer, expert parallelism, and ImageGPTMoE.

The reference has no MoE; these tests pin the Switch routing invariants
(capacity accounting, load-balance loss), exact dense==expert-parallel
agreement on the virtual 8-device mesh, causality of the MoE transformer, and
end-to-end training through the Trainer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_generative_tpu import core, models, parallel, trainer
from pytorch_generative_tpu.nn.moe import SparseMoE, capacity_for


def test_sparse_moe_forward_shape_and_aux():
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=16, hidden_channels=32,
                    n_experts=4, capacity_factor=2.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    y, aux = moe(x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # Switch aux loss is 1.0 at perfectly uniform routing and >= that bound.
    assert 0.9 <= float(aux) < 4.0


def test_sparse_moe_matches_manual_expert_mlp():
    """With capacity ample, each token's output must equal
    gate_prob * mlp_{argmax expert}(token) — the Switch contract."""
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=8, hidden_channels=16,
                    n_experts=4, capacity_factor=4.0)  # cap = T, no drops
    tokens = jax.random.normal(jax.random.PRNGKey(1), (32, 8))
    y, _ = moe(tokens)

    probs = jax.nn.softmax(moe.gate(tokens), axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    want = []
    for t in range(tokens.shape[0]):
        e = int(idx[t])
        h = jax.nn.gelu(tokens[t] @ moe.w1[e] + moe.b1[e], approximate=False)
        want.append(float(probs[t, e]) * (h @ moe.w2[e] + moe.b2[e]))
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.stack(want)),
                               atol=1e-5)


def test_sparse_moe_capacity_drops_tokens_to_zero():
    """Tokens routed past capacity contribute exactly zero output."""
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=8, hidden_channels=16,
                    n_experts=2, capacity_factor=0.25)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    cap = capacity_for(16, 2, 0.25)  # = 2 slots per expert
    y, _ = moe(tokens)
    dispatch, _, _ = moe.route(tokens, cap)
    kept = np.asarray(dispatch.sum(axis=(1, 2)))  # 1 if kept, 0 if dropped
    assert kept.sum() <= 2 * cap
    dropped = np.asarray(y)[kept == 0]
    np.testing.assert_allclose(dropped, 0.0, atol=1e-7)


def test_route_onehot_view_matches_compact():
    """route() (one-hot dispatch/combine) and route_compact (sort/gather)
    describe the same assignment: dispatching+combining through either path
    produces identical outputs, including under capacity drops."""
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=8, hidden_channels=16,
                    n_experts=4, capacity_factor=1.0)  # forces drops
    tokens = jax.random.normal(jax.random.PRNGKey(1), (32, 8))
    cap = capacity_for(32, 4, 1.0)

    dispatch, combine, aux_o = moe.route(tokens, cap)
    src, valid, slot, weight, aux_c = moe.route_compact(tokens, cap)
    np.testing.assert_allclose(float(aux_o), float(aux_c), rtol=1e-6)

    expert_in_o = jnp.einsum("tec,td->ecd", dispatch, tokens)
    expert_in_c = moe.dispatch_compact(tokens, src, valid)
    np.testing.assert_allclose(np.asarray(expert_in_c),
                               np.asarray(expert_in_o), atol=1e-6)

    out = moe.apply_experts(expert_in_c)
    y_o = jnp.einsum("tec,ecd->td", combine, out)
    y_c = moe.combine_compact(out, slot, weight)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_o), atol=1e-5)


@pytest.mark.parametrize("n_selected", [1, 2])
def test_route_onehot_matches_compact_under_drops(n_selected):
    """route_onehot (the dense-path default: cumsum positions + einsum
    dispatch/combine) must equal route()/route_compact exactly — same slots,
    same drops, same gates — under capacity pressure, for top-1 and top-2."""
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=8, hidden_channels=16,
                    n_experts=4, capacity_factor=1.0, n_selected=n_selected)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (32, 8))
    cap = capacity_for(32 * n_selected, 4, 1.0)

    dispatch_o, combine_o, aux_o = moe.route_onehot(tokens, cap)
    dispatch_v, combine_v, aux_v = moe.route(tokens, cap)
    np.testing.assert_allclose(float(aux_o), float(aux_v), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dispatch_o), np.asarray(dispatch_v),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(combine_o), np.asarray(combine_v),
                               atol=1e-6)
    # Drops actually happened (else the test proves nothing).
    assert float(dispatch_o.sum()) < 32 * n_selected

    # And the end-to-end outputs agree through the expert MLPs.
    expert_in = jnp.einsum("tec,td->ecd", dispatch_o, tokens)
    out = moe.apply_experts(expert_in)
    y_o = jnp.einsum("tec,ecd->td", combine_o, out)
    src, valid, slot, weight, _ = moe.route_compact(tokens, cap)
    out_c = moe.apply_experts(moe.dispatch_compact(tokens, src, valid))
    y_c = moe.combine_compact(out_c, slot, weight)
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_c), atol=1e-5)


def test_sparse_moe_top2_matches_manual():
    """n_selected=2 with ample capacity: each token's output must equal the
    pair-normalized gate-weighted sum of its two best experts' MLPs (the
    GShard contract)."""
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=8, hidden_channels=16,
                    n_experts=4, capacity_factor=4.0, n_selected=2)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    y, _ = moe(tokens)

    probs = jax.nn.softmax(moe.gate(tokens), axis=-1)
    want = []
    for t in range(tokens.shape[0]):
        p = np.asarray(probs[t])
        e1, e2 = np.argsort(p)[::-1][:2]
        g1, g2 = p[e1] / (p[e1] + p[e2]), p[e2] / (p[e1] + p[e2])
        acc = 0.0
        for e, g in ((e1, g1), (e2, g2)):
            h = jax.nn.gelu(tokens[t] @ moe.w1[e] + moe.b1[e],
                            approximate=False)
            acc = acc + float(g) * (h @ moe.w2[e] + moe.b2[e])
        want.append(acc)
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.stack(want)),
                               atol=1e-5)


def test_sparse_moe_top2_second_choice_yields_to_first():
    """GShard capacity priority: a token's SECOND choice is dropped before any
    token's FIRST choice of the same expert, regardless of arrival order."""
    moe = SparseMoE(jax.random.PRNGKey(3), n_channels=4, hidden_channels=8,
                    n_experts=2, capacity_factor=1.0, n_selected=2)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    cap = capacity_for(8 * 2, 2, 1.0)  # 8 slots per expert, 16 virtual tokens
    src, valid, slot, weight, _ = moe.route_compact(tokens, cap)
    idx, _, _ = moe._top_k(tokens)
    # Every first choice must be kept (8 slots >= 8 first choices per expert
    # at most): weight[:, 0] > 0 for all tokens.
    assert (np.asarray(weight[:, 0]) > 0).all()


def test_image_gpt_moe_top2_forward_and_causal():
    model = models.ImageGPTMoE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=8,
        n_transformer_blocks=2, n_attention_heads=2, n_embedding_channels=8,
        n_experts=4, n_selected=2, in_shape=(8, 8, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 1))
    logits, aux = model.forward(x)
    assert logits.shape == (1, 8, 8, 1) and np.isfinite(float(aux))

    def logit_at(x, i):
        out, _ = model.forward(x)
        return out.reshape(-1)[i]

    g = jax.grad(lambda x: logit_at(x, 9))(x).reshape(-1)
    assert float(jnp.abs(g[9:]).sum()) == 0.0
    assert float(jnp.abs(g[:9]).sum()) > 0.0


def test_image_gpt_moe_top2_fast_sampler_matches_naive():
    model = models.ImageGPTMoE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=6,
        n_transformer_blocks=2, n_attention_heads=2, n_embedding_channels=8,
        n_experts=4, capacity_factor=4.0, n_selected=2, in_shape=(6, 6, 1))
    rng = jax.random.PRNGKey(7)
    fast = model.sample(rng, n_samples=3)
    naive = model.sample_naive(rng, n_samples=3)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(naive))


def test_sparse_moe_gradients_flow():
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=8, hidden_channels=16,
                    n_experts=2, capacity_factor=2.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 8))
    params, rest = core.partition(moe)

    def loss(p):
        m = core.combine(p, rest)
        y, aux = m(x)
        return jnp.sum(y ** 2) + 0.01 * aux

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # With 64 tokens over 2 experts both experts get traffic, so every
    # expert's weights see nonzero gradient.
    assert float(jnp.abs(grads.w1).sum()) > 0
    assert float(jnp.abs(grads.gate.weight).sum()) > 0


needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@needs_mesh
def test_expert_parallel_matches_dense():
    """EP over the 8-device mesh == the dense single-device forward, exactly
    (capacity_factor = E guarantees no token is ever dropped)."""
    mesh8 = parallel.make_mesh(8, axis_name="expert")
    n_experts = 8
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=16, hidden_channels=32,
                    n_experts=n_experts, capacity_factor=float(n_experts))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 16))
    y_dense, _ = moe(x)
    y_ep, aux_ep = parallel.moe_forward_expert_parallel(moe, x, mesh8)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_dense),
                               atol=1e-5)
    assert np.isfinite(float(aux_ep))


@needs_mesh
def test_expert_parallel_top2_matches_dense():
    mesh8 = parallel.make_mesh(8, axis_name="expert")
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=16, hidden_channels=32,
                    n_experts=8, capacity_factor=8.0, n_selected=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 16))
    y_dense, _ = moe(x)
    y_ep, _ = parallel.moe_forward_expert_parallel(moe, x, mesh8)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_dense),
                               atol=1e-5)


@needs_mesh
def test_expert_parallel_grads_flow():
    mesh8 = parallel.make_mesh(8, axis_name="expert")
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=8, hidden_channels=16,
                    n_experts=8, capacity_factor=8.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 8))
    params, rest = core.partition(moe)

    @jax.jit
    def loss(p, x):
        m = core.combine(p, rest)
        y, aux = parallel.moe_forward_expert_parallel(m, x, mesh8)
        return jnp.sum(y ** 2) + 0.01 * aux

    val, grads = jax.value_and_grad(loss)(params, x)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def _tiny_moe_gpt(key=0):
    return models.ImageGPTMoE(
        jax.random.PRNGKey(key), in_channels=1, out_channels=1, in_size=8,
        n_transformer_blocks=2, n_attention_heads=2, n_embedding_channels=8,
        n_experts=4, in_shape=(8, 8, 1))


def test_image_gpt_moe_forward_and_sample():
    model = _tiny_moe_gpt()
    x = (jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1)) < 0.5)
    logits, aux = model.forward(x.astype(jnp.float32))
    assert logits.shape == (2, 8, 8, 1)
    assert np.isfinite(float(aux))
    samples = model.sample(jax.random.PRNGKey(2), n_samples=2)
    assert samples.shape == (2, 8, 8, 1)
    assert set(np.unique(np.asarray(samples))) <= {0.0, 1.0}


def test_image_gpt_moe_is_causal():
    """d logits[i] / d x[j] == 0 for j >= i (raster order) — the MoE mixes
    only the channel axis, so causality must be exactly that of ImageGPT."""
    model = _tiny_moe_gpt()
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 1))

    def logit_at(x, i):
        out, _ = model.forward(x)
        return out.reshape(-1)[i]

    for i in [0, 9, 37]:
        g = jax.grad(lambda x: logit_at(x, i))(x).reshape(-1)
        assert float(jnp.abs(g[i:]).sum()) == 0.0, f"future leak at {i}"
        if i > 0:
            assert float(jnp.abs(g[:i]).sum()) > 0.0


def test_image_gpt_moe_trains(tmp_path):
    """End-to-end through the Trainer: metrics finite, loss decreases."""
    from pytorch_generative_tpu import datasets

    model = _tiny_moe_gpt()
    train_loader, _ = datasets.get_synthetic_mnist_loaders(
        batch_size=16, n_train=32, image_size=8)

    def loss_fn(x, _, preds):
        logits, aux = preds
        n = x.shape[0]
        bce = optax.sigmoid_binary_cross_entropy(
            logits.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()
        return {"loss": bce + 0.01 * aux, "bce": bce, "moe_aux": aux}

    t = trainer.Trainer(
        model=model, loss_fn=loss_fn, optimizer=optax.adam(2e-3),
        train_loader=train_loader, eval_loader=train_loader,
        log_dir=str(tmp_path), use_tensorboard=False)
    first = None
    for _ in range(8):
        for batch in train_loader:
            x = batch[0] if isinstance(batch, (tuple, list)) else batch
            metrics, _ = t.train_one_step(x, None)
            loss = float(np.asarray(metrics["loss"]))
            if first is None:
                first = loss
    assert np.isfinite(loss)
    assert loss < first


def test_image_gpt_moe_fast_sampler_matches_naive():
    """KV-cache MoE sampler == naive full-forward sampler (no-drop capacity:
    capacity_factor = n_experts guarantees the full forward drops nothing, the
    only regime where capacity-based MoE decoding is exactly causal)."""
    model = models.ImageGPTMoE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=6,
        n_transformer_blocks=2, n_attention_heads=2, n_embedding_channels=8,
        n_experts=4, capacity_factor=4.0, in_shape=(6, 6, 1))
    rng = jax.random.PRNGKey(7)
    fast = model.sample(rng, n_samples=3)
    naive = model.sample_naive(rng, n_samples=3)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(naive))


def test_image_gpt_moe_fast_sampler_inpainting():
    model = models.ImageGPTMoE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=6,
        n_transformer_blocks=2, n_attention_heads=2, n_embedding_channels=8,
        n_experts=4, capacity_factor=4.0, in_shape=(6, 6, 1))
    cond = -jnp.ones((2, 6, 6, 1))
    cond = cond.at[:, :3].set(1.0)  # top half fixed
    out = model.sample(jax.random.PRNGKey(3), conditioned_on=cond)
    np.testing.assert_array_equal(np.asarray(out[:, :3]), 1.0)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


@needs_mesh
def test_image_gpt_moe_dp_matches_single_device(tmp_path):
    """One DP step == one single-device step for the MoE transformer
    (capacity_factor = n_experts so neither sharding drops tokens — per-shard
    capacity accounting otherwise legitimately differs from global)."""
    def make():
        return models.ImageGPTMoE(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=8,
            n_transformer_blocks=2, n_attention_heads=2,
            n_embedding_channels=8, n_experts=4, capacity_factor=4.0,
            in_shape=(8, 8, 1))

    def loss_fn(x, _, preds):
        logits, aux = preds
        n = x.shape[0]
        bce = optax.sigmoid_binary_cross_entropy(
            logits.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()
        return {"loss": bce + 0.01 * aux, "moe_aux": aux}

    from pytorch_generative_tpu import debug

    def run(n_devices):
        loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=8)
        t = trainer.Trainer(
            model=make(), loss_fn=loss_fn, optimizer=optax.sgd(0.1),
            train_loader=loader, eval_loader=loader,
            log_dir=str(tmp_path / f"moe{n_devices}"),
            n_devices=n_devices, use_tensorboard=False)
        x = (np.random.default_rng(0).random((8, 8, 8, 1)) > 0.5).astype(
            np.float32)
        metrics, _ = t.train_one_step(x, None)
        return (float(np.asarray(jax.device_get(metrics)["loss"])),
                jax.device_get(t._params))

    loss1, p1 = run(1)
    loss8, p8 = run(8)
    np.testing.assert_allclose(loss1, loss8, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_expert_parallel_rejects_2d_tokens():
    """2-D token matrices route as ONE global group on the dense path, which
    per-device routing cannot replicate — EP must reject them explicitly."""
    import pytest

    from pytorch_generative_tpu import parallel

    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=8, hidden_channels=16,
                    n_experts=8, capacity_factor=8.0)
    mesh = parallel.make_mesh(8, axis_name="expert")
    x2d = jnp.ones((16, 8))
    with pytest.raises(ValueError, match="leading batch axis"):
        parallel.moe_forward_expert_parallel(moe, x2d, mesh)


def test_sparse_moe_group_size_matches_per_token_switch():
    """With ample capacity, group_size routing is a pure reshape: each token's
    output still equals gate_prob * mlp_{argmax}(token), independent of how
    tokens are grouped — and a group_size equal to the per-sample token count
    reproduces the default grouping bit-for-bit."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))

    base = SparseMoE(key, n_channels=8, hidden_channels=16, n_experts=4,
                     capacity_factor=4.0)  # no drops at either grouping
    y_default, _ = base(x)

    same = SparseMoE(key, n_channels=8, hidden_channels=16, n_experts=4,
                     capacity_factor=4.0, group_size=16)
    y_same, _ = same(x)
    np.testing.assert_array_equal(np.asarray(y_default), np.asarray(y_same))

    small = SparseMoE(key, n_channels=8, hidden_channels=16, n_experts=4,
                      capacity_factor=4.0, group_size=4)
    y_small, _ = small(x)
    np.testing.assert_allclose(np.asarray(y_small), np.asarray(y_default),
                               atol=1e-5)


@needs_mesh
def test_expert_parallel_group_size_matches_dense():
    """EP with group_size == the dense forward with the same group_size
    (capacity math must agree group-for-group across the two paths)."""
    mesh8 = parallel.make_mesh(8, axis_name="expert")
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=16, hidden_channels=32,
                    n_experts=8, capacity_factor=8.0, group_size=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 16))
    y_dense, _ = moe(x)
    y_ep, _ = parallel.moe_forward_expert_parallel(moe, x, mesh8)
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_dense),
                               atol=1e-5)


@needs_mesh
def test_expert_parallel_x_data_parallel_matches_dense():
    """EP x DP on a 2-D ('data','expert') mesh == the dense forward: experts
    shard over 'expert' (replicated across 'data'), the batch shards over
    BOTH axes jointly, and the all_to_all slot exchange stays within each
    data-replica's expert group (VERDICT r4 item 5)."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "expert"))
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=16, hidden_channels=32,
                    n_experts=4, capacity_factor=4.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4, 4, 16))
    y_dense, aux_dense = moe(x)
    y_ep, aux_ep = parallel.moe_forward_expert_parallel(
        moe, x, mesh, data_axis="data")
    np.testing.assert_allclose(np.asarray(y_ep), np.asarray(y_dense),
                               atol=1e-5)
    np.testing.assert_allclose(float(aux_ep), float(aux_dense), rtol=1e-5)


@needs_mesh
def test_expert_parallel_x_data_parallel_grads_match_dense():
    """EP x DP gradients == dense-path gradients: the expert-weight cotangent
    psum over 'data' is exactly the DP gradient sum."""
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "expert"))
    moe = SparseMoE(jax.random.PRNGKey(0), n_channels=8, hidden_channels=16,
                    n_experts=4, capacity_factor=4.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 8))
    params, rest = core.partition(moe)

    def loss_dense(p, x):
        m = core.combine(p, rest)
        y, aux = m(x)
        return jnp.sum(y ** 2) + 0.01 * aux

    def loss_ep(p, x):
        m = core.combine(p, rest)
        y, aux = parallel.moe_forward_expert_parallel(
            m, x, mesh, data_axis="data")
        return jnp.sum(y ** 2) + 0.01 * aux

    v1, g1 = jax.value_and_grad(loss_dense)(params, x)
    v2, g2 = jax.value_and_grad(loss_ep)(params, x)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
