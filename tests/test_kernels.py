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


@pytest.mark.parametrize("mask_center", [False, True])
def test_flash_attention_bf16_tiles_match_f32_reference(mask_center):
    """bfloat16 inputs ride the MXU's native bf16 path (f32 accumulation /
    f32 softmax stats); values and grads must track the f32 reference within
    bf16 resolution."""
    q, k, v = _qkv(128, seed=2)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (q, k, v))

    expected = attn_ref.causal_attention(q, k, v, mask_center=mask_center)
    got = attention_pallas.flash_causal_attention(
        qb, kb, vb, mask_center=mask_center, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expected), atol=3e-2)

    def loss_ref(q, k, v):
        return jnp.sum(attn_ref.causal_attention(q, k, v, mask_center) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(attention_pallas.causal_attention_trainable(
            q, k, v, mask_center).astype(jnp.float32) ** 2)

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    grads_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(qb, kb, vb)
    for got_g, want_g, name in zip(grads_flash, grads_ref, "qkv"):
        assert got_g.dtype == jnp.bfloat16
        scale = np.abs(np.asarray(want_g)).max()
        np.testing.assert_allclose(
            np.asarray(got_g, np.float32) / scale,
            np.asarray(want_g) / scale, atol=4e-2,
            err_msg=f"d{name} mismatch")


def test_flash_default_precision_close_to_f32_reference(monkeypatch):
    """The f32 kernels' opt-in PGT_FLASH_PRECISION=default mode (bf16 MXU
    operands / f32 accumulation — matching XLA's default matmul precision)
    must track the true-f32 reference within bf16-operand resolution in
    values AND gradients. Uses shapes no other test touches: the precision
    env var is read at trace time, so reusing another test's avals would hit
    a jit trace made under the conftest's 'highest' pin."""
    monkeypatch.setenv("PGT_FLASH_PRECISION", "default")
    q, k, v = _qkv(136, d_k=12, d_v=20, seed=7)

    for mask_center in (False, True):
        expected = attn_ref.causal_attention(q, k, v, mask_center=mask_center)
        got = attention_pallas.flash_causal_attention(
            q, k, v, mask_center=mask_center, interpret=True)
        assert got.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   atol=3e-2)

        def loss_ref(q, k, v):
            return jnp.sum(
                attn_ref.causal_attention(q, k, v, mask_center) ** 2)

        def loss_flash(q, k, v):
            return jnp.sum(attention_pallas.causal_attention_trainable(
                q, k, v, mask_center) ** 2)

        grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        grads_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        for got_g, want_g, name in zip(grads_flash, grads_ref, "qkv"):
            scale = np.abs(np.asarray(want_g)).max()
            np.testing.assert_allclose(
                np.asarray(got_g) / scale, np.asarray(want_g) / scale,
                atol=4e-2, err_msg=f"d{name} mismatch (mask={mask_center})")


@pytest.mark.parametrize("mask_center,extra", [(False, 0), (True, 2)])
def test_causal_attention_module_flash_packed_path(mask_center, extra):
    """nn.CausalAttention's packed flash path (no host-side head transposes)
    must equal the jnp reference path, including extra_x-into-kv and
    mask_center, in values AND parameter gradients."""
    from pytorch_generative_tpu import core, nn

    key = jax.random.PRNGKey(5)
    kwargs = dict(in_channels=6, n_heads=2, embed_channels=4, out_channels=6,
                  mask_center=mask_center, extra_input_channels=extra)
    flash = nn.CausalAttention(key, use_flash=True, **kwargs)
    ref = nn.CausalAttention(key, use_flash=False, **kwargs)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 8, 8, 6)), jnp.float32)
    extra_x = (jnp.asarray(rng.random((2, 8, 8, extra)), jnp.float32)
               if extra else None)

    np.testing.assert_allclose(np.asarray(flash(x, extra_x)),
                               np.asarray(ref(x, extra_x)), atol=2e-5)

    def loss(mod):
        return jnp.sum(mod(x, extra_x) ** 2)

    pf, rf = core.partition(flash)
    pr, rr = core.partition(ref)
    gf = jax.grad(lambda p: loss(core.combine(p, rf)))(pf)
    gr = jax.grad(lambda p: loss(core.combine(p, rr)))(pr)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.parametrize("l,n_heads,hd", [
    (36, 2, 16),    # not a multiple of 8 -> pow2 padding fallback
    (100, 1, 8),    # awkward length
    (49, 1, 4),     # odd, tiny features
    (784, 8, 512),  # production width: VMEM budget shrinks the blocks
])
def test_flash_packed_awkward_shapes(l, n_heads, hd):
    """Values + dQ gradients vs the jnp reference across the block-picker's
    edge cases: non-multiple-of-8 lengths (sequence-padding fallback) and
    wide features (scoped-VMEM budget forces sub-divisor blocks)."""
    from pytorch_generative_tpu.ops import attention_pallas as ap
    from pytorch_generative_tpu.ops.attention import causal_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, l, hd))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, l, hd))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, l, hd))
    d = hd // n_heads
    toh = lambda t: t.reshape(2, l, n_heads, d).transpose(0, 2, 1, 3)

    def ref(q):
        out = causal_attention(toh(q), toh(k), toh(v), mask_center=True)
        return out.transpose(0, 2, 1, 3).reshape(2, l, hd)

    out = ap.causal_attention_packed(q, k, v, True, n_heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q)), atol=2e-5)

    g = jax.grad(lambda q: jnp.sum(
        ap.causal_attention_packed(q, k, v, True, n_heads) ** 2))(q)
    gw = jax.grad(lambda q: jnp.sum(ref(q) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw), atol=5e-5)


# ---------------------------------------------------------------------------
# Fused LayerNorm + GELU-MLP + residual kernel (ops/mlp_pallas.py)
# ---------------------------------------------------------------------------

from pytorch_generative_tpu.ops import mlp_pallas  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret_mlp(monkeypatch):
    monkeypatch.setattr(mlp_pallas, "_INTERPRET", True)


def _mlp_args(r_shape, c, f, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((*r_shape, c)), dtype)
    gamma = jnp.asarray(rng.standard_normal((c,)), dtype)
    beta = jnp.asarray(rng.standard_normal((c,)), dtype)
    w1 = jnp.asarray(rng.standard_normal((c, f)) * 0.1, dtype)
    b1 = jnp.asarray(rng.standard_normal((f,)), dtype)
    w2 = jnp.asarray(rng.standard_normal((f, c)) * 0.1, dtype)
    b2 = jnp.asarray(rng.standard_normal((c,)), dtype)
    return x, gamma, beta, w1, b1, w2, b2


def _mlp_ref(x, gamma, beta, w1, b1, w2, b2, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    h = jax.nn.gelu(ln @ w1.astype(jnp.float32) + b1, approximate=False)
    return (xf + h @ w2.astype(jnp.float32) + b2).astype(x.dtype)


@pytest.mark.parametrize("r_shape", [(2, 24), (3, 7, 8), (40,)])
def test_fused_ln_mlp_forward_matches_reference(r_shape):
    args = _mlp_args(r_shape, c=64, f=256)
    got = mlp_pallas.ln_mlp_residual(*args)
    want = _mlp_ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("save_preact", [False, True])
@pytest.mark.parametrize("r_shape", [(2, 24), (2, 25)])  # 50 rows: pad path
def test_fused_ln_mlp_gradients_match_reference(r_shape, save_preact,
                                                monkeypatch):
    monkeypatch.setattr(mlp_pallas, "_SAVE_PREACT", save_preact)
    args = _mlp_args(r_shape, c=64, f=256, seed=1)

    def loss_k(*a):
        return jnp.sum(jnp.sin(mlp_pallas.ln_mlp_residual(*a)))

    def loss_r(*a):
        return jnp.sum(jnp.sin(_mlp_ref(*a)))

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for name, got, want in zip(names, gk, gr):
        scale = max(float(jnp.max(jnp.abs(want))), 1.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5 * scale,
            err_msg=f"{name} mismatch")


@pytest.mark.parametrize("r_shape", [(2, 24), (2, 25)])  # 50 rows: pad path
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_ln_mlp_pipelined_bwd_matches_monolithic(r_shape, dtype,
                                                       monkeypatch):
    """PGT_MLP_BWD=pipe (skewed two-stage) vs mono must agree exactly."""
    monkeypatch.setattr(mlp_pallas, "_SAVE_PREACT", True)
    args = _mlp_args(r_shape, c=64, f=256, dtype=dtype, seed=4)

    def loss(*a):
        return jnp.sum(jnp.sin(mlp_pallas.ln_mlp_residual(*a)
                               .astype(jnp.float32)))

    monkeypatch.setenv("PGT_MLP_BWD", "pipe")
    g_pipe = jax.grad(loss, argnums=tuple(range(7)))(*args)
    monkeypatch.setenv("PGT_MLP_BWD", "mono")
    g_mono = jax.grad(loss, argnums=tuple(range(7)))(*args)
    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for name, got, want in zip(names, g_pipe, g_mono):
        np.testing.assert_allclose(
            np.asarray(got.astype(jnp.float32)),
            np.asarray(want.astype(jnp.float32)),
            atol=1e-6, err_msg=f"{name} pipe/mono mismatch")


def test_fused_ln_mlp_bf16_close_to_f32_reference():
    args32 = _mlp_args((2, 24), c=128, f=512, seed=2)
    args16 = tuple(a.astype(jnp.bfloat16) for a in args32)
    got = mlp_pallas.ln_mlp_residual(*args16).astype(jnp.float32)
    want = _mlp_ref(*args32)
    # bf16 operands / f32 accumulation: tolerance is set by the bf16 inputs.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.15, rtol=0.05)


def test_image_gpt_block_fused_path_matches_unfused():
    """The TransformerBlock's fused gate must be a pure perf switch."""
    from pytorch_generative_tpu.models.autoregressive.image_gpt import (
        TransformerBlock,
    )

    import copy

    block = TransformerBlock(jax.random.PRNGKey(0), n_channels=128,
                             n_attention_heads=2)
    assert not block.use_fused_mlp  # gate must be off on CPU
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 16, 128)),
                    jnp.float32)
    want = block(x)
    fused = copy.copy(block)
    object.__setattr__(fused, "use_fused_mlp", True)
    got = fused(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


# ---------------------------------------------------------------------------

from pytorch_generative_tpu.ops import ln_pallas  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret_ln(monkeypatch):
    monkeypatch.setattr(ln_pallas, "_INTERPRET", True)


def _ln_args(r_shape, c, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((*r_shape, c)), dtype),
            jnp.asarray(rng.standard_normal((c,)), dtype),
            jnp.asarray(rng.standard_normal((c,)), dtype))


def _ln_ref(x, gamma, beta, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(
        x.dtype)


@pytest.mark.parametrize("r_shape", [(2, 24), (3, 7, 8), (50,)])  # 50: pad
def test_pallas_ln_forward_matches_reference(r_shape):
    args = _ln_args(r_shape, c=64)
    got = ln_pallas.channel_layernorm(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ln_ref(*args)),
                               atol=1e-5)


@pytest.mark.parametrize("r_shape", [(2, 24), (2, 25)])
def test_pallas_ln_gradients_match_reference(r_shape):
    args = _ln_args(r_shape, c=32, seed=1)

    def loss_k(*a):
        return jnp.sum(jnp.sin(ln_pallas.channel_layernorm(*a)))

    def loss_r(*a):
        return jnp.sum(jnp.sin(_ln_ref(*a)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(*args)
    for name, got, want in zip(["dx", "dgamma", "dbeta"], gk, gr):
        scale = max(float(jnp.max(jnp.abs(want))), 1.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5 * scale,
            err_msg=f"{name} mismatch")


def test_pallas_ln_bf16_close_to_f32_reference():
    args32 = _ln_args((4, 24), c=128, seed=2)
    args16 = tuple(a.astype(jnp.bfloat16) for a in args32)
    got = ln_pallas.channel_layernorm(*args16).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ln_ref(*args32)),
                               atol=0.1, rtol=0.05)


# ---------------------------------------------------------------------------
# Fused attention block (qkv proj + flash + out proj in one kernel)
# ---------------------------------------------------------------------------

from pytorch_generative_tpu.ops import attn_block_pallas  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret_block(monkeypatch):
    monkeypatch.setattr(attn_block_pallas, "_INTERPRET", True)


def _block_args(l=64, c=32, e=32, o=32, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, dtype)
    return (mk(2, l, c), mk(c, e), mk(e), mk(c, e + o), mk(e + o),
            mk(o, c), mk(c))


def _block_unfused(x, wq, bq, wkv, bkv, wo, bo, mask_center, n_heads):
    e = wq.shape[1]
    q = jnp.einsum("blc,ce->ble", x, wq) + bq
    kv = jnp.einsum("blc,cf->blf", x, wkv) + bkv
    att = attention_pallas.causal_attention_packed(
        q, kv[..., :e], kv[..., e:], mask_center, n_heads)
    return jnp.einsum("blo,oc->blc", att, wo) + bo


@pytest.mark.parametrize("mask_center", [False, True])
@pytest.mark.parametrize("l", [64, 200])
def test_attention_block_matches_unfused(mask_center, l):
    args = _block_args(l=l)
    got = attn_block_pallas.attention_block_packed(*args, mask_center, 2)
    want = _block_unfused(*args, mask_center, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("mask_center", [False, True])
def test_attention_block_gradients_match_unfused(mask_center):
    args = _block_args(seed=3)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(
            attn_block_pallas.attention_block_packed(*a, mask_center, 2)))

    def loss_unfused(*a):
        return jnp.sum(jnp.sin(_block_unfused(*a, mask_center, 2)))

    g1 = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(loss_unfused, argnums=tuple(range(7)))(*args)
    names = ["dx", "dwq", "dbq", "dwkv", "dbkv", "dwo", "dbo"]
    for name, got, want in zip(names, g1, g2):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4,
            err_msg=f"{name} mismatch")


def test_attention_block_bf16_close_to_f32():
    args32 = _block_args(seed=5)
    args16 = tuple(a.astype(jnp.bfloat16) for a in args32)
    got = attn_block_pallas.attention_block_packed(*args16, True, 2)
    want = _block_unfused(*args32, True, 2)
    np.testing.assert_allclose(
        np.asarray(got.astype(jnp.float32)), np.asarray(want),
        atol=0.06, rtol=0.05)


def test_causal_attention_module_fused_block_gate(monkeypatch):
    """PGT_FUSED_ATTN=1 routes the rank-3 no-extra path through the fused
    block kernel; output must match the gate-off (unfused flash) path."""
    from pytorch_generative_tpu import nn as tpu_nn

    attn = tpu_nn.CausalAttention(
        jax.random.PRNGKey(0), in_channels=32, n_heads=2, mask_center=True,
        use_flash=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 32)),
                    jnp.float32)
    monkeypatch.delenv("PGT_FUSED_ATTN", raising=False)
    want = attn(x)
    monkeypatch.setenv("PGT_FUSED_ATTN", "1")
    got = attn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
