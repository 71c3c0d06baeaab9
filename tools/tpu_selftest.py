"""On-device numerics self-test for every Pallas kernel this framework ships.

The CPU test suite exercises the kernels in Pallas *interpret* mode
(tests/test_kernels.py); this tool runs the same value+gradient equality
checks through the real Mosaic compiler on the attached TPU — the
configuration that actually serves traffic. Run it after touching any kernel
or bumping jax/libtpu:

    python tools/tpu_selftest.py            # ~1-2 min, prints PASS/FAIL per check

Covers: flash causal attention fwd+bwd (f32 + bf16, mask_center both ways,
reproduce() and C=512 head shapes), the Pallas LayerNorm fwd+bwd, the fused
LN+MLP+residual fwd+bwd, the fused per-pixel decode step, the fused VQ
quantizer, and the round-5 opt-in modes: PGT_FLASH_PRECISION=default fwd+bwd,
PGT_MLP_BWD=pipe vs mono gradients, the fused attention-block kernel
(PGT_FUSED_ATTN) fwd+bwd, and the whole-raster-scan samplers (marginal
distribution + exact inpainting; see _check_whole_loop_samplers for why the
on-device contract is distributional). Exit code 0 iff all checks pass.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FAILURES = []


def _check(name, got, want, atol, rel_of=1.0):
    import numpy as np

    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    err = float(np.max(np.abs(got - want))) if got.size else 0.0
    tol = atol * max(float(np.max(np.abs(want))) if want.size else 0.0,
                     rel_of)
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'}  {name}: max err {err:.3e} "
          f"(tol {tol:.3e})")
    if not ok:
        _FAILURES.append(name)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch_generative_tpu.ops import attention as attn_ref
    from pytorch_generative_tpu.ops import attention_pallas as ap
    from pytorch_generative_tpu.ops import ln_pallas, mlp_pallas

    if jax.default_backend() != "tpu":
        print(f"no TPU attached (backend={jax.default_backend()}); "
              f"the CPU suite already covers interpret mode — nothing to do")
        return 0

    rng = np.random.default_rng(0)

    # --- Flash attention: reproduce() shape (H=2, d_k=32) and the
    # production C=512 shape (H=4, d_k=128), f32 and bf16.
    #
    # f32 tolerance is bf16-scale BY DESIGN: inside the kernels the MXU
    # computes f32 matmuls as bf16 passes with f32 accumulation (the v5e has
    # no full-rate f32 systolic path) — the same posture as torch's TF32
    # default on Ampere. XLA's own f32 dot uses a multi-pass scheme, so the
    # reference is ~1e-6-exact and the diff measures the single-pass policy,
    # not a defect (measured here: 5e-3..2e-2 on O(1) activations). The pure
    # VPU kernels (LayerNorm) are f32-exact. ---
    for (h, d, dtype, atol) in [(2, 32, jnp.float32, 3e-2),
                                (4, 128, jnp.float32, 3e-2),
                                (2, 32, jnp.bfloat16, 3e-2),
                                (4, 128, jnp.bfloat16, 3e-2)]:
        for mask_center in (False, True):
            q = jnp.asarray(rng.standard_normal((2, h, 784, d)), dtype)
            k = jnp.asarray(rng.standard_normal((2, h, 784, d)), dtype)
            v = jnp.asarray(rng.standard_normal((2, h, 784, d)), dtype)
            tag = f"flash h={h} d={d} {jnp.dtype(dtype).name} mc={mask_center}"
            want = attn_ref.causal_attention(
                *(t.astype(jnp.float32) for t in (q, k, v)),
                mask_center=mask_center)
            got = ap.causal_attention_trainable(q, k, v, mask_center)
            _check(tag + " fwd", got, want, atol)

            def loss_k(q, k, v):
                return jnp.sum(
                    jnp.sin(ap.causal_attention_trainable(
                        q, k, v, mask_center).astype(jnp.float32)))

            def loss_r(q, k, v):
                return jnp.sum(jnp.sin(attn_ref.causal_attention(
                    *(t.astype(jnp.float32) for t in (q, k, v)),
                    mask_center=mask_center)))

            gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
            gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
            for nm, a, b in zip(("dq", "dk", "dv"), gk, gr):
                _check(f"{tag} {nm}", a, b, atol)

    # --- Pallas LayerNorm. ---
    for c, dtype, atol in [(64, jnp.float32, 2e-5), (512, jnp.float32, 2e-5),
                           (512, jnp.bfloat16, 3e-2)]:
        x = jnp.asarray(rng.standard_normal((16, 784, c)), dtype)
        g = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

        def ref(x, g, b, eps=1e-5):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.var(xf, -1, keepdims=True)
            return (xf - mu) * jax.lax.rsqrt(var + eps) * g + b

        tag = f"ln c={c} {jnp.dtype(dtype).name}"
        _check(tag + " fwd", ln_pallas.channel_layernorm(x, g, b),
               ref(x, g, b), atol)
        gk = jax.grad(lambda *a: jnp.sum(jnp.sin(
            ln_pallas.channel_layernorm(*a).astype(jnp.float32))),
            argnums=(0, 1, 2))(x, g, b)
        gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                      argnums=(0, 1, 2))(x, g, b)
        for nm, a2, b2 in zip(("dx", "dgamma", "dbeta"), gk, gr):
            _check(f"{tag} {nm}", a2, b2, atol)

    # --- Fused LN+MLP+residual (f32 tolerance bf16-scale: in-kernel MXU
    # dots, same single-pass policy as the attention kernels above). ---
    for c, dtype, atol in [(64, jnp.float32, 3e-2), (512, jnp.float32, 3e-2),
                           (512, jnp.bfloat16, 5e-2)]:
        f = 4 * c
        x = jnp.asarray(rng.standard_normal((8, 784, c)), dtype)
        g = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((c, f)) * 0.05, dtype)
        b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, dtype)
        w2 = jnp.asarray(rng.standard_normal((f, c)) * 0.05, dtype)
        b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, dtype)

        def ref(x, g, b, w1, b1, w2, b2, eps=1e-5):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.var(xf, -1, keepdims=True)
            ln = (xf - mu) * jax.lax.rsqrt(var + eps) * g + b
            h = jax.nn.gelu(ln @ w1.astype(jnp.float32) + b1,
                            approximate=False)
            return xf + h @ w2.astype(jnp.float32) + b2

        args = (x, g, b, w1, b1, w2, b2)
        tag = f"ln_mlp c={c} {jnp.dtype(dtype).name}"
        _check(tag + " fwd", mlp_pallas.ln_mlp_residual(*args), ref(*args),
               atol)
        gk = jax.grad(lambda *a: jnp.sum(jnp.sin(
            mlp_pallas.ln_mlp_residual(*a).astype(jnp.float32))),
            argnums=tuple(range(7)))(*args)
        gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                      argnums=tuple(range(7)))(*args)
        for nm, a2, b2_ in zip(("dx", "dg", "db", "dw1", "db1", "dw2", "db2"),
                               gk, gr):
            _check(f"{tag} {nm}", a2, b2_, atol)

    # --- Fused per-pixel decode step (ops/decode_pallas.py) at the
    # reproduce() sample-grid config (n=16, 8 blocks, H=2, C=64). The
    # reference activations come from the model's own block math given the
    # true K/V caches (mirrors tests/test_sampling.py, here through Mosaic).
    # MXU single-pass f32 policy => bf16-scale tolerance, as above. ---
    from pytorch_generative_tpu import models
    from pytorch_generative_tpu.ops import decode_pallas as dp

    m = models.ImageGPT(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                        in_size=28, n_transformer_blocks=8,
                        n_attention_heads=2, n_embedding_channels=64,
                        in_shape=(28, 28, 1))
    xs = jnp.asarray(rng.random((16, 28, 28, 1)) < 0.13, jnp.float32)
    h0 = m.input_conv(xs + m.pos)
    n, hh, ww, c = h0.shape
    seq = h0.reshape(n, hh * ww, c)
    caches, t = [], seq
    for blk in m.blocks:
        ln1 = blk.ln1(t)
        caches.append(ln1 @ blk.attn.kv_proj.weight[0, 0]
                      + blk.attn.kv_proj.bias)
        u = t + blk.attn(ln1)
        mlp = blk.mlp_conv2(jax.nn.gelu(blk.mlp_conv1(blk.ln2(u)),
                                        approximate=False))
        t = t + (u + mlp)
    ref_act = np.asarray(m.ln(t))
    weights = dp.stack_image_gpt_weights(m)
    kv_cache = jnp.stack(caches)
    heads = m.blocks[0].attn.n_heads
    d_k = m.blocks[0].attn.embed_channels // heads
    d_v = m.blocks[0].attn.out_channels // heads
    for i in (0, 391, 783):
        act, kv_new = dp.fused_decode_step(
            jnp.int32(i), seq[:, i, :], kv_cache, weights, heads, d_k, d_v,
            window=hh * ww)
        _check(f"decode step i={i} act", act, ref_act[:, i, :], 3e-2)
        _check(f"decode step i={i} kv", kv_new,
               np.asarray(kv_cache[:, :, i, :]), 3e-2)

    # --- Fused VQ quantizer (opt-in kernel, still must be correct). ---
    try:
        from pytorch_generative_tpu.ops import vq_pallas

        xq = jnp.asarray(rng.standard_normal((4096, 64)), jnp.float32)
        cb = jnp.asarray(rng.standard_normal((512, 64)), jnp.float32)
        quant, counts, sums = vq_pallas.vq_quantize_fused(xq, cb)
        want_idx = jnp.argmin(
            jnp.sum(xq ** 2, 1, keepdims=True)
            - 2 * xq @ cb.T + jnp.sum(cb ** 2, 1)[None], axis=1)
        one_hot = jax.nn.one_hot(want_idx, cb.shape[0])
        # quantized = one_hot @ codebook rides the MXU single-pass (bf16
        # rounding of codebook values); counts are exact index agreement.
        _check("vq quantized", quant, cb[want_idx], 3e-2)
        _check("vq counts", counts, one_hot.sum(0), 1e-5)
        _check("vq sums", sums, one_hot.T @ xq, 1e-4)
    except (ImportError, AttributeError) as e:  # pragma: no cover
        print(f"SKIP  vq kernel ({e})")

    # --- Round-5 opt-in modes, through Mosaic. ---
    _check_flash_default_precision(rng)
    _check_pipelined_mlp_bwd(rng)
    _check_fused_attention_block(rng)
    _check_whole_loop_samplers()

    print(f"\n{'ALL PASS' if not _FAILURES else 'FAILURES: ' + str(_FAILURES)}")
    return 1 if _FAILURES else 0


def _check_flash_default_precision(rng):
    """PGT_FLASH_PRECISION=default (bf16 MXU operands / f32 accumulation in
    the f32 kernels) must track the XLA f32 reference at bf16-operand
    resolution in values and gradients. The env var is read at trace time,
    so this uses avals no other check traces (batch 3 instead of 2) to miss
    their jit cache, and restores the previous setting afterwards."""
    import os

    import jax
    import jax.numpy as jnp

    from pytorch_generative_tpu.ops import attention as attn_ref
    from pytorch_generative_tpu.ops import attention_pallas as ap

    prev = os.environ.get("PGT_FLASH_PRECISION")
    os.environ["PGT_FLASH_PRECISION"] = "default"
    try:
        q = jnp.asarray(rng.standard_normal((3, 2, 784, 32)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 2, 784, 32)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((3, 2, 784, 32)), jnp.float32)
        for mask_center in (False, True):
            tag = f"flash precision=default mc={mask_center}"
            want = attn_ref.causal_attention(q, k, v,
                                             mask_center=mask_center)
            _check(tag + " fwd",
                   ap.causal_attention_trainable(q, k, v, mask_center),
                   want, 4e-2)
            gk = jax.grad(
                lambda *a: jnp.sum(jnp.sin(ap.causal_attention_trainable(
                    *a, mask_center))), argnums=(0, 1, 2))(q, k, v)
            gr = jax.grad(
                lambda *a: jnp.sum(jnp.sin(attn_ref.causal_attention(
                    *a, mask_center=mask_center))),
                argnums=(0, 1, 2))(q, k, v)
            for nm, a, b in zip(("dq", "dk", "dv"), gk, gr):
                _check(f"{tag} {nm}", a, b, 4e-2)
    finally:
        if prev is None:
            os.environ.pop("PGT_FLASH_PRECISION", None)
        else:
            os.environ["PGT_FLASH_PRECISION"] = prev


def _check_pipelined_mlp_bwd(rng):
    """PGT_MLP_BWD=pipe (the skewed two-stage backward, kept opt-in after it
    measured slower) must produce the monolithic kernel's gradients on real
    hardware — both kernels run the same f32 accumulation, so the agreement
    is near-exact, far tighter than the vs-XLA checks above."""
    import os

    import jax
    import jax.numpy as jnp

    from pytorch_generative_tpu.ops import mlp_pallas

    if not mlp_pallas._SAVE_PREACT:  # pragma: no cover
        print("SKIP  mlp pipe bwd (_SAVE_PREACT off)")
        return
    c, f = 256, 1024
    x = jnp.asarray(rng.standard_normal((2, 784, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, f)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    args = (x, g, b, w1, b1, w2, b2)

    def grads(*a):
        return jax.grad(lambda *aa: jnp.sum(jnp.sin(
            mlp_pallas.ln_mlp_residual(*aa).astype(jnp.float32))),
            argnums=tuple(range(7)))(*a)

    prev = os.environ.get("PGT_MLP_BWD")
    try:
        os.environ["PGT_MLP_BWD"] = "pipe"
        gp = grads(*args)
        os.environ["PGT_MLP_BWD"] = "mono"
        gm = grads(*args)
    finally:
        if prev is None:
            os.environ.pop("PGT_MLP_BWD", None)
        else:
            os.environ["PGT_MLP_BWD"] = prev
    for nm, a, b_ in zip(("dx", "dg", "db", "dw1", "db1", "dw2", "db2"),
                         gp, gm):
        _check(f"mlp pipe-vs-mono {nm}", a, b_, 1e-5)


def _check_fused_attention_block(rng):
    """The opt-in fused attention-block kernel (PGT_FUSED_ATTN,
    ops/attn_block_pallas.py) vs its unfused composition (XLA projection
    dots around the packed flash kernel), values and gradients, f32 + bf16."""
    import jax
    import jax.numpy as jnp

    from pytorch_generative_tpu.ops import attention_pallas as ap
    from pytorch_generative_tpu.ops import attn_block_pallas as abp

    def unfused(x, wq, bq, wkv, bkv, wo, bo, mask_center, n_heads):
        e = wq.shape[1]
        q = jnp.einsum("blc,ce->ble", x, wq) + bq
        kv = jnp.einsum("blc,cf->blf", x, wkv) + bkv
        att = ap.causal_attention_packed(
            q, kv[..., :e], kv[..., e:], mask_center, n_heads)
        return jnp.einsum("blo,oc->blc", att, wo) + bo

    for dtype, atol in [(jnp.float32, 3e-2), (jnp.bfloat16, 6e-2)]:
        mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, dtype)
        c = e = o = 64
        args = (mk(2, 784, c), mk(c, e), mk(e), mk(c, e + o), mk(e + o),
                mk(o, c), mk(c))
        for mask_center in (False, True):
            tag = (f"attn_block {jnp.dtype(dtype).name} mc={mask_center}")
            want = unfused(*(a.astype(jnp.float32) for a in args),
                           mask_center, 2)
            _check(tag + " fwd",
                   abp.attention_block_packed(*args, mask_center, 2),
                   want, atol)
            gk = jax.grad(lambda *a: jnp.sum(jnp.sin(
                abp.attention_block_packed(*a, mask_center, 2)
                .astype(jnp.float32))), argnums=tuple(range(7)))(*args)
            gr = jax.grad(lambda *a: jnp.sum(jnp.sin(
                unfused(*a, mask_center, 2))),
                argnums=tuple(range(7)))(
                *(a.astype(jnp.float32) for a in args))
            for nm, a, b_ in zip(
                    ("dx", "dwq", "dbq", "dwkv", "dbkv", "dwo", "dbo"),
                    gk, gr):
                _check(f"{tag} {nm}", a, b_, atol)


def _check_whole_loop_samplers():
    """The whole-raster-scan sampler kernels vs the XLA incremental path,
    through Mosaic. Sampled BITS can legitimately flip (the kernels' MXU
    single-pass f32 policy perturbs probabilities at bf16 scale, and one
    flipped pixel re-conditions the rest of the raster), so the on-device
    contract is distributional: both paths draw from the same per-pixel
    law, hence per-pixel marginals over n samples agree to binomial noise
    (sigma <= sqrt(2 * .25 / n)); inpainting must preserve conditioned
    pixels exactly. Bitwise agreement is the CPU suite's job
    (tests/test_sampling.py, interpret mode)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorch_generative_tpu import models
    from pytorch_generative_tpu.ops import sampling as so

    n = 512
    tol = 8.0 * float(np.sqrt(2 * 0.25 / n))  # 8 sigma ~= 0.25

    key = jax.random.PRNGKey(0)
    m = models.ImageGPT(key, in_channels=1, out_channels=1, in_size=8,
                        n_transformer_blocks=3, n_attention_heads=2,
                        n_embedding_channels=32, in_shape=(8, 8, 1))
    # Zero-init pos/head would pin every p at .5 and blind the check; spread
    # the per-pixel marginals out instead.
    m = m.replace(pos=jax.random.normal(jax.random.PRNGKey(1), m.pos.shape))
    rng = jax.random.PRNGKey(7)
    xla = np.asarray(so.image_gpt_sample_fast(m, rng, n_samples=n,
                                              use_fused_step=False))
    loop = np.asarray(so._image_gpt_sample_loop(m, rng, n, None))
    diff = np.abs(loop.mean(0) - xla.mean(0))
    _check("imagegpt whole-loop marginals", diff, np.zeros_like(diff), tol)

    # NB: parenthesize before .at — unary minus binds after .set, which
    # would silently make the whole canvas "sample me".
    cond = (-jnp.ones((8, 8, 8, 1))).at[:, :4].set(1.0)
    inp = np.asarray(so._image_gpt_sample_loop(m, rng, None, cond, tile=8))
    _check("imagegpt whole-loop inpainting", inp[:, :4],
           np.ones_like(inp[:, :4]), 1e-7)

    ms = models.PixelSNAIL(key, in_channels=1, out_channels=1, n_channels=16,
                           n_pixel_snail_blocks=2, n_residual_blocks=2,
                           attention_key_channels=4,
                           attention_value_channels=8, in_shape=(8, 8, 1))
    xla = np.asarray(so.pixel_snail_sample_fast(ms, rng, n_samples=n,
                                                use_loop_kernel=False))
    # The snail loop kernel's VMEM budget (and its product gate,
    # n // tile <= 2) is sized for <= 2 in-kernel tile passes; a single
    # n=512 call is a configuration the gate never produces and OOMs
    # scoped VMEM. Sample the same 512 as 8 gate-shaped n=64 calls.
    loop = np.concatenate([
        np.asarray(so._pixel_snail_sample_loop(
            ms, k, n // 8, None))
        for k in jax.random.split(rng, 8)])
    diff = np.abs(loop.mean(0) - xla.mean(0))
    _check("snail whole-loop marginals", diff, np.zeros_like(diff), tol)
    cond64 = (-jnp.ones((64, 8, 8, 1))).at[:, :4].set(1.0)
    inp = np.asarray(so._pixel_snail_sample_loop(ms, rng, None, cond64))
    _check("snail whole-loop inpainting", inp[:, :4],
           np.ones_like(inp[:, :4]), 1e-7)


if __name__ == "__main__":
    sys.exit(main())
