"""Benchmark suite: training + sampling throughput on TPU, with MFU accounting.

Prints one JSON line per metric, each shaped
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
with the headline metric (ImageGPT reproduce()-config training throughput,
the BASELINE.json number) printed LAST. Extra context rides in extra keys.

Baselines are the PyTorch reference measured on this machine's CPU
(BASELINE_MEASURED.json; the reference publishes no throughput numbers).
The headline model/batch/loss/optimizer match the reference's reproduce()
exactly (/root/reference/pytorch_generative/models/autoregressive/
image_gpt.py:113-175).

Timing fences are true host fetches (float(...)): through the remote-device
tunnel used here, block_until_ready can return before execution completes.

Env knobs:
    BENCH_BATCH_SIZE (64)   headline train batch
    BENCH_STEPS (50)        timed optimizer steps
    BENCH_CHUNK (10)        steps fused per dispatch (lax.scan)
    BENCH_FAST=1            headline + bf16 only (skip samplers/ablations)
    PGT_NO_FLASH=1          disable the Pallas attention kernels globally
"""

import json
import os
import sys
import time

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12  # per chip
V5E_F32_PEAK_FLOPS = 98.5e12  # bf16/2 (no native f32 systolic path)


def _load_baselines():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


_ALL_RECORDS = []
_FULL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_FULL.json")


def _emit(metric, value, unit, baseline=None, **extra):
    rec = {"metric": metric, "value": round(float(value), 2), "unit": unit,
           "vs_baseline": (round(float(value) / baseline, 2)
                           if baseline else None)}
    rec.update(extra)
    print(json.dumps(rec), flush=True)
    # The driver's stdout capture keeps only the last ~20 lines; mirror the
    # COMPLETE per-metric set to BENCH_FULL.json (rewritten after every
    # metric so a timeout/kill still leaves everything measured so far).
    # BENCH_FAST A/B runs emit only 2 metrics — don't let them clobber the
    # committed full matrix.
    _ALL_RECORDS.append(rec)
    if os.environ.get("BENCH_FAST") != "1":
        with open(_FULL_PATH, "w") as f:
            json.dump(_ALL_RECORDS, f, indent=1)


def image_gpt_train_flops_per_sample(n_blocks=8, n_heads=2, c=64, l=784,
                                     mlp_mult=4):
    """Analytic fwd+bwd FLOPs per sample (matmuls only; convs/LN are noise).

    Per block: q (c->c), kv (c->2c), out (c->c), mlp (c->4c->4c c) projections
    at every position, plus the (L x L) attention score and value matmuls.
    Backward costs ~2x forward for matmuls.
    """
    proj = 2 * l * (c * c + c * 2 * c + c * c + 2 * mlp_mult * c * c)
    attn = 2 * l * l * (c + c)  # scores (d_k sum over heads = c) + p@v
    fwd = n_blocks * (proj + attn)
    return 3 * fwd  # fwd + ~2x fwd for bwd


def _make_imagegpt(key, use_flash=True, n_channels=64, n_heads=2):
    import jax

    from pytorch_generative_tpu import models

    # CausalAttention reads PGT_NO_FLASH at construction time.
    old = os.environ.get("PGT_NO_FLASH")
    if not use_flash:
        os.environ["PGT_NO_FLASH"] = "1"
    try:
        return models.ImageGPT(
            jax.random.PRNGKey(key), in_channels=1, out_channels=1,
            in_size=28, n_transformer_blocks=8, n_attention_heads=n_heads,
            n_embedding_channels=n_channels, in_shape=(28, 28, 1))
    finally:
        if not use_flash:
            if old is None:
                os.environ.pop("PGT_NO_FLASH", None)
            else:
                os.environ["PGT_NO_FLASH"] = old


def bench_train(model, batch_size, n_steps, chunk, compute_dtype=None,
                accum=1):
    """Returns samples/sec for the reproduce()-config training loop.

    ``accum`` > 1 averages gradients over that many scanned microbatches per
    optimizer step (exactly the full-batch math, Trainer(grad_accumulation)).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_generative_tpu import core
    from pytorch_generative_tpu import optim as optim_tpu

    tx, _ = optim_tpu.adam_multiplicative(5e-3, 0.999977)
    params, rest = core.partition(model)
    opt_state = tx.init(params)

    def loss_fn(params, x):
        m = core.combine(params, rest)
        if compute_dtype is not None:
            m = core.cast_floating(m, compute_dtype)
            x = x.astype(compute_dtype)
        preds = m.forward(x).astype(jnp.float32)
        x = x.astype(jnp.float32)
        n = x.shape[0]
        loss = optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1))
        return loss.sum(axis=1).mean()

    if accum > 1 and batch_size % accum:
        raise ValueError(
            f"batch size {batch_size} is not divisible by the derived "
            f"accumulation factor {accum} (BENCH_BIG_BATCH must be a "
            f"multiple of BENCH_BATCH_SIZE)")

    def train_step(carry, x):
        params, opt_state = carry
        if accum > 1:
            xs = x.reshape(accum, x.shape[0] // accum, *x.shape[1:])

            def micro(g_acc, xb):
                loss, g = jax.value_and_grad(loss_fn)(params, xb)
                return jax.tree_util.tree_map(lambda a, b: a + b, g_acc,
                                              g), loss

            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            grads, losses = jax.lax.scan(micro, zeros, xs)
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            loss = losses.mean()
        else:
            loss, grads = jax.value_and_grad(loss_fn)(params, x)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def train_chunk(params, opt_state, xs):
        (params, opt_state), losses = jax.lax.scan(
            train_step, (params, opt_state), xs)
        return params, opt_state, losses[-1]

    rng = np.random.default_rng(0)
    xs = (rng.random((chunk, batch_size, 28, 28, 1)) < 0.13).astype(np.float32)
    xs = jax.device_put(xs)

    params, opt_state, loss = train_chunk(params, opt_state, xs)  # compile
    float(loss)
    t0 = time.time()
    for _ in range(max(n_steps // chunk, 1)):
        params, opt_state, loss = train_chunk(params, opt_state, xs)
    float(loss)
    dt = time.time() - t0
    return batch_size * max(n_steps // chunk, 1) * chunk / dt


def bench_train_generic(model, loss_fn, x_batch, n_steps, chunk, lr=1e-3,
                        decay=0.999977, compute_dtype=None):
    """samples/sec for any model (incl. stateful forward_with_state, e.g.
    VQ-EMA codebooks) with the loss threaded through the metrics-dict
    protocol. Steps are fused lax.scan chunks like bench_train.

    ``compute_dtype`` casts activations+weights for the forward/backward
    (f32 master weights, the Trainer(compute_dtype=...) recipe); the loss
    is computed in f32.
    """
    import jax
    import jax.numpy as jnp

    from pytorch_generative_tpu import core
    from pytorch_generative_tpu import optim as optim_tpu

    tx, _ = optim_tpu.adam_multiplicative(lr, decay)
    params, rest = core.partition(model)
    opt_state = tx.init(params)

    def step(carry, x):
        params, rest, opt_state = carry

        def lf(p):
            m = core.combine(p, rest)
            xc = x
            if compute_dtype is not None:
                m = core.cast_floating(m, compute_dtype)
                xc = x.astype(compute_dtype)
            preds, new_m = m.forward_with_state(xc, training=True)
            if compute_dtype is not None:
                # Master precision on outputs and returned state (the
                # Trainer's recipe: exact for binary masks, no-op for the
                # state_field buffers, which stay f32 under cast_floating).
                to_f32 = lambda t: (t.astype(jnp.float32)
                                    if hasattr(t, "dtype")
                                    and jnp.issubdtype(t.dtype, jnp.floating)
                                    else t)
                preds = jax.tree_util.tree_map(to_f32, preds)
                new_m = jax.tree_util.tree_map(to_f32, new_m,
                                               is_leaf=lambda v: v is None)
            _, new_rest = core.partition(new_m)
            out = loss_fn(x, None, preds)
            loss = out["loss"] if isinstance(out, dict) else out
            return loss, new_rest

        (loss, new_rest), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax as _optax
        return (_optax.apply_updates(params, updates), new_rest,
                opt_state), loss

    @jax.jit
    def train_chunk(params, rest, opt_state, xs):
        (params, rest, opt_state), losses = jax.lax.scan(
            step, (params, rest, opt_state), xs)
        return params, rest, opt_state, losses[-1]

    xs = jax.device_put(jnp.broadcast_to(
        x_batch, (chunk,) + x_batch.shape))
    params, rest, opt_state, loss = train_chunk(params, rest, opt_state, xs)
    float(loss)
    t0 = time.time()
    for _ in range(max(n_steps // chunk, 1)):
        params, rest, opt_state, loss = train_chunk(params, rest, opt_state,
                                                    xs)
    float(loss)
    dt = time.time() - t0
    return x_batch.shape[0] * max(n_steps // chunk, 1) * chunk / dt


def bench_sampler(make_model, n_samples, n_rounds=3):
    """Returns images/sec for a jitted fast sampler (fetch-fenced)."""
    import jax
    import jax.numpy as jnp

    model = make_model()

    @jax.jit
    def sample(rng):
        return model.sample(rng, n_samples)

    out = sample(jax.random.PRNGKey(0))  # compile
    float(jnp.sum(out))
    t0 = time.time()
    for i in range(n_rounds):
        out = sample(jax.random.PRNGKey(i + 1))
        float(jnp.sum(out))
    dt = time.time() - t0
    return n_samples * n_rounds / dt


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - older jax versions
        pass

    import jax.numpy as jnp

    from pytorch_generative_tpu import models

    base = _load_baselines()
    train_base = base.get("reference_imagegpt_cpu_train_samples_per_sec")
    sample_base = base.get("reference_imagegpt_cpu_sample_images_per_sec")

    batch_size = int(os.environ.get("BENCH_BATCH_SIZE", "64"))
    n_steps = int(os.environ.get("BENCH_STEPS", "50"))
    chunk = int(os.environ.get("BENCH_CHUNK", "10"))
    fast = os.environ.get("BENCH_FAST") == "1"

    # Soft time budget: the headline metric (printed LAST) must always land,
    # so optional sections stop once the budget is spent. With the persistent
    # compile cache warm the full run is far under this.
    t_start = time.time()
    budget = float(os.environ.get("BENCH_TIME_BUDGET", "3300"))

    class _BudgetExceeded(Exception):
        pass

    def check_budget(section):
        if time.time() - t_start > budget:
            print(f"# bench: budget exhausted before {section}; "
                  f"skipping remaining optional sections", file=sys.stderr)
            raise _BudgetExceeded


    flops = image_gpt_train_flops_per_sample()

    # --- bf16 mixed-precision training (compute_dtype path). ---
    sps_bf16 = bench_train(_make_imagegpt(0), batch_size, n_steps, chunk,
                           compute_dtype=jnp.bfloat16)
    _emit("imagegpt_train_throughput_bf16", sps_bf16, "samples/sec",
          train_base, mfu=round(sps_bf16 * flops / V5E_BF16_PEAK_FLOPS, 4))

    moe_sps = None
    try:
        if fast:
            raise _BudgetExceeded  # skip all optional sections
        check_budget("xla-attention ablation")
        # --- Ablation: stock XLA attention instead of the Pallas kernels. ---
        sps_xla = bench_train(_make_imagegpt(0, use_flash=False), batch_size,
                              n_steps, chunk)
        _emit("imagegpt_train_throughput_xla_attention", sps_xla,
              "samples/sec", train_base)

        check_budget("batch scaling")
        # --- Batch-scaling point (bf16, large batch): what the chip can do.
        big_bs = int(os.environ.get("BENCH_BIG_BATCH", "512"))
        sps_big = bench_train(_make_imagegpt(0), big_bs,
                              max(n_steps // 2, chunk), chunk,
                              compute_dtype=jnp.bfloat16)
        _emit("imagegpt_train_throughput_bf16_bs512", sps_big, "samples/sec",
              train_base, batch_size=big_bs,
              mfu=round(sps_big * flops / V5E_BF16_PEAK_FLOPS, 4))

        # Same effective batch as 8 scanned 64-microbatches (identical math,
        # Trainer(grad_accumulation=8)): each microbatch keeps a VMEM-sized
        # working set, so the non-attention ops stream from VMEM instead of
        # HBM — the root cause of the direct-bs512 gap (PERF.md "Large
        # batches"; profile-measured: 3342 -> 4096 samples/s).
        sps_acc = bench_train(_make_imagegpt(0), big_bs,
                              max(n_steps // 2, chunk), chunk,
                              compute_dtype=jnp.bfloat16,
                              accum=max(big_bs // batch_size, 1))
        _emit("imagegpt_train_throughput_bf16_bs512_accum", sps_acc,
              "samples/sec", train_base, batch_size=big_bs,
              mfu=round(sps_acc * flops / V5E_BF16_PEAK_FLOPS, 4))

        check_budget("production-scale config")
        # --- Production-scale config: C=512 / 8 heads (d_k=64). The
        # reproduce() toy config (C=64, d_k=32) structurally caps bf16 MXU
        # utilization at 12.5% (32-deep contractions on a 256-deep bf16
        # systolic pass); this point shows what the framework sustains when
        # the model is big enough to fill the MXU.
        large = _make_imagegpt(0, n_channels=512, n_heads=8)
        sps_large = bench_train(large, batch_size, max(n_steps // 2, chunk),
                                chunk, compute_dtype=jnp.bfloat16)
        flops_large = image_gpt_train_flops_per_sample(c=512)
        _emit("imagegpt_large_train_throughput_bf16", sps_large,
              "samples/sec", None, n_channels=512, n_heads=8,
              mfu=round(sps_large * flops_large / V5E_BF16_PEAK_FLOPS, 4),
              flops_per_sample=flops_large)

        check_budget("production-scale config, d_k=128")
        # --- Same C=512 / identical FLOPs, but TPU-native head sizing:
        # 4 heads of d_k=128. d_k=64 feeds only a quarter of the MXU's
        # 256-deep bf16 contraction on every QK^T tile (and half its 128
        # lanes on AV), which structurally caps the attention kernels; a
        # 128-wide head matches the MXU exactly. This is the head sizing a
        # TPU deployment should pick (PERF.md).
        large4 = _make_imagegpt(0, n_channels=512, n_heads=4)
        sps_large4 = bench_train(large4, batch_size, max(n_steps // 2, chunk),
                                 chunk, compute_dtype=jnp.bfloat16)
        _emit("imagegpt_large_dk128_train_throughput_bf16", sps_large4,
              "samples/sec", None, n_channels=512, n_heads=4,
              mfu=round(sps_large4 * flops_large / V5E_BF16_PEAK_FLOPS, 4),
              flops_per_sample=flops_large)

        check_budget("samplers")
        # --- Fast samplers (reproduce() configs, n=16 like the reference).
        # On TPU these decode through the whole-raster-scan MXU kernel
        # (ops/decode_pallas.py::fused_sample_loop; PERF.md "Sampling").
        sps = bench_sampler(lambda: _make_imagegpt(0), 16)
        _emit("imagegpt_sample_throughput", sps, "images/sec", sample_base)

        # bf16 K|V cache ablation of the PER-POSITION fused step (the
        # whole-loop kernel is f32-cache only — Mosaic can't prove sublane
        # alignment for single-row stores into a (16,128)-tiled bf16 cache).
        os.environ["PGT_DECODE_CACHE_DTYPE"] = "bfloat16"
        try:
            sps = bench_sampler(lambda: _make_imagegpt(0), 16)
            _emit("imagegpt_sample_throughput_bf16cache", sps, "images/sec",
                  sample_base)
        finally:
            del os.environ["PGT_DECODE_CACHE_DTYPE"]

        # Batch scaling of the whole-loop kernel (tile-by-tile fori_loop).
        sps = bench_sampler(lambda: _make_imagegpt(0), 64, n_rounds=2)
        _emit("imagegpt_sample_throughput_n64", sps, "images/sec",
              sample_base)
        sps = bench_sampler(lambda: _make_imagegpt(0), 256, n_rounds=2)
        _emit("imagegpt_sample_throughput_n256", sps, "images/sec",
              sample_base)

        def pixel_cnn():
            return models.PixelCNN(
                jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                n_residual=15, residual_channels=16, head_channels=32,
                in_shape=(28, 28, 1))

        _emit("pixel_cnn_sample_throughput", bench_sampler(pixel_cnn, 16),
              "images/sec", sample_base)

        def gated():
            return models.GatedPixelCNN(
                jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                n_gated=10, gated_channels=128, head_channels=32,
                in_shape=(28, 28, 1))

        _emit("gated_pixel_cnn_sample_throughput", bench_sampler(gated, 16),
              "images/sec", sample_base)

        def made():
            return models.MADE(jax.random.PRNGKey(0), input_dim=784,
                               hidden_dims=[8000], n_masks=1,
                               in_shape=(28, 28, 1))

        _emit("made_sample_throughput", bench_sampler(made, 16),
              "images/sec", sample_base)

        def nade():
            return models.NADE(jax.random.PRNGKey(0), input_dim=784,
                               hidden_dim=500, in_shape=(28, 28, 1))

        _emit("nade_sample_throughput", bench_sampler(nade, 16),
              "images/sec", sample_base)

        def fvbn():
            return models.FullyVisibleBeliefNetwork(
                jax.random.PRNGKey(0), n_dims=784, in_shape=(28, 28, 1))

        _emit("fvbn_sample_throughput", bench_sampler(fvbn, 16),
              "images/sec", sample_base)

        def nice():
            return models.NICE(jax.random.PRNGKey(0), n_features=784,
                               n_coupling_blocks=4, n_hidden_layers=5,
                               n_hidden_features=1000, in_shape=(28, 28, 1))

        # One inverse pass (Z -> X) per batch: sample 256 at once so the
        # rate reflects the pass, not dispatch overhead.
        _emit("nice_sample_throughput", bench_sampler(nice, 256),
              "images/sec", sample_base)

        check_budget("secondary training")
        # --- Training throughput beyond the flagship: PixelCNN (masked-conv
        # family) and VQ-VAE (stateful EMA codebook path), reproduce() configs
        # vs the torch reference measured on this machine's CPU.
        pc = models.PixelCNN(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1,
            n_residual=15, residual_channels=16, head_channels=32,
            in_shape=(28, 28, 1))
        import optax as _optax

        def pc_loss(x, _, preds):
            n = x.shape[0]
            return _optax.sigmoid_binary_cross_entropy(
                preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()

        # Batch 256 = the reference reproduce() batch (pixel_cnn.py:156), the
        # same config its CPU baseline was measured at (bs 64 left the chip
        # ~3x underfed: 21k vs 62k samples/s).
        xb = jnp.asarray((np.random.default_rng(0).random(
            (256, 28, 28, 1)) < 0.13).astype(np.float32))
        sps = bench_train_generic(pc, pc_loss, xb, max(n_steps // 2, chunk),
                                  chunk)
        _emit("pixel_cnn_train_throughput", sps, "samples/sec",
              base.get("reference_pixel_cnn_cpu_train_samples_per_sec"))

        vq = models.VectorQuantizedVAE(
            jax.random.PRNGKey(0), in_channels=3, out_channels=3,
            hidden_channels=128, residual_channels=32, n_residual_blocks=2,
            n_embeddings=512, embedding_dim=64, in_shape=(32, 32, 3))

        def vq_loss(x, _, preds):
            preds, vql = preds
            return jnp.mean((preds - x) ** 2) + vql

        xv = jnp.asarray(np.random.default_rng(1).random(
            (128, 32, 32, 3)).astype(np.float32))
        sps = bench_train_generic(vq, vq_loss, xv, max(n_steps // 2, chunk),
                                  chunk, lr=2e-4)
        _emit("vq_vae_train_throughput", sps, "samples/sec",
              base.get("reference_vq_vae_cpu_train_samples_per_sec"))

        if os.environ.get("BENCH_SNAIL", "1") == "1":
            def snail():
                return models.PixelSNAIL(
                    jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                    n_channels=64, n_pixel_snail_blocks=8,
                    n_residual_blocks=2, attention_key_channels=4,
                    attention_value_channels=32, in_shape=(28, 28, 1))

            # n=16 and n=64 run the whole-loop MXU kernel
            # (snail_decode_pallas.py, gated at n // tile <= 2; the rolling
            # two-row conv caches put tile at 32, so n=64 is 2 passes);
            # larger n stays on the XLA incremental sampler, whose batch
            # scaling wins past 2 tiles (n=256: 1035 vs 1021 img/s).
            _emit("pixel_snail_sample_throughput", bench_sampler(snail, 16),
                  "images/sec", sample_base)
            _emit("pixel_snail_sample_throughput_n64",
                  bench_sampler(snail, 64, n_rounds=2), "images/sec",
                  sample_base)

            xs_ = jnp.asarray((np.random.default_rng(2).random(
                (128, 28, 28, 1)) < 0.13).astype(np.float32))
            sps = bench_train_generic(snail(), pc_loss, xs_,
                                      max(n_steps // 2, chunk), chunk)
            _emit("pixel_snail_train_throughput", sps, "samples/sec",
                  base.get("reference_pixel_snail_cpu_train_samples_per_sec"))

            # bf16 mixed precision (f32 master weights): conv+attention MXU
            # tiles at native width. Measured +45% over f32 on v5e.
            sps = bench_train(snail(), 128, max(n_steps // 2, chunk), chunk,
                              compute_dtype="bfloat16")
            _emit("pixel_snail_train_throughput_bf16", sps, "samples/sec",
                  base.get("reference_pixel_snail_cpu_train_samples_per_sec"))

        check_budget("gated_pixel_cnn")
        # --- GatedPixelCNN: the two-stream masked-conv family, reproduce()
        # config (10 gated layers, 128 channels).
        gp = models.GatedPixelCNN(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1, n_gated=10,
            gated_channels=128, head_channels=32, in_shape=(28, 28, 1))
        xg = jnp.asarray((np.random.default_rng(5).random(
            (128, 28, 28, 1)) < 0.13).astype(np.float32))
        sps = bench_train_generic(gp, pc_loss, xg, max(n_steps // 2, chunk),
                                  chunk)
        _emit("gated_pixel_cnn_train_throughput", sps, "samples/sec",
              base.get("reference_gated_pixel_cnn_cpu_train_samples_per_sec"))

        # bf16 mixed precision: the 128-channel two-stream convs fill bf16
        # MXU tiles. Measured +84% over f32 on v5e.
        gp16 = models.GatedPixelCNN(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1, n_gated=10,
            gated_channels=128, head_channels=32, in_shape=(28, 28, 1))
        sps = bench_train(gp16, 128, max(n_steps // 2, chunk), chunk,
                          compute_dtype="bfloat16")
        _emit("gated_pixel_cnn_train_throughput_bf16", sps, "samples/sec",
              base.get("reference_gated_pixel_cnn_cpu_train_samples_per_sec"))

        check_budget("made")
        # --- MADE: the masked-MLP family (one 8000-wide hidden layer).
        md = models.MADE(jax.random.PRNGKey(0), input_dim=784,
                         hidden_dims=[8000], n_masks=1, in_shape=(28, 28, 1))
        xmade = jnp.asarray((np.random.default_rng(6).random(
            (128, 28, 28, 1)) < 0.13).astype(np.float32))
        sps = bench_train_generic(md, pc_loss, xmade,
                                  max(n_steps // 2, chunk), chunk)
        _emit("made_train_throughput", sps, "samples/sec",
              base.get("reference_made_cpu_train_samples_per_sec"))

        # bf16: the 8000-wide hidden layer is one giant masked matmul —
        # native-width MXU tiles. Measured +44% over f32 on v5e.
        md16 = models.MADE(jax.random.PRNGKey(0), input_dim=784,
                           hidden_dims=[8000], n_masks=1, in_shape=(28, 28, 1))
        sps = bench_train(md16, 128, max(n_steps // 2, chunk), chunk,
                          compute_dtype="bfloat16")
        _emit("made_train_throughput_bf16", sps, "samples/sec",
              base.get("reference_made_cpu_train_samples_per_sec"))

        check_budget("small-model tail")
        # --- The small-model tail: every remaining trainable model gets a
        # train metric vs its measured reference CPU baseline (reproduce()
        # configs and losses throughout).
        nade = models.NADE(jax.random.PRNGKey(0), input_dim=784,
                           hidden_dim=500, in_shape=(28, 28, 1))
        xn = jnp.asarray((np.random.default_rng(7).random(
            (512, 28, 28, 1)) < 0.13).astype(np.float32))
        sps = bench_train_generic(nade, pc_loss, xn, max(n_steps // 2, chunk),
                                  chunk)
        _emit("nade_train_throughput", sps, "samples/sec",
              base.get("reference_nade_cpu_train_samples_per_sec"))

        fvbn = models.FullyVisibleBeliefNetwork(
            jax.random.PRNGKey(0), n_dims=784, in_shape=(28, 28, 1))
        sps = bench_train_generic(fvbn, pc_loss, xn,
                                  max(n_steps // 2, chunk), chunk)
        _emit("fvbn_train_throughput", sps, "samples/sec",
              base.get("reference_fvbn_cpu_train_samples_per_sec"))

        nice = models.NICE(jax.random.PRNGKey(0), n_features=784,
                           n_coupling_blocks=4, n_hidden_layers=5,
                           n_hidden_features=1000, in_shape=(28, 28, 1))

        def nice_loss(x, _, preds):
            preds, log_det = preds
            log_prob = -(jax.nn.softplus(preds)
                         + jax.nn.softplus(-preds)).sum(axis=(1, 2, 3))
            return -(log_prob + log_det).mean()

        xnice = jnp.asarray(np.random.default_rng(8).random(
            (1024, 28, 28, 1)).astype(np.float32))
        sps = bench_train_generic(nice, nice_loss, xnice,
                                  max(n_steps // 2, chunk), chunk)
        _emit("nice_train_throughput", sps, "samples/sec",
              base.get("reference_nice_cpu_train_samples_per_sec"))

        vae = models.VAE(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                         latent_channels=16, strides=(2, 2, 2, 2),
                         hidden_channels=64, residual_channels=32,
                         in_shape=(32, 32, 1))

        def elbo_loss(x, _, preds):
            preds, kl_div = preds
            recon = _optax.sigmoid_binary_cross_entropy(preds, x).sum(
                axis=(1, 2, 3))
            return (recon + kl_div).mean()

        sps = bench_train_generic(vae, elbo_loss, jnp.asarray(
            (np.random.default_rng(9).random((128, 32, 32, 1)) < 0.13
             ).astype(np.float32)), max(n_steps // 2, chunk), chunk, lr=5e-4)
        _emit("vae_train_throughput", sps, "samples/sec",
              base.get("reference_vae_cpu_train_samples_per_sec"))

        vq2 = models.VectorQuantizedVAE2(
            jax.random.PRNGKey(0), in_channels=3, out_channels=3,
            hidden_channels=128, n_residual_blocks=2, residual_channels=64,
            n_embeddings=512, embedding_dim=64, in_shape=(32, 32, 3))

        def vq2_loss(x, _, preds):
            preds, vql = preds
            return jnp.mean((preds - x) ** 2) + 0.25 * vql

        sps = bench_train_generic(vq2, vq2_loss, jnp.asarray(
            np.random.default_rng(10).random((128, 32, 32, 3)).astype(
                np.float32)), max(n_steps // 2, chunk), chunk, lr=2e-4)
        _emit("vq_vae_2_train_throughput", sps, "samples/sec",
              base.get("reference_vq_vae_2_cpu_train_samples_per_sec"))

        check_budget("vd_vae")
        # --- VD-VAE: the hierarchical-VAE family heavyweight, reproduce()
        # config (6 stacks, hidden 64, latent 16 on padded-32 MNIST).
        from pytorch_generative_tpu.models.vae.vd_vae import StackConfig
        vd = models.VeryDeepVAE(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1,
            input_resolution=32,
            stack_configs=(
                StackConfig(n_encoder_blocks=3, n_decoder_blocks=5),
                StackConfig(n_encoder_blocks=3, n_decoder_blocks=5),
                StackConfig(n_encoder_blocks=2, n_decoder_blocks=4),
                StackConfig(n_encoder_blocks=2, n_decoder_blocks=3),
                StackConfig(n_encoder_blocks=2, n_decoder_blocks=2),
                StackConfig(n_encoder_blocks=1, n_decoder_blocks=1)),
            latent_channels=16, hidden_channels=64, bottleneck_channels=32,
            in_shape=(32, 32, 1))

        def vd_loss(x, _, preds):
            preds, kl_div = preds
            recon = _optax.sigmoid_binary_cross_entropy(preds, x).sum(
                axis=(1, 2, 3))
            return (recon + kl_div).mean()

        xd = jnp.asarray((np.random.default_rng(3).random(
            (128, 32, 32, 1)) < 0.13).astype(np.float32))
        sps = bench_train_generic(vd, vd_loss, xd, max(n_steps // 2, chunk),
                                  chunk, lr=5e-4)
        _emit("vd_vae_train_throughput", sps, "samples/sec",
              base.get("reference_vd_vae_cpu_train_samples_per_sec"))

        # bf16 mixed precision: the hierarchical residual stacks are
        # memory/VPU bound at 64 channels, so the MXU win is modest
        # (measured 3,445 -> 4,046 samples/s, +17% over f32 on v5e).
        sps = bench_train_generic(vd, vd_loss, xd, max(n_steps // 2, chunk),
                                  chunk, lr=5e-4,
                                  compute_dtype=jnp.bfloat16)
        _emit("vd_vae_train_throughput_bf16", sps, "samples/sec",
              base.get("reference_vd_vae_cpu_train_samples_per_sec"))

        check_budget("imagegpt_moe")
        # --- ImageGPT-MoE: sparse-MLP flagship variant (8 experts, one-hot
        # einsum Switch routing). No reference counterpart. With top-1
        # routing and expert hidden width 4C the ACTIVE FLOPs per token match
        # dense ImageGPT's MLPs exactly (one 4C MLP each), so the dense-ratio
        # emitted with the headline is an at-matched-active-FLOPs comparison.
        # cf=1.0 + group_size=98 (GShard group-size control) is the
        # speed-optimal capacity, and its quality is MEASURED, not estimated:
        # the bench_quality.py image_gpt_moe_cf1 row converges to NLL 287.2
        # vs dense ImageGPT's 285.9 at matched active FLOPs (+0.45%, within
        # tolerance; cf=1.25 row: 284.0, -0.7%). PERF.md "MoE routing" has
        # the cf/group-size profile (0.53x -> 0.80x dense).
        moe = models.ImageGPTMoE(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=28,
            n_transformer_blocks=8, n_attention_heads=2,
            n_embedding_channels=64, n_experts=8, capacity_factor=1.0,
            group_size=98, in_shape=(28, 28, 1))

        def moe_loss(x, _, preds):
            logits, aux = preds
            n = x.shape[0]
            bce = _optax.sigmoid_binary_cross_entropy(
                logits.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()
            return bce + 0.01 * aux

        xm = jnp.asarray((np.random.default_rng(4).random(
            (64, 28, 28, 1)) < 0.13).astype(np.float32))
        moe_sps = bench_train_generic(moe, moe_loss, xm,
                                      max(n_steps // 2, chunk), chunk, lr=5e-3)
        _emit("imagegpt_moe_train_throughput", moe_sps, "samples/sec", None)

    except _BudgetExceeded:
        pass

    # --- Headline LAST: f32 reproduce()-config training throughput. ---
    sps = bench_train(_make_imagegpt(0), batch_size, n_steps, chunk)
    if moe_sps is not None:
        _emit("imagegpt_moe_vs_dense_ratio", round(moe_sps / sps, 4),
              "ratio", None)
    _emit("imagegpt_train_throughput", sps, "samples/sec", train_base,
          mfu=round(sps * flops / V5E_F32_PEAK_FLOPS, 4),
          flops_per_sample=flops)


if __name__ == "__main__":
    main()
