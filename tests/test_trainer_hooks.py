"""The Trainer's overridable compute_metrics seam (reference: train_one_batch /
eval_one_batch hooks)."""

import jax
import numpy as np
import optax

from pytorch_generative_tpu import debug, models, trainer


class CustomTrainer(trainer.Trainer):
    def compute_metrics(self, model, x, y, rng, training):
        metrics, new_model = super().compute_metrics(model, x, y, rng,
                                                     training)
        metrics["doubled_loss"] = 2.0 * metrics["loss"]
        return metrics, new_model


def test_mixed_precision_training(tmp_path):
    """compute_dtype=bfloat16: master weights stay f32, loss finite and
    decreasing, grads applied."""
    import jax.numpy as jnp

    model = models.PixelCNN(jax.random.PRNGKey(0), in_channels=1,
                            out_channels=1, n_residual=1, residual_channels=4,
                            head_channels=4, in_shape=(8, 8, 1))
    loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=4)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(1).mean()

    t = trainer.Trainer(model=model, loss_fn=loss_fn,
                        optimizer=optax.adam(2e-3), train_loader=loader,
                        eval_loader=loader, log_dir=str(tmp_path),
                        use_tensorboard=False, compute_dtype=jnp.bfloat16)
    x = np.random.default_rng(0).random((4, 8, 8, 1)).astype(np.float32)
    losses = []
    for _ in range(60):
        metrics, _ = t.train_one_step(x, None)
        losses.append(float(np.asarray(jax.device_get(metrics)["loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # Master weights remain f32.
    for leaf in jax.tree_util.tree_leaves(t._params):
        assert leaf.dtype == jnp.float32


def test_bf16_forward_stays_bf16_models_with_constants():
    """Models that construct constants inside forward (PixelSNAIL's coordinate
    channels, VD-VAE's top-down zeros) must not promote a bf16 activation
    stream back to f32 — regression test for the conv dtype-mismatch crash
    under compute_dtype=bfloat16."""
    import jax.numpy as jnp

    from pytorch_generative_tpu import core
    from pytorch_generative_tpu.models.vae.vd_vae import StackConfig

    snail = models.PixelSNAIL(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, n_channels=8,
        n_pixel_snail_blocks=1, n_residual_blocks=1,
        attention_key_channels=4, attention_value_channels=8,
        in_shape=(8, 8, 1))
    x = jnp.zeros((2, 8, 8, 1), jnp.bfloat16)
    out = core.cast_floating(snail, jnp.bfloat16).forward(x)
    assert out.dtype == jnp.bfloat16

    vd = models.VeryDeepVAE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1,
        input_resolution=8,
        stack_configs=(StackConfig(n_encoder_blocks=1, n_decoder_blocks=1),
                       StackConfig(n_encoder_blocks=1, n_decoder_blocks=1)),
        latent_channels=4, hidden_channels=8, bottleneck_channels=4,
        in_shape=(8, 8, 1))
    preds, kl = core.cast_floating(vd, jnp.bfloat16).forward(
        x, rng=jax.random.PRNGKey(1))
    assert preds.dtype == jnp.bfloat16


def test_compute_metrics_override(tmp_path):
    model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                        in_shape=(4, 4, 1))
    loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=2)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(1).mean()

    t = CustomTrainer(model=model, loss_fn=loss_fn,
                      optimizer=optax.adam(1e-3), train_loader=loader,
                      eval_loader=loader, log_dir=str(tmp_path),
                      use_tensorboard=False)
    x = np.random.default_rng(0).random((2, 4, 4, 1)).astype(np.float32)
    metrics, _ = t.train_one_step(x, None)
    metrics = jax.device_get(metrics)
    np.testing.assert_allclose(float(metrics["doubled_loss"]),
                               2 * float(metrics["loss"]), rtol=1e-6)


def test_mixed_precision_keeps_vq_ema_stats_f32(tmp_path):
    """Under compute_dtype=bfloat16, stateful VQ-EMA buffers (core.state_field)
    must stay float32 end-to-end: 16-bit rounding would drift over a long run."""
    import jax.numpy as jnp

    model = models.VectorQuantizedVAE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1,
        hidden_channels=8, n_residual_blocks=1, residual_channels=4,
        n_embeddings=8, embedding_dim=4, in_shape=(8, 8, 1))
    loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=4)

    def loss_fn(x, _, preds):
        preds, vq_loss = preds
        return jnp.mean((preds - x) ** 2) + vq_loss

    t = trainer.Trainer(model=model, loss_fn=loss_fn,
                        optimizer=optax.adam(1e-3), train_loader=loader,
                        eval_loader=loader, log_dir=str(tmp_path),
                        use_tensorboard=False, compute_dtype=jnp.bfloat16)
    init_vq = jax.device_get(t.model.quantizer.vq)
    x = np.random.default_rng(0).random((4, 8, 8, 1)).astype(np.float32)
    for _ in range(3):
        t.train_one_step(x, None)
    vq = jax.device_get(t.model.quantizer.vq)
    for buf in (vq.ema_embedding, vq.ema_cluster_size, vq.ema_embedding_avg):
        assert buf.dtype == jnp.float32
    # And the stats actually updated (the EMA ran).
    assert not np.allclose(vq.ema_cluster_size, init_vq.ema_cluster_size)


def test_grad_accumulation_matches_full_batch(tmp_path):
    """grad_accumulation=4 must reproduce the full-batch step exactly (mean of
    equal-chunk means), including under clip_grad_norm."""
    import jax
    import numpy as np
    import optax

    from pytorch_generative_tpu import debug, models, trainer

    x = np.random.default_rng(0).random((16, 4, 4, 1)).astype(np.float32)

    def loss_fn(xb, _, preds):
        n = xb.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

    def make(accum):
        model = models.ImageGPT(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=4,
            n_transformer_blocks=2, n_attention_heads=2,
            n_embedding_channels=8, in_shape=(4, 4, 1))
        loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=16)
        return trainer.Trainer(
            model=model, loss_fn=loss_fn, optimizer=optax.adam(1e-3),
            train_loader=loader, eval_loader=loader, clip_grad_norm=1.0,
            grad_accumulation=accum, log_dir=str(tmp_path / f"ga{accum}"),
            use_tensorboard=False)

    t1 = make(1)
    m1, _ = t1.train_one_step(x, None)
    t4 = make(4)
    m4, _ = t4.train_one_step(x, None)

    np.testing.assert_allclose(float(np.asarray(m1["loss"])),
                               float(np.asarray(m4["loss"])), rtol=1e-6)
    np.testing.assert_allclose(float(np.asarray(m1["grad_norm"])),
                               float(np.asarray(m4["grad_norm"])), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(t1._params)),
                    jax.tree_util.tree_leaves(jax.device_get(t4._params))):
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_skip_nonfinite_guards_parameters(tmp_path):
    """A NaN loss must leave parameters and optimizer state untouched when
    skip_nonfinite=True, and be counted in the nonfinite_steps metric."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_generative_tpu import debug, models, trainer

    model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                        in_shape=(4, 4, 1))
    loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=8)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        base = optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(1).mean()
        # NaN iff the batch is flagged (first pixel < 0 never happens in real
        # data; we inject it below).
        return jnp.where(x[0, 0, 0, 0] < 0, jnp.nan, base)

    t = trainer.Trainer(model=model, loss_fn=loss_fn, optimizer=optax.adam(1e-3),
                        train_loader=loader, eval_loader=loader,
                        skip_nonfinite=True, log_dir=str(tmp_path / "guard"),
                        use_tensorboard=False)

    x_ok = np.random.default_rng(0).random((8, 4, 4, 1)).astype(np.float32)
    m, _ = t.train_one_step(x_ok, None)
    assert float(np.asarray(m["nonfinite_steps"])) == 0.0
    params_before = jax.device_get(t._params)

    x_bad = x_ok.copy()
    x_bad[0, 0, 0, 0] = -1.0
    m, _ = t.train_one_step(x_bad, None)
    assert float(np.asarray(m["nonfinite_steps"])) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(jax.device_get(t._params))):
        np.testing.assert_array_equal(a, b)

    # Recovery: the next finite step trains normally.
    m, _ = t.train_one_step(x_ok, None)
    assert float(np.asarray(m["nonfinite_steps"])) == 0.0


def test_async_checkpoint_roundtrip(tmp_path):
    """async_checkpoint=True must produce the same restorable checkpoint as
    the synchronous path."""
    import jax
    import numpy as np
    import optax

    from pytorch_generative_tpu import debug, models, trainer

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(1).mean()

    def make(log_dir):
        model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                            in_shape=(4, 4, 1))
        loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=8, n_batches=2)
        return trainer.Trainer(
            model=model, loss_fn=loss_fn, optimizer=optax.adam(1e-3),
            train_loader=loader, eval_loader=loader, log_dir=str(log_dir),
            async_checkpoint=True, sample_epochs=100, use_tensorboard=False)

    t = make(tmp_path / "async")
    t.interleaved_train_and_eval(2)
    t.join_pending_checkpoint()
    params_trained = jax.device_get(t._params)

    t2 = make(tmp_path / "async")
    t2.restore_checkpoint()
    assert t2._epoch == 2
    for a, b in zip(jax.tree_util.tree_leaves(params_trained),
                    jax.tree_util.tree_leaves(jax.device_get(t2._params))):
        np.testing.assert_array_equal(a, b)


def test_grad_accumulation_ragged_batch_trains_all_samples(tmp_path):
    """A batch smaller than (or not divisible by) grad_accumulation must be
    computed whole — same result as the accumulation-free Trainer, no NaNs,
    no silently dropped samples."""
    import jax
    import numpy as np
    import optax

    from pytorch_generative_tpu import debug, models, trainer

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(1).mean()

    def make(accum, tag):
        model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                            in_shape=(4, 4, 1))
        loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=8)
        return trainer.Trainer(
            model=model, loss_fn=loss_fn, optimizer=optax.adam(1e-3),
            train_loader=loader, eval_loader=loader,
            grad_accumulation=accum, log_dir=str(tmp_path / f"rg{tag}"),
            use_tensorboard=False)

    # batch 20 with accum 8 (non-divisible) and batch 4 with accum 8 (smaller).
    for shape in [(20, 4, 4, 1), (4, 4, 4, 1)]:
        x = np.random.default_rng(0).random(shape).astype(np.float32)
        t1 = make(1, f"a{shape[0]}")
        m1, _ = t1.train_one_step(x, None)
        t8 = make(8, f"b{shape[0]}")
        m8, _ = t8.train_one_step(x, None)
        np.testing.assert_allclose(float(np.asarray(m1["loss"])),
                                   float(np.asarray(m8["loss"])), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(t1._params)),
                        jax.tree_util.tree_leaves(jax.device_get(t8._params))):
            np.testing.assert_allclose(a, b, atol=1e-7)


def test_skip_nonfinite_guards_stateful_buffers(tmp_path):
    """A NaN step with skip_nonfinite=True must leave VQ-EMA statistics (model
    state, not just params) untouched, so training can recover."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_generative_tpu import debug, models, trainer

    model = models.VectorQuantizedVAE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1,
        hidden_channels=8, n_residual_blocks=1, residual_channels=4,
        n_embeddings=16, embedding_dim=4, in_shape=(8, 8, 1))
    loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=8)

    def loss_fn(x, _, preds):
        preds, vq_loss = preds
        base = jnp.mean((preds - x) ** 2) + vq_loss
        return jnp.where(x[0, 0, 0, 0] < 0, jnp.nan, base)

    t = trainer.Trainer(model=model, loss_fn=loss_fn,
                        optimizer=optax.adam(1e-3), train_loader=loader,
                        eval_loader=loader, skip_nonfinite=True,
                        log_dir=str(tmp_path / "vqguard"),
                        use_tensorboard=False)

    x_ok = np.random.default_rng(0).random((8, 8, 8, 1)).astype(np.float32)
    t.train_one_step(x_ok, None)
    rest_before = jax.device_get(t._rest)

    x_bad = x_ok.copy()
    x_bad[0, 0, 0, 0] = -1.0
    m, _ = t.train_one_step(x_bad, None)
    assert float(np.asarray(m["nonfinite_steps"])) == 1.0
    for a, b in zip(jax.tree_util.tree_leaves(rest_before),
                    jax.tree_util.tree_leaves(jax.device_get(t._rest))):
        np.testing.assert_array_equal(a, b)

    # Recovery: next finite step is finite and updates state.
    m, _ = t.train_one_step(x_ok, None)
    assert float(np.asarray(m["nonfinite_steps"])) == 0.0
    assert np.isfinite(float(np.asarray(m["loss"])))


def test_cli_default_overrides_reach_trainer(tmp_path):
    """set_default_overrides (the train.py CLI hook) must apply to Trainer
    arguments left at their defaults and be beaten by explicit arguments."""
    import jax
    import optax

    from pytorch_generative_tpu import debug, models, trainer

    def loss_fn(x, _, preds):
        import optax as _o
        n = x.shape[0]
        return _o.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(1).mean()

    def make(**kw):
        model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                            in_shape=(4, 4, 1))
        loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=8)
        return trainer.Trainer(
            model=model, loss_fn=loss_fn, optimizer=optax.adam(1e-3),
            train_loader=loader, eval_loader=loader,
            log_dir=str(tmp_path / "cli"), use_tensorboard=False, **kw)

    trainer.set_default_overrides(grad_accumulation=4, skip_nonfinite=True,
                                  compute_dtype="bfloat16")
    try:
        t = make()
        assert t.grad_accumulation == 4
        assert t.skip_nonfinite is True
        assert str(t.compute_dtype) == "bfloat16"
        # Explicit argument beats the override.
        t2 = make(grad_accumulation=2)
        assert t2.grad_accumulation == 2
        import pytest
        with pytest.raises(ValueError):
            trainer.set_default_overrides(not_a_real_arg=1)
    finally:
        trainer.set_default_overrides()  # clear

    t3 = make()
    assert t3.grad_accumulation == 1 and t3.skip_nonfinite is False
