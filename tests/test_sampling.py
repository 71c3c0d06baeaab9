"""Fast (KV-cache) sampler vs naive full-forward sampler equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_generative_tpu import models

KEY = jax.random.PRNGKey(11)


def _deterministic_sample_fn(rng, logits):
    del rng
    return (logits > 0).astype(jnp.float32)


def test_image_gpt_fast_sampler_matches_naive():
    model = models.ImageGPT(
        KEY, in_channels=1, out_channels=1, in_size=6, n_transformer_blocks=2,
        n_attention_heads=2, n_embedding_channels=8, in_shape=(6, 6, 1),
        sample_fn=_deterministic_sample_fn)
    rng = jax.random.PRNGKey(0)
    naive = model.sample_naive(rng, n_samples=2)
    fast = model.sample(rng, n_samples=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), atol=1e-5)


def test_pixel_cnn_fast_sampler_matches_naive():
    model = models.PixelCNN(
        KEY, in_channels=1, out_channels=1, n_residual=2, residual_channels=4,
        head_channels=4, in_shape=(6, 6, 1),
        sample_fn=_deterministic_sample_fn)
    rng = jax.random.PRNGKey(0)
    naive = model.sample_naive(rng, n_samples=2)
    fast = model.sample(rng, n_samples=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), atol=1e-5)

    # Conditional inpainting too.
    batch = (jax.random.uniform(rng, (2, 6, 6, 1)) > 0.5).astype(jnp.float32)
    conditioned = batch.at[:, 3:, :, :].set(-1)
    fast = model.sample(rng, conditioned_on=conditioned)
    naive = model.sample_naive(rng, conditioned_on=conditioned)
    np.testing.assert_allclose(np.asarray(fast[:, :3]),
                               np.asarray(batch[:, :3]))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), atol=1e-5)


def test_made_incremental_sampler_matches_generic():
    """Single-hidden-layer MADE uses the rank-1 incremental path; it must
    match the generic full-forward-per-dim scan exactly."""
    model = models.MADE(KEY, input_dim=16, hidden_dims=[12], n_masks=1,
                        in_shape=(4, 4, 1), sample_fn=_deterministic_sample_fn)
    rng = jax.random.PRNGKey(0)
    fast = model.sample(rng, n_samples=3)

    order = jnp.argsort(model.orderings[0])
    rngs = jax.random.split(jax.random.split(rng)[1], 16)
    x = -jnp.ones((3, 16))
    for step_i in range(16):
        dim = order[step_i]
        out = model._forward(x, 0)[:, dim]
        out = _deterministic_sample_fn(rngs[step_i], out)
        x = x.at[:, dim].set(jnp.where(x[:, dim] < 0, out, x[:, dim]))
    np.testing.assert_allclose(np.asarray(fast.reshape(3, 16)), np.asarray(x),
                               atol=1e-5)


def test_fvbn_column_sampler_matches_full_forward():
    model = models.FullyVisibleBeliefNetwork(
        KEY, n_dims=16, in_shape=(4, 4, 1),
        sample_fn=_deterministic_sample_fn)
    rng = jax.random.PRNGKey(0)
    fast = model.sample(rng, n_samples=3)
    naive = models.base.AutoregressiveModel.sample(model, rng, n_samples=3)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), atol=1e-5)


def test_gated_pixel_cnn_fast_sampler_matches_naive():
    model = models.GatedPixelCNN(
        KEY, in_channels=1, out_channels=1, n_gated=2, gated_channels=4,
        head_channels=4, in_shape=(6, 6, 1),
        sample_fn=_deterministic_sample_fn)
    rng = jax.random.PRNGKey(0)
    naive = model.sample_naive(rng, n_samples=2)
    fast = model.sample(rng, n_samples=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), atol=1e-4)

    # Conditional inpainting (post-merge v-cache subtlety).
    batch = (jax.random.uniform(rng, (2, 6, 6, 1)) > 0.5).astype(jnp.float32)
    conditioned = batch.at[:, 3:, :, :].set(-1)
    fast = model.sample(rng, conditioned_on=conditioned)
    naive = model.sample_naive(rng, conditioned_on=conditioned)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), atol=1e-4)


def test_pixel_snail_fast_sampler_matches_naive():
    model = models.PixelSNAIL(
        KEY, in_channels=1, out_channels=1, n_channels=4,
        n_pixel_snail_blocks=2, n_residual_blocks=2, attention_key_channels=2,
        attention_value_channels=2, in_shape=(6, 6, 1),
        sample_fn=_deterministic_sample_fn)
    rng = jax.random.PRNGKey(0)
    naive = model.sample_naive(rng, n_samples=2)
    fast = model.sample(rng, n_samples=2)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), atol=1e-4)

    # Conditional inpainting (the extra_x / post-merge KV subtlety).
    batch = (jax.random.uniform(rng, (2, 6, 6, 1)) > 0.5).astype(jnp.float32)
    conditioned = batch.at[:, 3:, :, :].set(-1)
    fast = model.sample(rng, conditioned_on=conditioned)
    naive = model.sample_naive(rng, conditioned_on=conditioned)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), atol=1e-4)


def test_image_gpt_fast_sampler_inpainting():
    model = models.ImageGPT(
        KEY, in_channels=1, out_channels=1, in_size=6, n_transformer_blocks=1,
        n_attention_heads=2, n_embedding_channels=8, in_shape=(6, 6, 1),
        sample_fn=_deterministic_sample_fn)
    rng = jax.random.PRNGKey(0)
    batch = (jax.random.uniform(rng, (2, 6, 6, 1)) > 0.5).astype(jnp.float32)
    conditioned = batch.at[:, 2:, :, :].set(-1)
    fast = model.sample(rng, conditioned_on=conditioned)
    naive = model.sample_naive(rng, conditioned_on=conditioned)
    # Observed rows are untouched; generated rows match the naive sampler.
    np.testing.assert_allclose(np.asarray(fast[:, :2]), np.asarray(batch[:, :2]))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), atol=1e-5)
