"""Model tests mirroring the reference's four strategies
(/root/reference/pytorch_generative/models/tests.py):

1. End-to-end integration via reproduce() with a debug loader.
2. Shape/correctness on multi-channel inputs, incl. the conditional-sampling
   contract (pixels >= 0 in conditioned_on must be preserved).
3. Numerical property tests (see test_kde.py).
4. API contracts: auto_reshape on image inputs; sampling after a checkpoint
   round-trip into a fresh model.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_generative_tpu import core, debug, models
from pytorch_generative_tpu.utils import checkpoint as ckpt_utils

KEY = jax.random.PRNGKey(7)


# ---------------------------------------------------------------------------
# 1. Integration tests: reproduce() end-to-end with a dummy loader.
# ---------------------------------------------------------------------------

# (module path, channels, size) — mirrors IntegrationTests at tests.py:30-77.
INTEGRATION_CONFIGS = [
    ("autoregressive.fvbn", 1, 28),
    ("autoregressive.made", 1, 28),
    ("autoregressive.nade", 1, 28),
    ("autoregressive.pixel_cnn", 1, 28),
    ("autoregressive.gated_pixel_cnn", 1, 28),
    ("autoregressive.image_gpt", 1, 28),
    ("autoregressive.pixel_snail", 1, 28),
    ("vae.vae", 1, 32),
    ("vae.beta_vae", 1, 32),
    ("vae.vd_vae", 1, 32),
    ("vae.vq_vae", 3, 32),
    ("vae.vq_vae_2", 3, 32),
    ("flow.nice", 1, 28),
]


@pytest.mark.parametrize("path,channels,size", INTEGRATION_CONFIGS,
                         ids=[p for p, _, _ in INTEGRATION_CONFIGS])
def test_reproduce_integration(path, channels, size):
    module = __import__(f"pytorch_generative_tpu.models.{path}",
                        fromlist=[path.rsplit(".", 1)[-1]])
    loader = debug.DummyLoader(shape=(size, size, channels), batch_size=1)
    with tempfile.TemporaryDirectory() as log_dir:
        module.reproduce(n_epochs=1, log_dir=log_dir, n_devices=1,
                         debug_loader=loader)


# ---------------------------------------------------------------------------
# 2. Shape & conditional-sampling contracts on multi-channel inputs.
# ---------------------------------------------------------------------------

IN_SHAPE = (8, 8, 3)


def _ar_models():
    """Tiny multi-channel AR configs mirroring tests.py:96-134."""
    return [
        ("nade", models.NADE(KEY, input_dim=192, hidden_dim=16,
                             in_shape=IN_SHAPE)),
        ("made", models.MADE(KEY, input_dim=192, hidden_dims=[32], n_masks=2,
                             in_shape=IN_SHAPE)),
        ("fvbn", models.FullyVisibleBeliefNetwork(KEY, n_dims=192,
                                                  in_shape=IN_SHAPE)),
        ("pixel_cnn", models.PixelCNN(
            KEY, in_channels=3, out_channels=3, n_residual=1,
            residual_channels=2, head_channels=1, in_shape=IN_SHAPE)),
        ("gated_pixel_cnn", models.GatedPixelCNN(
            KEY, in_channels=3, out_channels=3, n_gated=1, gated_channels=2,
            head_channels=1, in_shape=IN_SHAPE)),
        ("image_gpt", models.ImageGPT(
            KEY, in_channels=3, out_channels=3, in_size=8,
            n_transformer_blocks=1, n_attention_heads=2,
            n_embedding_channels=4, in_shape=IN_SHAPE)),
        ("pixel_snail", models.PixelSNAIL(
            KEY, in_channels=3, out_channels=3, n_channels=2,
            n_pixel_snail_blocks=1, n_residual_blocks=1,
            attention_key_channels=1, attention_value_channels=1,
            in_shape=IN_SHAPE)),
    ]


@pytest.mark.parametrize("name,model", _ar_models(),
                         ids=[n for n, _ in _ar_models()])
def test_multichannel_forward_and_sample(name, model):
    rng = jax.random.PRNGKey(0)
    batch = (jax.random.uniform(rng, (2,) + IN_SHAPE) > 0.5).astype(jnp.float32)
    out = model.forward(batch)
    assert out.shape == batch.shape

    samples = model.sample(rng, n_samples=2)
    assert samples.shape == (2,) + IN_SHAPE

    # Conditional sampling must preserve observed (>= 0) pixels (tests.py:92-95).
    conditioned = batch.at[:, 1:, :, :].set(-1)
    samples = model.sample(rng, conditioned_on=conditioned)
    np.testing.assert_allclose(np.asarray(samples[:, 0]), np.asarray(batch[:, 0]))


def _latent_models():
    """Tiny multi-channel latent-variable configs mirroring tests.py:136-178."""
    from pytorch_generative_tpu.models.vae.vd_vae import StackConfig

    return [
        ("vae", models.VAE(KEY, in_channels=3, out_channels=3,
                           latent_channels=1, strides=(2, 2), hidden_channels=2,
                           residual_channels=1, in_shape=IN_SHAPE)),
        ("vd_vae", models.VeryDeepVAE(
            KEY, in_channels=3, out_channels=3, input_resolution=8,
            stack_configs=(StackConfig(1, 1), StackConfig(1, 1)),
            latent_channels=1, hidden_channels=16, bottleneck_channels=1,
            in_shape=IN_SHAPE)),
        ("nice", models.NICE(KEY, n_features=192, n_coupling_blocks=4,
                             n_hidden_layers=2, n_hidden_features=10,
                             in_shape=IN_SHAPE)),
        ("gmm", models.GaussianMixtureModel(3, 192, in_shape=IN_SHAPE)),
        ("bmm", models.BernoulliMixtureModel(3, 192, in_shape=IN_SHAPE)),
    ]


@pytest.mark.parametrize("name,model", _latent_models(),
                         ids=[n for n, _ in _latent_models()])
def test_multichannel_latent_models(name, model):
    rng = jax.random.PRNGKey(0)
    batch = jax.random.uniform(rng, (2,) + IN_SHAPE)
    out = model.forward(batch, rng=rng)
    out = out[0] if isinstance(out, tuple) else out
    assert out.shape[0] == 2

    samples = model.sample(rng, n_samples=2)
    assert samples.shape == (2,) + IN_SHAPE


def test_vq_vae_forward_and_state():
    for cls in [models.VectorQuantizedVAE, models.VectorQuantizedVAE2]:
        model = cls(KEY, in_channels=3, out_channels=3, hidden_channels=4,
                    n_residual_blocks=1, residual_channels=1, n_embeddings=8,
                    embedding_dim=4, in_shape=IN_SHAPE)
        batch = jax.random.uniform(jax.random.PRNGKey(0), (2,) + IN_SHAPE)
        (recon, vq_loss), new_model = model.forward_with_state(batch,
                                                               training=True)
        assert recon.shape == batch.shape
        assert vq_loss.shape == ()
        assert not core.tree_equal(new_model, model)  # EMA codebook moved
        # Eval mode leaves state untouched.
        (_, _), same_model = model.forward_with_state(batch, training=False)
        assert core.tree_equal(same_model, model)


def test_nice_invertibility():
    model = models.NICE(KEY, n_features=192, n_coupling_blocks=4,
                        n_hidden_layers=2, n_hidden_features=10,
                        in_shape=IN_SHAPE)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2,) + IN_SHAPE)
    z, _ = model.forward(x)
    x_rec = model._inverse(z)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_gaussian_process_fit_predict_sample():
    mean_fn = lambda x: jnp.zeros(x.shape[0])
    kernel_fn = lambda a, b: jnp.exp(
        -0.5 * (a[:, None, 0] - b[None, :, 0]) ** 2)
    gp = models.GaussianProcess(mean_fn, kernel_fn)
    x = jnp.linspace(-1, 1, 5)[:, None]
    y = jnp.sin(3 * x[:, 0])
    gp = gp.fit(x, y)
    # A noiseless GP posterior interpolates the training targets exactly.
    mu, sig = gp.predict(x)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(y), atol=1e-3)
    samples = gp.sample(jax.random.PRNGKey(0), x, n_samples=3)
    assert samples.shape == (3, 5)


# ---------------------------------------------------------------------------
# 4. API contracts.
# ---------------------------------------------------------------------------

def test_auto_reshape_returns_image_shape():
    model = models.NADE(KEY, input_dim=8 * 8, hidden_dim=8, in_shape=(8, 8, 1))
    x = jnp.ones((2, 8, 8, 1))
    assert model.forward(x).shape == (2, 8, 8, 1)


def test_sampling_after_checkpoint_roundtrip(tmp_path):
    model = models.NADE(KEY, input_dim=16, hidden_dim=8, in_shape=(4, 4, 1))
    path = str(tmp_path / "model.ckpt")
    ckpt_utils.save_checkpoint(path, model, {"note": "test"})

    fresh = models.NADE(jax.random.PRNGKey(99), input_dim=16, hidden_dim=8,
                        in_shape=(4, 4, 1))
    restored, meta = ckpt_utils.restore_checkpoint(path, fresh)
    assert meta["note"] == "test"
    assert core.tree_equal(restored, model)
    samples = restored.sample(jax.random.PRNGKey(1), n_samples=2)
    assert samples.shape == (2, 4, 4, 1)
