"""Categorical mixtures of Gaussian / Bernoulli component distributions.

Parity surface: /root/reference/pytorch_generative/models/mixture_models.py.
forward returns per-example mixture log likelihood via
logsumexp(log_softmax(mixture_logits) + component_log_prob).
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp
import optax

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base


class MixtureModel(base.GenerativeModel):
    """Base class for mixture models (generic forward/sample over components)."""

    mixture_logits: jax.Array
    n_components: int = core.static_field()
    n_features: int = core.static_field()

    def __init__(self, n_components: int, n_features: int, in_shape=None):
        super().__init__(in_shape=in_shape or (n_features, 1, 1))
        self.n_components = n_components
        self.n_features = n_features
        self.mixture_logits = jnp.ones((n_components,))

    @abc.abstractmethod
    def _component_log_prob(self, x):
        """Log likelihood of x under each component; shape (n, n_components)."""

    def forward(self, x, *, rng=None, training=False):
        del rng, training
        x = x.reshape(x.shape[0], 1, self.n_features)
        mixture_log_prob = jax.nn.log_softmax(self.mixture_logits, axis=-1)
        log_prob = mixture_log_prob + self._component_log_prob(x)
        return jax.nn.logsumexp(log_prob, axis=-1)

    @abc.abstractmethod
    def _component_sample(self, rng, idxs):
        """Samples from the components selected by idxs."""

    def sample(self, rng, n_samples):
        cat_rng, comp_rng = jax.random.split(rng)
        idxs = jax.random.categorical(cat_rng, self.mixture_logits,
                                      shape=(n_samples,))
        sample = self._component_sample(comp_rng, idxs)
        return sample.reshape(n_samples, *self.in_shape)


class GaussianMixtureModel(MixtureModel):
    """A categorical mixture of Gaussians with diagonal covariance."""

    mean: jax.Array
    log_std: jax.Array

    def __init__(self, n_components: int, n_features: int, in_shape=None,
                 key=None):
        super().__init__(n_components, n_features, in_shape=in_shape)
        key = key if key is not None else jax.random.PRNGKey(0)
        self.mean = 0.01 * jax.random.normal(key, (n_components, n_features))
        self.log_std = jnp.zeros((n_components, n_features))

    def _component_log_prob(self, x):
        z = -self.log_std - 0.5 * jnp.log(2 * jnp.pi)
        log_prob = z - 0.5 * ((x - self.mean) / jnp.exp(self.log_std)) ** 2
        return log_prob.sum(-1)

    def _component_sample(self, rng, idxs):
        mean, std = self.mean[idxs], jnp.exp(self.log_std[idxs])
        return mean + std * jax.random.normal(rng, mean.shape)


class BernoulliMixtureModel(MixtureModel):
    """A categorical mixture of Bernoulli distributions."""

    logits: jax.Array

    def __init__(self, n_components: int, n_features: int, in_shape=None,
                 key=None):
        super().__init__(n_components, n_features, in_shape=in_shape)
        key = key if key is not None else jax.random.PRNGKey(0)
        self.logits = jax.random.uniform(key, (n_components, n_features))

    def _component_log_prob(self, x):
        # BCE-with-logits is exactly -log Bern(x | sigmoid(logits)).
        logits = jnp.broadcast_to(self.logits, x.shape[:1] + self.logits.shape)
        x = jnp.broadcast_to(x, logits.shape)
        return -optax.sigmoid_binary_cross_entropy(logits, x).sum(-1)

    def _component_sample(self, rng, idxs):
        logits = self.logits[idxs]
        return jax.random.bernoulli(rng, jax.nn.sigmoid(logits)).astype(
            jnp.float32)
