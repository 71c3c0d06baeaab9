"""Gaussian process regression (nonparametric).

Parity surface: /root/reference/pytorch_generative/models/gaussian_process.py —
which the reference forgot to export in models/__init__.py; this build exports it.
Divergence (functional style): ``fit`` returns a *new* fitted model instead of
mutating in place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base


class GaussianProcess(base.GenerativeModel):
    """The Gaussian process model: p(y | x) = N(y | mu(x), K(x, x'))."""

    train_x: jax.Array | None = core.buffer_field()
    train_y: jax.Array | None = core.buffer_field()
    noise_var: jax.Array = core.buffer_field()
    mean: object = core.static_field()
    kernel: object = core.static_field()

    def __init__(self, mean, kernel, noise_var: float | None = None):
        """Initializes a new GaussianProcess.

        Args:
            mean: Prior mean function mu(x).
            kernel: Prior covariance function K(x, x').
            noise_var: Observation-noise variance (0 = noiseless).
        """
        super().__init__(in_shape=None)
        self.mean = mean
        self.kernel = kernel
        self.noise_var = jnp.asarray(noise_var or 0.0)
        self.train_x = None
        self.train_y = None

    def fit(self, x, y) -> "GaussianProcess":
        """Returns a new GaussianProcess conditioned on (x, y) (accumulating)."""
        x, y = jnp.asarray(x), jnp.asarray(y)
        if self.train_x is None:
            return self.replace(train_x=x, train_y=y)
        return self.replace(train_x=jnp.concatenate([self.train_x, x]),
                            train_y=jnp.concatenate([self.train_y, y]))

    def forward(self, x, *, rng=None, training=False):
        del rng, training
        return self.predict(x)

    def predict(self, x):
        """Posterior (or prior, if unfitted) mean and covariance at x."""
        x = jnp.asarray(x)
        if self.train_x is None:
            return self.mean(x), self.kernel(x, x)

        train_mu, x_mu = self.mean(self.train_x), self.mean(x)
        train_sig = (self.kernel(self.train_x, self.train_x)
                     + self.noise_var * jnp.eye(self.train_x.shape[0]))
        x_sig = self.kernel(x, x)
        cross_sig = self.kernel(self.train_x, x)

        solved = jnp.linalg.solve(train_sig, cross_sig).T
        mu = x_mu + solved @ (self.train_y - train_mu)
        sig = x_sig - (solved @ cross_sig)
        return mu, sig

    def sample(self, rng, x, n_samples):
        """Draws n_samples from the (posterior) process at locations x."""
        mu, sig = self.predict(x)
        return jax.random.multivariate_normal(
            rng, jnp.ravel(mu), sig, shape=(n_samples,), method="svd")
