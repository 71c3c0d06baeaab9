"""Kernel Density Estimation (KDE): nonparametric density estimation.

Parity surface: /root/reference/pytorch_generative/models/kde.py. The density
estimate is p(x) = 1/|D| sum_i K(u(x, x_i)); tests verify the estimated density
integrates to 1 over a meshgrid.
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base


class Kernel(core.Module):
    """Interface for KDE kernels."""

    bandwidth: float = core.static_field()

    def __init__(self, bandwidth: float = 1.0):
        self.bandwidth = bandwidth

    @staticmethod
    def _diffs(test_Xs, train_Xs):
        """Pairwise differences: (n_test, n_train, ...)."""
        test_Xs = test_Xs[:, None]
        train_Xs = train_Xs[None, :]
        return test_Xs - train_Xs

    @abc.abstractmethod
    def __call__(self, test_Xs, train_Xs):
        """log p(x) for each test x given the training points."""

    @abc.abstractmethod
    def sample(self, rng, train_Xs):
        """Samples from the kernel centered on each training point."""


class ParzenWindowKernel(Kernel):
    """Uniform (Parzen window) kernel."""

    def __call__(self, test_Xs, train_Xs):
        abs_diffs = jnp.abs(self._diffs(test_Xs, train_Xs))
        dims = tuple(range(abs_diffs.ndim))[2:]
        dim = int(jnp.prod(jnp.asarray(abs_diffs.shape[2:])))
        inside = jnp.sum(abs_diffs / self.bandwidth <= 0.5, axis=dims) == dim
        coef = 1.0 / self.bandwidth**dim
        return jnp.log((coef * inside).mean(axis=1))

    def sample(self, rng, train_Xs):
        noise = (jax.random.uniform(rng, train_Xs.shape) - 0.5) * self.bandwidth
        return train_Xs + noise


class GaussianKernel(Kernel):
    """Gaussian kernel (logsumexp form for stability)."""

    def __call__(self, test_Xs, train_Xs):
        n, d = train_Xs.shape
        h = self.bandwidth
        Z = 0.5 * d * jnp.log(2 * jnp.pi) + d * jnp.log(h) + jnp.log(n)
        diffs = self._diffs(test_Xs, train_Xs) / h
        log_exp = -0.5 * jnp.linalg.norm(diffs, ord=2, axis=-1) ** 2
        return jax.nn.logsumexp(log_exp - Z, axis=-1)

    def sample(self, rng, train_Xs):
        noise = jax.random.normal(rng, train_Xs.shape) * self.bandwidth
        return train_Xs + noise


class KernelDensityEstimator(base.GenerativeModel):
    """The KernelDensityEstimator model."""

    train_Xs: jax.Array = core.buffer_field()
    kernel: Kernel

    def __init__(self, train_Xs, kernel: Kernel | None = None):
        """Initializes a new KernelDensityEstimator.

        Args:
            train_Xs: (n, d) "training" points to place kernels on.
            kernel: The kernel; defaults to a unit-bandwidth Gaussian.
        """
        train_Xs = jnp.asarray(train_Xs)
        assert train_Xs.ndim == 2, "Input cannot have more than two axes."
        super().__init__(in_shape=(train_Xs.shape[1],))
        self.kernel = kernel or GaussianKernel()
        self.train_Xs = train_Xs

    def forward(self, x, *, rng=None, training=False):
        del rng, training
        return self.kernel(x, self.train_Xs)

    def sample(self, rng, n_samples):
        idx_rng, noise_rng = jax.random.split(rng)
        idxs = jax.random.randint(idx_rng, (n_samples,), 0, len(self.train_Xs))
        return self.kernel.sample(noise_rng, self.train_Xs[idxs])
