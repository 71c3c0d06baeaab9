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

    @abc.abstractmethod
    def __call__(self, test_Xs, train_Xs):
        """log p(x) for each test x given the training points."""

    @abc.abstractmethod
    def sample(self, rng, train_Xs):
        """Samples from the kernel centered on each training point."""


def _pairwise_offsets(queries, centers):
    """(n_queries, n_centers, d) offsets between every query/center pair."""
    return queries[:, None, :] - centers[None, :, :]


class ParzenWindowKernel(Kernel):
    """Uniform (Parzen window) kernel: a hypercube of side `bandwidth`.

    A query lies inside the cube around a center iff the largest coordinate
    offset is at most bandwidth/2; each such center contributes density
    1 / bandwidth^d.
    """

    def __call__(self, test_Xs, train_Xs):
        d = train_Xs.shape[-1]
        offsets = _pairwise_offsets(test_Xs, train_Xs)
        in_cube = jnp.max(jnp.abs(offsets), axis=-1) <= 0.5 * self.bandwidth
        density = jnp.mean(in_cube, axis=-1) / self.bandwidth**d
        return jnp.log(density)

    def sample(self, rng, train_Xs):
        jitter = jax.random.uniform(rng, train_Xs.shape, minval=-0.5,
                                    maxval=0.5)
        return train_Xs + jitter * self.bandwidth


class GaussianKernel(Kernel):
    """Isotropic Gaussian kernel, N(x; center, bandwidth^2 I), evaluated in
    log space via logsumexp for stability."""

    def __call__(self, test_Xs, train_Xs):
        n, d = train_Xs.shape
        h = self.bandwidth
        offsets = _pairwise_offsets(test_Xs, train_Xs)
        sq_dist = jnp.sum(jnp.square(offsets), axis=-1)
        per_center_log_p = (-0.5 * sq_dist / h**2
                            - 0.5 * d * jnp.log(2 * jnp.pi * h**2))
        return jax.nn.logsumexp(per_center_log_p, axis=-1) - jnp.log(n)

    def sample(self, rng, train_Xs):
        return train_Xs + self.bandwidth * jax.random.normal(
            rng, train_Xs.shape)


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
