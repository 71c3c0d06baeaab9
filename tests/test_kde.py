"""Numerical property tests for kernel density estimators
(mirrors TestKernelDensityEstimators at tests.py:183-233: the estimated density
must integrate to ~1 over a meshgrid)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_generative_tpu import models


def _integral(model, dx=0.1, lo=-8.0, hi=8.0):
    xs = jnp.arange(lo, hi, dx)
    xx, yy = jnp.meshgrid(xs, xs, indexing="ij")
    meshgrid = jnp.stack((xx, yy), axis=2).reshape(-1, 2)
    log_probs = model.forward(meshgrid)
    return float(jnp.sum(jnp.exp(log_probs) * dx * dx))


def test_smoke():
    train_Xs = jax.random.uniform(jax.random.PRNGKey(0), (4, 3))
    for kernel in [models.ParzenWindowKernel(bandwidth=0.1),
                   models.GaussianKernel(bandwidth=0.1)]:
        model = models.KernelDensityEstimator(train_Xs, kernel=kernel)
        model.forward(train_Xs)
        samples = model.sample(jax.random.PRNGKey(1), 2)
        assert samples.shape == (2, 3)


def test_gaussian_kernel_density_integrates_to_one():
    train_Xs = jax.random.normal(jax.random.PRNGKey(0), (100, 2))
    model = models.KernelDensityEstimator(train_Xs,
                                          models.GaussianKernel(bandwidth=1.0))
    np.testing.assert_allclose(_integral(model), 1.0, rtol=1e-2)


def test_parzen_kernel_density_integrates_to_one():
    train_Xs = jax.random.normal(jax.random.PRNGKey(0), (100, 2))
    model = models.KernelDensityEstimator(
        train_Xs, models.ParzenWindowKernel(bandwidth=1.0))
    np.testing.assert_allclose(_integral(model), 1.0, rtol=1e-2)
