"""Debugging utilities: receptive-field probe and overfit loaders.

Parity surface: /root/reference/pytorch_generative/debug.py. The gradient-based
receptive-field probe is also promoted into an automated causality test in
tests/test_receptive_field.py (the reference only used it manually in notebooks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_receptive_field(model, img_size=(3, 3, 1), position=None):
    """Receptive field of one output pixel via |d out / d in| > 0.

    Args:
        model: A model whose ``forward`` maps (N, H, W, C) -> (N, H, W, C').
        img_size: (height, width, channels) of the probe input (NHWC).
        position: (row, col) of the probed output pixel; defaults to the center
            (matching /root/reference/pytorch_generative/debug.py:7-21).
    Returns:
        (H, W) float array with 1.0 where the input influences the output pixel.
    """
    h, w, c = img_size
    row, col = position if position is not None else (h // 2, w // 2)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, h, w, c))

    def probe(x):
        return jnp.mean(model.forward(x)[0, row, col, :])

    grad = jnp.abs(jax.grad(probe)(img))[0].sum(axis=-1)
    return jnp.where(grad > 0, 1.0, 0.0)


class OneExampleLoaderWrapper:
    """A loader wrapper which always returns the same single example."""

    def __init__(self, loader):
        x, y = next(iter(loader))
        self._x = np.asarray(x)[:1]
        self._y = None if y is None else np.asarray(y)[:1]
        self.dataset_size = 1

    def __len__(self):
        return 1

    def __iter__(self):
        yield self._x, self._y


class OneBatchLoaderWrapper:
    """A loader wrapper which always returns the same batch."""

    def __init__(self, loader):
        x, y = next(iter(loader))
        self._x = np.asarray(x)
        self._y = None if y is None else np.asarray(y)
        self.dataset_size = len(self._x)

    def __len__(self):
        return 1

    def __iter__(self):
        yield self._x, self._y


class DummyLoader:
    """A loader of random data for integration tests and benchmarks.

    Mirrors the test fixture at /root/reference/pytorch_generative/models/tests.py:12-27
    (one random batch per epoch), generalized with batch/shape controls.
    """

    def __init__(self, shape=(28, 28, 1), batch_size=1, n_batches=1, binary=True,
                 seed=0):
        rng = np.random.default_rng(seed)
        n = batch_size * n_batches
        if binary:
            xs = (rng.random((n, *shape)) < 0.5).astype(np.float32)
        else:
            xs = rng.random((n, *shape), dtype=np.float32)
        self._xs = xs
        self.batch_size = batch_size
        self.n_batches = n_batches
        self.dataset_size = n

    def __len__(self):
        return self.n_batches

    def __iter__(self):
        for i in range(self.n_batches):
            yield self._xs[i * self.batch_size: (i + 1) * self.batch_size], None
