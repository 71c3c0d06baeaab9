"""Fully Visible Belief Network (FVBN) [1].

A collection of D linear models, each estimating p(x_i | x_{j<i}). The
reference implements this as a ModuleList of D separate Linear layers looped in
Python (/root/reference/pytorch_generative/models/autoregressive/fvbn.py:19-45);
here the whole stack is one strictly-lower-triangular masked (D, D) matmul — the
masking equivalence the reference itself notes at fvbn.py:18 — which runs as a
single MXU matmul instead of 784 tiny GEMVs.

Initialization matches per-row torch Linear defaults: row i of the weight and
bias are drawn U(+-1/sqrt(max(1, i))).

[1]: Neal (1992), Connectionist learning of belief networks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base


class FullyVisibleBeliefNetwork(base.AutoregressiveModel):
    """The Fully Visible Belief Network."""

    weight: jax.Array  # (n_dims, n_dims); column i predicts output i.
    bias: jax.Array    # (n_dims,)
    mask: jax.Array = core.buffer_field()
    n_dims: int = core.static_field()

    def __init__(self, key, n_dims: int, in_shape=None, sample_fn=None):
        """Initializes a new FullyVisibleBeliefNetwork.

        Args:
            key: RNG key for parameter init.
            n_dims: Number of input (and output) dimensions.
            in_shape: (h, w, c) image shape for sampling; defaults to (n_dims,1,1).
            sample_fn: See the base class.
        """
        super().__init__(in_shape=in_shape or (n_dims, 1, 1), sample_fn=sample_fn)
        self.n_dims = n_dims
        wkey, bkey = jax.random.split(key)
        # Per-output-dim fan-in: output i sees max(1, i) inputs.
        bounds = 1.0 / jnp.sqrt(jnp.maximum(jnp.arange(n_dims, dtype=jnp.float32),
                                            1.0))
        self.weight = (jax.random.uniform(wkey, (n_dims, n_dims), minval=-1.0,
                                          maxval=1.0) * bounds[None, :])
        self.bias = (jax.random.uniform(bkey, (n_dims,), minval=-1.0, maxval=1.0)
                     * bounds)
        # Strict lower-triangular connectivity: output i reads inputs j < i.
        self.mask = jnp.asarray(np.tri(n_dims, n_dims, -1, dtype=np.float32).T)

    def forward(self, x, *, rng=None, training=False):
        del rng, training
        original_shape = x.shape
        x = x.reshape(original_shape[0], -1)
        y = x @ (self.weight * self.mask) + self.bias
        return y.reshape(original_shape)

    def sample(self, rng, n_samples=None, conditioned_on=None):
        """Per-pixel sampling needs only output column i (one dot product),
        not the full (D, D) matmul of a forward pass."""
        conditioned_on = self._get_conditioned_on(n_samples, conditioned_on)
        shape = conditioned_on.shape
        x = conditioned_on.reshape(shape[0], -1)
        masked_w = self.weight * self.mask
        rngs = jax.random.split(rng, self.n_dims)

        def step(x, inputs):
            i, step_rng = inputs
            logits = x @ masked_w[:, i] + self.bias[i]
            sampled = self.sample_fn(step_rng, logits)
            x = x.at[:, i].set(jnp.where(x[:, i] < 0, sampled, x[:, i]))
            return x, None

        x, _ = jax.lax.scan(step, x, (jnp.arange(self.n_dims), rngs))
        return x.reshape(shape)


def reproduce(n_epochs=50, batch_size=512, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (fvbn.py:48-97): 96.58 nats."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models, trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True)

    model = models.FullyVisibleBeliefNetwork(
        jax.random.PRNGKey(0), n_dims=784, in_shape=(28, 28, 1))
    optimizer = optax.adam(1e-3)

    def loss_fn(x, _, preds):
        loss = optax.sigmoid_binary_cross_entropy(preds, x).sum()
        return loss / x.shape[0]

    model_trainer = trainer.Trainer(
        model=model, loss_fn=loss_fn, optimizer=optimizer,
        train_loader=train_loader, eval_loader=test_loader, log_dir=log_dir,
        n_devices=n_devices)
    model_trainer.interleaved_train_and_eval(n_epochs)
    return model_trainer
