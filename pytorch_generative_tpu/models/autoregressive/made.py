"""Masked Autoencoder Distribution Estimator (MADE) [1].

A deep fully-connected autoencoder masked to respect the autoregressive property
for a (possibly random) input ordering. Parity surface:
/root/reference/pytorch_generative/models/autoregressive/made.py.

Mask handling is functional: all ``n_masks`` connectivity sets are generated once
at construction with the reference's exact NumPy recipe (seeds 0..n_masks-1, see
ops/masks.py) and stored as stacked constant buffers. Where the reference rotates
through sets via a mutable seed counter incremented per forward (made.py:81-83),
the jitted forward selects a set uniformly at random from ``rng`` — the same
marginal distribution over masks without mutable module state. With the
reproduce() config (n_masks=1) the two are identical.

[1]: https://arxiv.org/abs/1502.03509
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.nn.linear import MaskedLinear
from pytorch_generative_tpu.ops.masks import made_masks


class MADE(base.AutoregressiveModel):
    """The Masked Autoencoder Distribution Estimator (MADE) model."""

    layers: tuple
    mask_sets: tuple = core.buffer_field()   # Per layer: (n_masks, in, out).
    orderings: jax.Array = core.buffer_field()  # (n_masks, input_dim).
    input_dim: int = core.static_field()
    n_masks: int = core.static_field()

    def __init__(self, key, input_dim: int, hidden_dims=None, n_masks: int = 1,
                 in_shape=None, sample_fn=None):
        """Initializes a new MADE instance.

        Args:
            key: RNG key for parameter init.
            input_dim: Dimensionality of the input.
            hidden_dims: Units per hidden layer.
            n_masks: Number of distinct mask sets (order/connectivity-agnostic
                training).
            in_shape: (h, w, c) image shape for sampling.
            sample_fn: See the base class.
        """
        super().__init__(in_shape=in_shape or (input_dim, 1, 1),
                         sample_fn=sample_fn)
        self.input_dim = input_dim
        self.n_masks = n_masks
        hidden_dims = hidden_dims or []
        dims = [input_dim] + hidden_dims + [input_dim]

        keys = jax.random.split(key, len(dims) - 1)
        self.layers = tuple(
            MaskedLinear(keys[i], dims[i], dims[i + 1])
            for i in range(len(dims) - 1))

        per_layer = [[] for _ in range(len(dims) - 1)]
        orderings = []
        for seed in range(n_masks):
            # The reference seeds with (mask_seed % n_masks), so the distinct sets
            # are exactly those of seeds 0..n_masks-1 (made.py:81-83).
            masks, ordering = made_masks(seed, input_dim, hidden_dims)
            for i, m in enumerate(masks):
                per_layer[i].append(m)
            orderings.append(ordering)
        self.mask_sets = tuple(jnp.stack(ms) for ms in per_layer)
        self.orderings = jnp.asarray(np.stack(orderings))

    def _forward(self, x, mask_idx):
        for i, layer in enumerate(self.layers):
            x = layer(x, mask=self.mask_sets[i][mask_idx])
            if i < len(self.layers) - 1:
                x = jax.nn.relu(x)
        return x

    def _mask_idx(self, rng):
        if self.n_masks == 1 or rng is None:
            return 0
        return jax.random.randint(rng, (), 0, self.n_masks)

    @base.auto_reshape
    def forward(self, x, *, rng=None, training=False):
        del training
        return self._forward(x, self._mask_idx(rng))

    def sample(self, rng, n_samples=None, conditioned_on=None):
        """Samples dimensions in the mask-ordering's raster order via lax.scan
        (replacing the Python loop at made.py:119-133)."""
        conditioned_on = self._get_conditioned_on(n_samples, conditioned_on)
        mask_rng, sample_rng = jax.random.split(rng)
        return self._sample_flat(conditioned_on, mask_rng, sample_rng)

    @base.auto_reshape
    def _sample_flat(self, x, mask_rng, sample_rng):
        mask_idx = self._mask_idx(mask_rng)
        order = jnp.argsort(self.orderings[mask_idx])
        rngs = jax.random.split(sample_rng, self.input_dim)

        if len(self.layers) == 2:
            return self._sample_flat_incremental(x, mask_idx, order, rngs)

        def step(x, inputs):
            dim, step_rng = inputs
            out = self._forward(x, mask_idx)[:, dim]
            out = self.sample_fn(step_rng, out)
            x = x.at[:, dim].set(jnp.where(x[:, dim] < 0, out, x[:, dim]))
            return x, None

        x, _ = jax.lax.scan(step, x, (order, rngs))
        return x

    def _sample_flat_incremental(self, x, mask_idx, order, rngs):
        """O(hidden) per dimension for single-hidden-layer MADE (the
        reproduce() config): the hidden pre-activation is maintained as a
        running sum and updated rank-1 when one input dimension changes, and
        only the sampled dimension's output row is computed — ~input_dim-fold
        less work than a full forward per dimension (made.py:119-133)."""
        w1 = self.layers[0].weight * self.mask_sets[0][mask_idx]
        b1 = self.layers[0].bias
        w2 = self.layers[1].weight * self.mask_sets[1][mask_idx]
        b2 = self.layers[1].bias

        a0 = x @ w1 + (b1 if b1 is not None else 0.0)

        def step(carry, inputs):
            x, a = carry
            dim, step_rng = inputs
            h = jax.nn.relu(a)
            out = h @ w2[:, dim]
            if b2 is not None:
                out = out + b2[dim]
            sampled = self.sample_fn(step_rng, out)
            new_val = jnp.where(x[:, dim] < 0, sampled, x[:, dim])
            delta = new_val - x[:, dim]
            a = a + delta[:, None] * w1[dim][None, :]
            x = x.at[:, dim].set(new_val)
            return (x, a), None

        (x, _), _ = jax.lax.scan(step, (x, a0), (order, rngs))
        return x


def reproduce(n_epochs=85, batch_size=64, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (made.py:136-189): 84.87 nats."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models, trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True)

    model = models.MADE(jax.random.PRNGKey(0), input_dim=784, hidden_dims=[8000],
                        n_masks=1, in_shape=(28, 28, 1))
    optimizer = optax.adam(1e-3)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        x, preds = x.reshape(n, -1), preds.reshape(n, -1)
        loss = optax.sigmoid_binary_cross_entropy(preds, x)
        return loss.sum(axis=1).mean()

    model_trainer = trainer.Trainer(
        model=model, loss_fn=loss_fn, optimizer=optimizer,
        train_loader=train_loader, eval_loader=test_loader, log_dir=log_dir,
        n_devices=n_devices)
    model_trainer.interleaved_train_and_eval(n_epochs)
    return model_trainer
