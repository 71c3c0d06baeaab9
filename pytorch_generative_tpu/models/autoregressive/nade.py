"""Neural Autoregressive Distribution Estimator (NADE) [1].

NADE is a one-hidden-layer autoregressive autoencoder: p(X) = prod_i
p(X_i | X_{j<i}) with the hidden activation accumulated dimension-by-dimension.

Parity surface: /root/reference/pytorch_generative/models/autoregressive/nade.py.
The reference's 784-step Python loop (nade.py:42-68) becomes a single
``lax.scan`` carrying the activation accumulator — one compiled program for both
the training forward and (shared-recurrence) sampling paths.

NOTE (replicated quirk): the reference's forward returns *probabilities*
(sigmoid outputs) which its reproduce() loss then feeds to a with-logits BCE
(nade.py:58, 130-134). We reproduce that exactly, since the published 85.65 nats
were obtained with it.

[1]: https://arxiv.org/abs/1605.02226
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.ops import init as init_ops


class NADE(base.AutoregressiveModel):
    """The Neural Autoregressive Distribution Estimator (NADE) model."""

    in_W: jax.Array  # (hidden_dim, input_dim)
    in_b: jax.Array  # (hidden_dim,)
    h_W: jax.Array   # (input_dim, hidden_dim)
    h_b: jax.Array   # (input_dim,)
    input_dim: int = core.static_field()
    hidden_dim: int = core.static_field()

    def __init__(self, key, input_dim: int, hidden_dim: int, in_shape=None,
                 sample_fn=None):
        """Initializes a new NADE instance.

        Args:
            key: RNG key for parameter init.
            input_dim: Dimension of the input.
            hidden_dim: Dimension of the (single) hidden layer.
            in_shape: (h, w, c) of image inputs, used to shape unconditional
                samples. Defaults to (input_dim, 1, 1).
            sample_fn: See the base class.
        """
        super().__init__(in_shape=in_shape or (input_dim, 1, 1),
                         sample_fn=sample_fn)
        self.input_dim = input_dim
        self.hidden_dim = hidden_dim
        k1, k2 = jax.random.split(key)
        # kaiming_normal_ on torch shapes (hidden, input) / (input, hidden):
        # torch fan_in is dim 1 of the 2-D tensor (nade.py:33-40).
        self.in_W = init_ops.kaiming_normal(k1, (hidden_dim, input_dim),
                                            fan_in=input_dim)
        self.in_b = jnp.zeros((hidden_dim,))
        self.h_W = init_ops.kaiming_normal(k2, (input_dim, hidden_dim),
                                           fan_in=hidden_dim)
        self.h_b = jnp.zeros((input_dim,))

    def _recurrence(self, x, rng):
        """Shared forward/sampling recurrence as a lax.scan over dimensions.

        Args:
            x: (n, input_dim) with entries < 0 meaning "sample me".
            rng: key for Bernoulli sampling of unknown dimensions.
        Returns:
            (p_hat, x_hat): per-dimension probabilities and (sampled) values.
        """
        n = x.shape[0]
        rngs = jax.random.split(rng, self.input_dim)
        # Scan inputs, one slice per dimension i.
        xs = (self.in_W.T, self.h_W, self.h_b, x.T, rngs)
        a0 = jnp.broadcast_to(self.in_b, (n, self.hidden_dim))

        def step(a, inputs):
            w_col, h_w_row, h_b_i, x_i, step_rng = inputs
            h = jax.nn.relu(a)
            p_i = jax.nn.sigmoid(h @ h_w_row + h_b_i)  # (n,)
            sampled = jax.random.bernoulli(step_rng, p_i).astype(x_i.dtype)
            x_i = jnp.where(x_i < 0, sampled, x_i)
            a = a + x_i[:, None] * w_col[None, :]
            return a, (p_i, x_i)

        _, (p_hat, x_hat) = jax.lax.scan(step, a0, xs)
        return p_hat.T, x_hat.T

    @base.auto_reshape
    def forward(self, x, *, rng=None, training=False):
        """Returns the per-dimension Bernoulli probabilities (see module note)."""
        del training
        if rng is None:
            rng = jax.random.PRNGKey(0)  # Unused when all dimensions are observed.
        return self._recurrence(x, rng)[0]

    def sample(self, rng, n_samples=None, conditioned_on=None):
        """Samples via the shared recurrence (one scan, not D full forwards)."""
        conditioned_on = self._get_conditioned_on(n_samples, conditioned_on)
        return self._sample_flat(conditioned_on, rng)

    @base.auto_reshape
    def _sample_flat(self, x, rng):
        return self._recurrence(x, rng)[1]


def reproduce(n_epochs=50, batch_size=512, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with defaults reproducing the reference's 85.65 nats
    (/root/reference/pytorch_generative/models/autoregressive/nade.py:93-146).

    Args:
        n_epochs: Number of epochs to train for.
        batch_size: Batch size for training and evaluation.
        log_dir: Directory for trainer state + metrics.
        n_devices: Number of TPU devices for data parallelism (0/1 = single).
        device_id: Unused (single-controller JAX drives all devices); kept for
            signature parity with the reference.
        debug_loader: Test-only loader override.
    """
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models, trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True)

    model = models.NADE(jax.random.PRNGKey(0), input_dim=784, hidden_dim=500,
                        in_shape=(28, 28, 1))
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
