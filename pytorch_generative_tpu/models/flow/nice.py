"""Non-linear Independent Components Estimation (NICE) [1].

Parity surface: /root/reference/pytorch_generative/models/flow/nice.py.
``forward`` is the inverse mapping X -> Z returning (z, log|det J|); ``sample``
draws a (temperature-scaled) standard normal and runs the forward mapping Z -> X.
Invertibility (inverse(forward(x)) == x) is covered by tests.

[1]: https://arxiv.org/abs/1410.8516
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.nn import Linear


class AdditiveCouplingBlock(core.Module):
    """Coupling block with an additive coupling law.

    With x1, x2 = split(x, 2) and coupling network m(.), the inverse (X->Z)
    mapping is y1 = x1, y2 = x2 + m(x1) and the forward (Z->X) mapping is
    x1 = y1, x2 = y2 - m(y1). ``reverse`` swaps which half is transformed.
    """

    layers: tuple
    reverse: bool = core.static_field()

    def __init__(self, key, n_features: int, n_hidden_layers: int,
                 n_hidden_features: int, reverse: bool):
        self.reverse = reverse
        half = n_features // 2
        dims = [half] + [n_hidden_features] * n_hidden_layers + [half]
        keys = jax.random.split(key, len(dims) - 1)
        self.layers = tuple(Linear(keys[i], dims[i], dims[i + 1])
                            for i in range(len(dims) - 1))

    def _net(self, x):
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i < len(self.layers) - 1:
                x = jax.nn.relu(x)
        return x

    def _couple(self, x, sign):
        c = x.shape[1]
        h1, h2 = x[:, : c // 2], x[:, c // 2:]
        if self.reverse:
            h1 = h1 + sign * self._net(h2)
        else:
            h2 = h2 + sign * self._net(h1)
        return jnp.concatenate([h1, h2], axis=1)

    def __call__(self, x):
        """Inverse mapping from the inputs to the prior (X -> Z)."""
        return self._couple(x, 1.0)

    def inverse(self, y):
        """Forward mapping from the prior to the input (Z -> X)."""
        return self._couple(y, -1.0)


class ScalingLayer(core.Module):
    """Invertible diagonal scaling with log|det J| = sum(log_scale)."""

    log_scale: jax.Array

    def __init__(self, n_features: int):
        self.log_scale = jnp.zeros((1, n_features))

    def log_det_J(self):
        return jnp.sum(self.log_scale)

    def _couple(self, x, sign):
        original_shape = x.shape
        x = x.reshape(original_shape[0], -1)
        h = x * jnp.exp(sign * self.log_scale)
        return h.reshape(original_shape)

    def __call__(self, x):
        return self._couple(x, 1.0)

    def inverse(self, y):
        return self._couple(y, -1.0)


class NICE(base.GenerativeModel):
    """Non-linear Independent Component Estimation (NICE) model."""

    blocks: tuple
    scaling: ScalingLayer

    def __init__(self, key, n_features: int, n_coupling_blocks: int = 4,
                 n_hidden_layers: int = 5, n_hidden_features: int = 1000,
                 in_shape=None, sample_fn=None):
        super().__init__(in_shape=in_shape or (n_features, 1, 1),
                         sample_fn=sample_fn)
        keys = jax.random.split(key, n_coupling_blocks)
        self.blocks = tuple(
            AdditiveCouplingBlock(keys[i], n_features, n_hidden_layers,
                                  n_hidden_features, reverse=bool(i % 2))
            for i in range(n_coupling_blocks))
        self.scaling = ScalingLayer(n_features)

    def forward(self, x, *, rng=None, training=False):
        """Inverse mapping X -> Z; returns (z, log|det J|)."""
        del rng, training
        return self._forward(x), self.scaling.log_det_J()

    @base.auto_reshape
    def _forward(self, x):
        for block in self.blocks:
            x = block(x)
        return self.scaling(x)

    def sample(self, rng, n_samples, temp: float = 1.0):
        """Samples by pushing (temperature-scaled) normal noise through Z -> X."""
        h, w, c = self.in_shape
        x = jax.random.normal(rng, (n_samples, h, w, c)) * temp
        return self._inverse(x)

    @base.auto_reshape
    def _inverse(self, x):
        x = self.scaling.inverse(x)
        for block in reversed(self.blocks):
            x = block.inverse(x)
        return x


def reproduce(n_epochs=150, batch_size=1024, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (nice.py:164-226): 4.34 bits/dim
    on dequantized MNIST."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models, trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dequantize=True)

    model = models.NICE(
        jax.random.PRNGKey(0), n_features=784, n_coupling_blocks=4,
        n_hidden_layers=5, n_hidden_features=1000, in_shape=(28, 28, 1))
    optimizer = optax.adam(1e-3)

    def loss_fn(x, _, preds):
        preds, log_det_J = preds
        # Standard logistic prior: log p(z) = -(softplus(z) + softplus(-z)).
        log_prob = -(jax.nn.softplus(preds) + jax.nn.softplus(-preds)).sum(
            axis=(1, 2, 3))
        loss = log_prob + log_det_J
        return {
            "loss": -loss.mean(),
            "prior_log_likelihood": log_prob.mean(),
            "log_det_J": jnp.broadcast_to(log_det_J, ()).mean(),
        }

    model_trainer = trainer.Trainer(
        model=model, loss_fn=loss_fn, optimizer=optimizer,
        train_loader=train_loader, eval_loader=test_loader, log_dir=log_dir,
        n_devices=n_devices)
    model_trainer.interleaved_train_and_eval(n_epochs)
    return model_trainer
