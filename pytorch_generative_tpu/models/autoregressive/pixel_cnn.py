"""PixelCNN [1]: masked convolutional autoregressive density estimation.

Parity surface:
/root/reference/pytorch_generative/models/autoregressive/pixel_cnn.py. As in the
reference, no autoregressive channel masking is used, and the forward pass keeps
the (intentional per the reference code) double residual: each CausalResidualBlock
adds its own skip AND the model adds ``x + layer(x)`` again (pixel_cnn.py:106-110).

[1]: https://arxiv.org/abs/1601.06759
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.nn import CausalConv2d, Conv2d


class CausalResidualBlock(core.Module):
    """A residual block masked to respect the autoregressive property."""

    conv1: Conv2d
    conv2: CausalConv2d
    conv3: Conv2d

    def __init__(self, key, n_channels: int):
        k1, k2, k3 = jax.random.split(key, 3)
        half = n_channels // 2
        self.conv1 = Conv2d(k1, n_channels, half, 1)
        self.conv2 = CausalConv2d(k2, False, half, half, 3, padding=1)
        self.conv3 = Conv2d(k3, half, n_channels, 1)

    def __call__(self, x):
        h = self.conv1(jax.nn.relu(x))
        h = self.conv2(jax.nn.relu(h))
        h = self.conv3(jax.nn.relu(h))
        return x + h


class PixelCNN(base.AutoregressiveModel):
    """The PixelCNN model."""

    input_conv: CausalConv2d
    causal_layers: tuple
    head_conv1: Conv2d
    head_conv2: Conv2d

    def __init__(self, key, in_channels: int = 1, out_channels: int = 1,
                 n_residual: int = 15, residual_channels: int = 128,
                 head_channels: int = 32, in_shape=(28, 28, 1), sample_fn=None):
        """Initializes a new PixelCNN instance.

        Args:
            key: RNG key for parameter init.
            in_channels / out_channels: Input/output channels.
            n_residual: Number of residual blocks.
            residual_channels: Channels inside the residual stack (doubled at the
                input conv, as in the reference).
            head_channels: Channels of the two 1x1 head convolutions.
            in_shape: (h, w, c) of training images (for sampling).
            sample_fn: See the base class.
        """
        super().__init__(in_shape=in_shape, sample_fn=sample_fn)
        keys = jax.random.split(key, n_residual + 3)
        self.input_conv = CausalConv2d(
            keys[0], True, in_channels, 2 * residual_channels, 7, padding=3)
        self.causal_layers = tuple(
            CausalResidualBlock(keys[1 + i], 2 * residual_channels)
            for i in range(n_residual))
        self.head_conv1 = Conv2d(keys[-2], 2 * residual_channels, head_channels, 1)
        self.head_conv2 = Conv2d(keys[-1], head_channels, out_channels, 1)

    def forward(self, x, *, rng=None, training=False):
        del rng, training
        x = self.input_conv(x)
        for layer in self.causal_layers:
            x = x + layer(x)
        x = self.head_conv1(jax.nn.relu(x))
        return self.head_conv2(jax.nn.relu(x))

    def sample(self, rng, n_samples=None, conditioned_on=None):
        """Incremental decoding with per-layer activation caches — an ~H*W-fold
        compute reduction over the full-forward-per-pixel sampler (see
        ops/sampling.py; exact equivalence tested)."""
        from pytorch_generative_tpu.ops.sampling import pixel_cnn_sample_fast

        return pixel_cnn_sample_fast(self, rng, n_samples=n_samples,
                                     conditioned_on=conditioned_on)

    def sample_naive(self, rng, n_samples=None, conditioned_on=None):
        """The generic full-forward-per-pixel raster sampler (base class)."""
        return super().sample(rng, n_samples=n_samples,
                              conditioned_on=conditioned_on)


def reproduce(n_epochs=457, batch_size=256, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (pixel_cnn.py:113-176): 81.45 nats."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models
    from pytorch_generative_tpu import optim as optim_tpu
    from pytorch_generative_tpu import trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True)

    model = models.PixelCNN(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, n_residual=15,
        residual_channels=16, head_channels=32, in_shape=(28, 28, 1))
    optimizer = optim_tpu.adam_multiplicative(1e-3, 0.999977)

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
