"""Gated PixelCNN [1]: two-stream (vertical/horizontal) gated architecture.

Parity surface:
/root/reference/pytorch_generative/models/autoregressive/gated_pixel_cnn.py.
The masked Nx1 / 1xN convolutions are implemented as unmasked (N//2+1)-tap
convolutions with asymmetric-equivalent padding plus cropping (the trick
suggested in [1]; reference gated_pixel_cnn.py:62-99) — translated to NHWC row/
column crops. Causality of the pad/crop arithmetic is locked down by the
receptive-field test in tests/test_receptive_field.py.

[1]: https://arxiv.org/abs/1606.05328
"""

from __future__ import annotations

import jax

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.nn import Conv2d, GatedActivation


class GatedPixelCNNLayer(core.Module):
    """One gated two-stream layer: (vstack, hstack) -> (vstack, hstack, skip)."""

    vstack_1xN: Conv2d
    vstack_Nx1: Conv2d
    vstack_1x1: Conv2d
    link: Conv2d
    hstack_1xN: Conv2d
    hstack_residual: Conv2d
    hstack_skip: Conv2d
    activation: GatedActivation
    mask_center: bool = core.static_field()

    def __init__(self, key, in_channels: int, out_channels: int,
                 kernel_size: int = 3, mask_center: bool = False):
        """Initializes a new GatedPixelCNNLayer instance.

        Args:
            key: RNG key for parameter init.
            in_channels / out_channels: Layer channels.
            kernel_size: Size of the (causal) convolution kernel (odd).
            mask_center: If True the layer is fully causal (type-A): the center
                pixel is masked and the horizontal residual connection is dropped.
        """
        assert kernel_size % 2 == 1, "kernel_size cannot be even"
        keys = jax.random.split(key, 7)
        padding = (kernel_size - 1) // 2
        self.mask_center = mask_center
        self.activation = GatedActivation()

        # Vertical stack: a full-width 1xN followed by a strictly-above (N//2+1)x1
        # with one extra row of padding, cropped back to H rows.
        self.vstack_1xN = Conv2d(keys[0], in_channels, out_channels,
                                 (1, kernel_size), padding=(0, padding))
        self.vstack_Nx1 = Conv2d(keys[1], out_channels, 2 * out_channels,
                                 (kernel_size // 2 + 1, 1),
                                 padding=(padding + 1, 0))
        self.vstack_1x1 = Conv2d(keys[2], in_channels, 2 * out_channels, 1)

        self.link = Conv2d(keys[3], 2 * out_channels, 2 * out_channels, 1)

        # Horizontal stack: a leftward 1x(N//2+1); +1 padding when causal so the
        # current pixel is excluded.
        self.hstack_1xN = Conv2d(keys[4], in_channels, 2 * out_channels,
                                 (1, kernel_size // 2 + 1),
                                 padding=(0, padding + int(mask_center)))
        self.hstack_residual = Conv2d(keys[5], out_channels, out_channels, 1)
        self.hstack_skip = Conv2d(keys[6], out_channels, out_channels, 1)

    def __call__(self, vstack_input, hstack_input):
        _, h, w, _ = vstack_input.shape

        # Vertical stack (crop extra rows introduced by the +1 padding).
        vstack = self.vstack_Nx1(self.vstack_1xN(vstack_input))[:, :h, :, :]
        link = self.link(vstack)
        vstack = vstack + self.vstack_1x1(vstack_input)
        vstack = self.activation(vstack)

        # Horizontal stack (crop extra columns).
        hstack = link + self.hstack_1xN(hstack_input)[:, :, :w, :]
        hstack = self.activation(hstack)
        skip = self.hstack_skip(hstack)
        hstack = self.hstack_residual(hstack)
        # No residual for causal layers — it would leak future pixels.
        if not self.mask_center:
            hstack = hstack + hstack_input

        return vstack, hstack, skip


class GatedPixelCNN(base.AutoregressiveModel):
    """The Gated PixelCNN model."""

    input_layer: GatedPixelCNNLayer
    gated_layers: tuple
    head_conv1: Conv2d
    head_conv2: Conv2d

    def __init__(self, key, in_channels: int = 1, out_channels: int = 1,
                 n_gated: int = 10, gated_channels: int = 128,
                 head_channels: int = 32, in_shape=(28, 28, 1), sample_fn=None):
        super().__init__(in_shape=in_shape, sample_fn=sample_fn)
        keys = jax.random.split(key, n_gated + 3)
        self.input_layer = GatedPixelCNNLayer(
            keys[0], in_channels, gated_channels, kernel_size=7, mask_center=True)
        self.gated_layers = tuple(
            GatedPixelCNNLayer(keys[1 + i], gated_channels, gated_channels,
                               kernel_size=3, mask_center=False)
            for i in range(n_gated))
        self.head_conv1 = Conv2d(keys[-2], gated_channels, head_channels, 1)
        self.head_conv2 = Conv2d(keys[-1], head_channels, out_channels, 1)

    def forward(self, x, *, rng=None, training=False):
        del rng, training
        vstack, hstack, skip_connections = self.input_layer(x, x)
        for gated_layer in self.gated_layers:
            vstack, hstack, skip = gated_layer(vstack, hstack)
            skip_connections = skip_connections + skip
        out = self.head_conv1(jax.nn.relu(skip_connections))
        return self.head_conv2(jax.nn.relu(out))

    def sample(self, rng, n_samples=None, conditioned_on=None):
        """Incremental two-stream decoding with cached v/h maps (see
        ops/sampling.py; exact equivalence tested)."""
        from pytorch_generative_tpu.ops.sampling import (
            gated_pixel_cnn_sample_fast,
        )

        return gated_pixel_cnn_sample_fast(self, rng, n_samples=n_samples,
                                           conditioned_on=conditioned_on)

    def sample_naive(self, rng, n_samples=None, conditioned_on=None):
        """The generic full-forward-per-pixel raster sampler (base class)."""
        return super().sample(rng, n_samples=n_samples,
                              conditioned_on=conditioned_on)


def reproduce(n_epochs=457, batch_size=128, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (gated_pixel_cnn.py:195-251):
    81.50 nats."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models
    from pytorch_generative_tpu import optim as optim_tpu
    from pytorch_generative_tpu import trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True)

    model = models.GatedPixelCNN(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, n_gated=10,
        gated_channels=128, head_channels=32, in_shape=(28, 28, 1))
    optimizer = optim_tpu.adam_multiplicative(1e-3, 0.9999)

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
