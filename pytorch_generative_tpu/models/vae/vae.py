"""Variational Autoencoder [1].

Parity surface: /root/reference/pytorch_generative/models/vae/vae.py. forward
returns (reconstruction_logits, kl_div) where kl_div is summed over latent
dimensions per example (not normalized); sampling draws unit-Gaussian latents at
the downsampled resolution and decodes.

[1]: https://arxiv.org/pdf/1312.6114.pdf
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.models.vae import vaes


class VAE(base.VariationalAutoEncoder):
    """The Variational Autoencoder model."""

    encoders: tuple
    decoders: tuple
    latent_channels: int = core.static_field()
    total_stride: int = core.static_field()

    def __init__(self, key, in_channels: int = 1, out_channels: int = 1,
                 latent_channels: int = 16, strides=(4,), hidden_channels: int = 64,
                 residual_channels: int = 32, in_shape=(32, 32, 1), sample_fn=None):
        """Initializes a new VAE instance.

        Args:
            key: RNG key for parameter init.
            in_channels / out_channels: Image channels.
            latent_channels: Channels per latent variable.
            strides: One Encoder/Decoder pair per stride (downsampling by it).
            hidden_channels / residual_channels: Widths of hidden/residual layers.
            in_shape: (h, w, c) of training images (for sampling).
            sample_fn: See the base class.
        """
        super().__init__(in_shape=in_shape, sample_fn=sample_fn)
        strides = list(strides)
        self.latent_channels = latent_channels
        self.total_stride = sum(strides)
        keys = jax.random.split(key, 2 * len(strides))

        encoders = []
        for i, stride in enumerate(strides):
            in_c = in_channels if i == 0 else hidden_channels
            out_c = (hidden_channels if i < len(strides) - 1
                     else 2 * latent_channels)
            encoders.append(vaes.Encoder(
                keys[i], in_channels=in_c, out_channels=out_c,
                hidden_channels=hidden_channels,
                residual_channels=residual_channels, n_residual_blocks=2,
                stride=stride))
        self.encoders = tuple(encoders)

        decoders = []
        for i, stride in enumerate(reversed(strides)):
            in_c = latent_channels if i == 0 else hidden_channels
            out_c = hidden_channels if i < len(strides) - 1 else out_channels
            decoders.append(vaes.Decoder(
                keys[len(strides) + i], in_channels=in_c, out_channels=out_c,
                hidden_channels=hidden_channels,
                residual_channels=residual_channels, n_residual_blocks=2,
                stride=stride))
        self.decoders = tuple(decoders)

    def _encode(self, x):
        for encoder in self.encoders:
            x = encoder(x)
        return x

    def _decode(self, x):
        for decoder in self.decoders:
            x = decoder(x)
        return x

    def forward(self, x, *, rng=None, training=False):
        """Returns (reconstruction, per-example KL divergence)."""
        del training
        if rng is None:
            rng = jax.random.PRNGKey(0)
        mean, log_std = jnp.split(self._encode(x), 2, axis=-1)
        kl_div = vaes.unit_gaussian_kl_div(mean, log_std).sum(axis=(1, 2, 3))
        latents = vaes.sample_from_gaussian(rng, mean, log_std)
        return self._decode(latents), kl_div

    def _sample(self, rng, n_samples):
        h = self.in_shape[0]
        latent_size = h // 2 ** (self.total_stride // 2)
        shape = (n_samples, latent_size, latent_size, self.latent_channels)
        latents = jax.random.normal(rng, shape)
        return self._decode(latents)


def reproduce(n_epochs=457, batch_size=128, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (vae.py:104-171): ELBO <= 86.77
    nats on binarized, padded-to-32 MNIST."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models, trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True, resize_to_32=True)

    model = models.VAE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, latent_channels=16,
        strides=(2, 2, 2, 2), hidden_channels=64, residual_channels=32,
        in_shape=(32, 32, 1))
    optimizer = optax.adam(5e-4)

    def loss_fn(x, _, preds):
        preds, kl_div = preds
        recon_loss = optax.sigmoid_binary_cross_entropy(preds, x).sum(
            axis=(1, 2, 3))
        elbo = recon_loss + kl_div
        return {
            "recon_loss": recon_loss.mean(),
            "kl_div": kl_div.mean(),
            "loss": elbo.mean(),
        }

    model_trainer = trainer.Trainer(
        model=model, loss_fn=loss_fn, optimizer=optimizer,
        train_loader=train_loader, eval_loader=test_loader, log_dir=log_dir,
        n_devices=n_devices)
    model_trainer.interleaved_train_and_eval(n_epochs)
    return model_trainer
