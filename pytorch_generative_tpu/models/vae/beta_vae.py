"""Beta-VAE [1]: a VAE whose KL term is scaled by beta.

Parity surface: /root/reference/pytorch_generative/models/vae/beta_vae.py.

[1]: https://openreview.net/pdf?id=Sy2fzU9gl
"""

from __future__ import annotations

import jax

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models.vae import vae


class BetaVAE(vae.VAE):
    """The Beta-VAE model (beta=1.0 recovers the vanilla VAE)."""

    beta: float = core.static_field()

    def __init__(self, key, in_channels: int = 1, out_channels: int = 1,
                 beta: float = 4.0, latent_channels: int = 16, strides=(4,),
                 hidden_channels: int = 64, residual_channels: int = 32,
                 in_shape=(32, 32, 1), sample_fn=None):
        super().__init__(key, in_channels=in_channels, out_channels=out_channels,
                         latent_channels=latent_channels, strides=strides,
                         hidden_channels=hidden_channels,
                         residual_channels=residual_channels, in_shape=in_shape,
                         sample_fn=sample_fn)
        self.beta = beta

    def forward(self, x, *, rng=None, training=False):
        out, kl_div = super().forward(x, rng=rng, training=training)
        return out, self.beta * kl_div


def reproduce(n_epochs=500, batch_size=128, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (beta_vae.py:66-131)."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models, trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True, resize_to_32=True)

    model = models.BetaVAE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, beta=4.0,
        latent_channels=16, strides=(2, 2, 2, 2), hidden_channels=64,
        residual_channels=32, in_shape=(32, 32, 1))
    optimizer = optax.adam(1e-3)

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
