"""VQ-VAE [1]: a VAE with a discrete, vector-quantized latent space.

Parity surface: /root/reference/pytorch_generative/models/vae/vq_vae.py. The
EMA codebook update is functional state: ``forward_with_state`` returns an
updated model carrying the new codebook buffers (psum'd across the data mesh
when trained data-parallel — see nn/utils.py).

[1]: https://arxiv.org/pdf/1711.00937.pdf
"""

from __future__ import annotations

import jax

from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.models.vae import vaes


class VectorQuantizedVAE(base.VariationalAutoEncoder):
    """The Vector Quantized Variational Autoencoder (VQ-VAE) model."""

    encoder: vaes.Encoder
    quantizer: vaes.Quantizer
    decoder: vaes.Decoder

    def __init__(self, key, in_channels: int = 1, out_channels: int = 1,
                 hidden_channels: int = 128, n_residual_blocks: int = 2,
                 residual_channels: int = 32, n_embeddings: int = 128,
                 embedding_dim: int = 16, in_shape=(32, 32, 3), sample_fn=None):
        super().__init__(in_shape=in_shape, sample_fn=sample_fn)
        k1, k2, k3 = jax.random.split(key, 3)
        self.encoder = vaes.Encoder(
            k1, in_channels=in_channels, out_channels=hidden_channels,
            hidden_channels=hidden_channels, n_residual_blocks=n_residual_blocks,
            residual_channels=residual_channels, stride=4)
        self.quantizer = vaes.Quantizer(
            k2, in_channels=hidden_channels, n_embeddings=n_embeddings,
            embedding_dim=embedding_dim)
        self.decoder = vaes.Decoder(
            k3, in_channels=embedding_dim, out_channels=out_channels,
            hidden_channels=hidden_channels, n_residual_blocks=n_residual_blocks,
            residual_channels=residual_channels, stride=4)

    def forward(self, x, *, rng=None, training=False):
        """Returns (reconstruction, quantization_loss)."""
        return self.forward_with_state(x, rng=rng, training=training)[0]

    def forward_with_state(self, x, *, rng=None, training=False):
        del rng
        encoded = self.encoder(x)
        quantized, vq_loss, new_quantizer = self.quantizer(
            encoded, training=training)
        decoded = self.decoder(quantized)
        return (decoded, vq_loss), self.replace(quantizer=new_quantizer)

    def _sample(self, rng, n_samples):
        raise NotImplementedError("VQ-VAE does not support sampling.")


def reproduce(n_epochs=457, batch_size=128, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (vq_vae.py:88-153):
    CIFAR10 reconstruction with 512x64 codebook."""
    del device_id
    import jax.numpy as jnp
    import optax

    from pytorch_generative_tpu import datasets, models
    from pytorch_generative_tpu import optim as optim_tpu
    from pytorch_generative_tpu import trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_cifar10_loaders(
            batch_size, normalize=True)

    model = models.VectorQuantizedVAE(
        jax.random.PRNGKey(0), in_channels=3, out_channels=3,
        hidden_channels=128, residual_channels=32, n_residual_blocks=2,
        n_embeddings=512, embedding_dim=64, in_shape=(32, 32, 3))
    optimizer = optim_tpu.adam_multiplicative(2e-4, 0.999977)

    def loss_fn(x, _, preds):
        preds, vq_loss = preds
        recon_loss = jnp.mean((preds - x) ** 2)
        loss = recon_loss + vq_loss
        return {
            "vq_loss": vq_loss,
            "reconstruction_loss": recon_loss,
            "loss": loss,
        }

    model_trainer = trainer.Trainer(
        model=model, loss_fn=loss_fn, optimizer=optimizer,
        train_loader=train_loader, eval_loader=test_loader, log_dir=log_dir,
        n_devices=n_devices)
    model_trainer.interleaved_train_and_eval(n_epochs)
    return model_trainer
