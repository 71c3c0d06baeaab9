"""VQ-VAE-2 [1]: a two-level hierarchy of vector-quantized latent spaces.

Parity surface: /root/reference/pytorch_generative/models/vae/vq_vae_2.py. The
loss combines both quantizer losses (x0.5) plus the top-bottom consistency term
``mse(decoded_t, encoded_b)`` (vq_vae_2.py:110); reproduce() weights the total
quantization loss by 0.25 (vq_vae_2.py:163-166).

[1]: https://arxiv.org/pdf/1906.00446.pdf
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.models.vae import vaes
from pytorch_generative_tpu.nn import Conv2d


class VectorQuantizedVAE2(base.VariationalAutoEncoder):
    """The VQ-VAE-2 model with a latent hierarchy of depth 2."""

    encoder_b: vaes.Encoder
    encoder_t: vaes.Encoder
    quantizer_t: vaes.Quantizer
    quantizer_b: vaes.Quantizer
    decoder_t: vaes.Decoder
    conv: Conv2d
    decoder_b: vaes.Decoder

    def __init__(self, key, in_channels: int = 1, out_channels: int = 1,
                 hidden_channels: int = 128, n_residual_blocks: int = 2,
                 residual_channels: int = 32, n_embeddings: int = 128,
                 embedding_dim: int = 16, in_shape=(32, 32, 3), sample_fn=None):
        super().__init__(in_shape=in_shape, sample_fn=sample_fn)
        keys = jax.random.split(key, 7)
        self.encoder_b = vaes.Encoder(
            keys[0], in_channels=in_channels, out_channels=hidden_channels,
            hidden_channels=hidden_channels, n_residual_blocks=n_residual_blocks,
            residual_channels=residual_channels, stride=2)
        self.encoder_t = vaes.Encoder(
            keys[1], in_channels=hidden_channels, out_channels=hidden_channels,
            hidden_channels=hidden_channels, n_residual_blocks=n_residual_blocks,
            residual_channels=residual_channels, stride=2)
        self.quantizer_t = vaes.Quantizer(
            keys[2], in_channels=hidden_channels, n_embeddings=n_embeddings,
            embedding_dim=embedding_dim)
        self.quantizer_b = vaes.Quantizer(
            keys[3], in_channels=hidden_channels, n_embeddings=n_embeddings,
            embedding_dim=embedding_dim)
        self.decoder_t = vaes.Decoder(
            keys[4], in_channels=embedding_dim, out_channels=hidden_channels,
            hidden_channels=hidden_channels, n_residual_blocks=n_residual_blocks,
            residual_channels=residual_channels, stride=2)
        self.conv = Conv2d(keys[5], hidden_channels, embedding_dim, 1)
        self.decoder_b = vaes.Decoder(
            keys[6], in_channels=2 * embedding_dim, out_channels=out_channels,
            hidden_channels=hidden_channels, n_residual_blocks=n_residual_blocks,
            residual_channels=residual_channels, stride=2)

    def forward(self, x, *, rng=None, training=False):
        """Returns (reconstruction, total quantization loss)."""
        return self.forward_with_state(x, rng=rng, training=training)[0]

    def forward_with_state(self, x, *, rng=None, training=False):
        del rng
        encoded_b = self.encoder_b(x)
        encoded_t = self.encoder_t(encoded_b)

        quantized_t, vq_loss_t, new_qt = self.quantizer_t(
            encoded_t, training=training)
        quantized_b, vq_loss_b, new_qb = self.quantizer_b(
            encoded_b, training=training)

        decoded_t = self.decoder_t(quantized_t)
        xhat = self.decoder_b(
            jnp.concatenate([self.conv(decoded_t), quantized_b], axis=-1))
        consistency = jnp.mean((decoded_t - encoded_b) ** 2)
        loss = 0.5 * (vq_loss_b + vq_loss_t) + consistency
        new_self = self.replace(quantizer_t=new_qt, quantizer_b=new_qb)
        return (xhat, loss), new_self

    def _sample(self, rng, n_samples):
        raise NotImplementedError("VQ-VAE-2 does not support sampling.")


def reproduce(n_epochs=457, batch_size=128, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (vq_vae_2.py:116-185)."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models
    from pytorch_generative_tpu import optim as optim_tpu
    from pytorch_generative_tpu import trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_cifar10_loaders(
            batch_size, normalize=True)

    model = models.VectorQuantizedVAE2(
        jax.random.PRNGKey(0), in_channels=3, out_channels=3,
        hidden_channels=128, n_residual_blocks=2, residual_channels=64,
        n_embeddings=512, embedding_dim=64, in_shape=(32, 32, 3))
    optimizer = optim_tpu.adam_multiplicative(2e-4, 0.999977)

    def loss_fn(x, _, preds):
        preds, vq_loss = preds
        recon_loss = jnp.mean((preds - x) ** 2)
        loss = recon_loss + 0.25 * vq_loss
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
