"""PixelSNAIL [1]: masked convolutions + causal attention over all pixels.

Parity surface:
/root/reference/pytorch_generative/models/autoregressive/pixel_snail.py.
Preserved behaviors: 2x2 convs with pad-1-and-crop (pixel_snail.py:31-56),
identity-gated activations, attention over concat(2-channel positional encoding,
residual features) with the raw image as extra (k/v-only) input and
mask_center=True (pixel_snail.py:59-119), per-block output skips
(pixel_snail.py:182-187), and a head of two back-to-back 1x1 convs with no
intermediate nonlinearity.

[1]: https://arxiv.org/abs/1712.09763
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.nn import (
    CausalAttention,
    CausalConv2d,
    Conv2d,
    GatedActivation,
    image_positional_encoding,
)


def _elu_conv_elu(conv, x):
    return jax.nn.elu(conv(jax.nn.elu(x)))


def _identity(x):
    # Module-level (not a per-instance lambda): static fields live in the
    # pytree treedef and are compared by identity, so per-block lambdas would
    # make otherwise-identical blocks unstackable (parallel/pp.py).
    return x


class ResidualBlock(core.Module):
    """Residual block of 2x2 convs (pad 1, crop) with identity-gated activation."""

    input_conv: Conv2d
    output_conv: Conv2d
    activation: GatedActivation

    def __init__(self, key, n_channels: int):
        k1, k2 = jax.random.split(key)
        self.input_conv = Conv2d(k1, n_channels, n_channels, 2, padding=1)
        self.output_conv = Conv2d(k2, n_channels, 2 * n_channels, 2, padding=1)
        self.activation = GatedActivation(activation_fn=_identity)

    def __call__(self, x):
        _, h, w, _ = x.shape
        out = _elu_conv_elu(self.input_conv, x)[:, :h, :w, :]
        out = self.activation(self.output_conv(out)[:, :h, :w, :])
        return x + out


class PixelSNAILBlock(core.Module):
    """A stack of residual blocks plus one causal attention block (Fig. 5 of [1])."""

    residual_blocks: tuple
    attention: CausalAttention
    residual_out: Conv2d
    attention_out: Conv2d
    out: Conv2d

    def __init__(self, key, n_channels: int, input_img_channels: int = 1,
                 n_residual_blocks: int = 2, attention_key_channels: int = 4,
                 attention_value_channels: int = 32):
        keys = jax.random.split(key, n_residual_blocks + 4)
        self.residual_blocks = tuple(
            ResidualBlock(keys[i], n_channels) for i in range(n_residual_blocks))
        self.attention = CausalAttention(
            keys[-4], in_channels=n_channels + 2,
            embed_channels=attention_key_channels,
            out_channels=attention_value_channels, mask_center=True,
            extra_input_channels=input_img_channels)
        self.residual_out = Conv2d(keys[-3], n_channels, n_channels, 1)
        self.attention_out = Conv2d(keys[-2], attention_value_channels,
                                    n_channels, 1)
        self.out = Conv2d(keys[-1], n_channels, n_channels, 1)

    def __call__(self, x, input_img):
        res = x
        for block in self.residual_blocks:
            res = block(res)
        # Cast the (f32-cached) coordinate channels to the activation dtype so
        # mixed-precision (compute_dtype=bfloat16) runs don't get promoted
        # back to f32 by the concat.
        pos = image_positional_encoding(input_img.shape).astype(res.dtype)
        attn = self.attention(jnp.concatenate([pos, res], axis=-1), input_img)
        res = _elu_conv_elu(self.residual_out, res)
        attn = _elu_conv_elu(self.attention_out, attn)
        return _elu_conv_elu(self.out, res + attn)


class PixelSNAIL(base.AutoregressiveModel):
    """The PixelSNAIL model (with per-block output skips, as in the reference)."""

    input_conv: CausalConv2d
    pixel_snail_blocks: tuple
    output_conv1: Conv2d
    output_conv2: Conv2d

    def __init__(self, key, in_channels: int = 1, out_channels: int = 1,
                 n_channels: int = 64, n_pixel_snail_blocks: int = 8,
                 n_residual_blocks: int = 2, attention_key_channels: int = 4,
                 attention_value_channels: int = 32, in_shape=(28, 28, 1),
                 sample_fn=None):
        super().__init__(in_shape=in_shape, sample_fn=sample_fn)
        keys = jax.random.split(key, n_pixel_snail_blocks + 3)
        self.input_conv = CausalConv2d(
            keys[0], True, in_channels, n_channels, 3, padding=1)
        self.pixel_snail_blocks = tuple(
            PixelSNAILBlock(
                keys[1 + i], n_channels=n_channels,
                input_img_channels=in_channels,
                n_residual_blocks=n_residual_blocks,
                attention_key_channels=attention_key_channels,
                attention_value_channels=attention_value_channels)
            for i in range(n_pixel_snail_blocks))
        self.output_conv1 = Conv2d(keys[-2], n_channels, n_channels // 2, 1)
        self.output_conv2 = Conv2d(keys[-1], n_channels // 2, out_channels, 1)

    def forward(self, x, *, rng=None, training=False):
        del rng, training
        input_img = x
        x = self.input_conv(x)
        for block in self.pixel_snail_blocks:
            x = x + block(x, input_img)
        return self.output_conv2(self.output_conv1(x))

    def sample(self, rng, n_samples=None, conditioned_on=None):
        """Incremental decoding: conv activation caches + attention KV caches
        (see ops/sampling.py; exact equivalence tested)."""
        from pytorch_generative_tpu.ops.sampling import pixel_snail_sample_fast

        return pixel_snail_sample_fast(self, rng, n_samples=n_samples,
                                       conditioned_on=conditioned_on)

    def sample_naive(self, rng, n_samples=None, conditioned_on=None):
        """The generic full-forward-per-pixel raster sampler (base class)."""
        return super().sample(rng, n_samples=n_samples,
                              conditioned_on=conditioned_on)


def reproduce(n_epochs=457, batch_size=128, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (pixel_snail.py:196-254): 78.61
    nats — the reference's best likelihood."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models
    from pytorch_generative_tpu import optim as optim_tpu
    from pytorch_generative_tpu import trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True)

    model = models.PixelSNAIL(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, n_channels=64,
        n_pixel_snail_blocks=8, n_residual_blocks=2,
        attention_value_channels=32, attention_key_channels=4,
        in_shape=(28, 28, 1))
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
