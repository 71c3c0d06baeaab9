"""Very Deep VAE [1]: an inverted U-Net hierarchy of stochastic layers.

Parity surface: /root/reference/pytorch_generative/models/vae/vd_vae.py.
Preserved behaviors: per-resolution learnable bias tensors injected top-down
*before* each stack's unpool (vd_vae.py:392-398); encoder/decoder residual
output convs (and the latent projections) scaled by 1/sqrt(total blocks) at init
(vd_vae.py:335-337, 363-366); priors vs. posteriors chosen by presence of the
bottom-up ``mixin``; KL summed per example over all stochastic layers.

[1]: https://arxiv.org/pdf/2011.10650.pdf
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.models.vae import vaes
from pytorch_generative_tpu.nn import AvgPool2d, Conv2d, upsample_nearest_2x


@dataclasses.dataclass(frozen=True)
class StackConfig:
    """Encoder/decoder block counts for one resolution of the U-Net."""

    n_encoder_blocks: int
    n_decoder_blocks: int


DEFAULT_MODEL = tuple(
    StackConfig(n_encoder_blocks=1, n_decoder_blocks=1) for _ in range(6))


def _scale_last_weight(conv: Conv2d, scale: float) -> Conv2d:
    return conv.replace(weight=conv.weight * scale)


class BottleneckBlock(core.Module):
    """GELU 1x1 -> GELU kxk -> GELU kxk -> GELU 1x1 (optionally residual)."""

    conv1: Conv2d
    conv2: Conv2d
    conv3: Conv2d
    conv4: Conv2d
    is_residual: bool = core.static_field()

    def __init__(self, key, in_channels: int, out_channels: int,
                 bottleneck_channels: int, bottleneck_kernel_size: int = 3,
                 is_residual: bool = True):
        keys = jax.random.split(key, 4)
        padding = 1 if bottleneck_kernel_size == 3 else 0
        self.conv1 = Conv2d(keys[0], in_channels, bottleneck_channels, 1)
        self.conv2 = Conv2d(keys[1], bottleneck_channels, bottleneck_channels,
                            bottleneck_kernel_size, padding=padding)
        self.conv3 = Conv2d(keys[2], bottleneck_channels, bottleneck_channels,
                            bottleneck_kernel_size, padding=padding)
        self.conv4 = Conv2d(keys[3], bottleneck_channels, out_channels, 1)
        self.is_residual = is_residual

    def __call__(self, x):
        h = self.conv1(jax.nn.gelu(x, approximate=False))
        h = self.conv2(jax.nn.gelu(h, approximate=False))
        h = self.conv3(jax.nn.gelu(h, approximate=False))
        h = self.conv4(jax.nn.gelu(h, approximate=False))
        return x + h if self.is_residual else h


class TopDownBlock(core.Module):
    """One stochastic top-down layer: prior/posterior heads + latent injection."""

    prior: BottleneckBlock
    posterior: BottleneckBlock
    latents: Conv2d
    out: BottleneckBlock
    n_channels: int = core.static_field()
    latent_channels: int = core.static_field()

    def __init__(self, key, n_channels: int, latent_channels: int,
                 bottleneck_channels: int, bottleneck_kernel_size: int):
        keys = jax.random.split(key, 4)
        self.n_channels = n_channels
        self.latent_channels = latent_channels
        self.prior = BottleneckBlock(
            keys[0], n_channels, 2 * latent_channels + n_channels,
            bottleneck_channels, is_residual=False)
        self.posterior = BottleneckBlock(
            keys[1], 2 * n_channels, 2 * latent_channels, bottleneck_channels,
            is_residual=False)
        self.latents = Conv2d(keys[2], latent_channels, n_channels, 1)
        self.out = BottleneckBlock(
            keys[3], n_channels, n_channels, bottleneck_channels,
            bottleneck_kernel_size, is_residual=True)

    def __call__(self, x, mixin, rng):
        """Returns (activations, kl_div-or-None). Latents come from the posterior
        when ``mixin`` is given (training), else from the prior (generation)."""
        lc = self.latent_channels
        prior_out = self.prior(x)
        p_mean = prior_out[..., :lc]
        p_log_std = prior_out[..., lc: 2 * lc]
        p_h = prior_out[..., 2 * lc:]

        if mixin is None:
            z = vaes.sample_from_gaussian(rng, p_mean, p_log_std)
            kl_div = None
        else:
            q_out = self.posterior(jnp.concatenate([x, mixin], axis=-1))
            q_mean, q_log_std = q_out[..., :lc], q_out[..., lc:]
            z = vaes.sample_from_gaussian(rng, q_mean, q_log_std)
            kl_div = vaes.gaussian_kl_div(q_mean, q_log_std, p_mean, p_log_std)

        return self.out(x + p_h + self.latents(z)), kl_div


class EncoderStack(core.Module):
    """Residual bottleneck blocks (+ optional 2x average pool)."""

    residuals: tuple
    pool: AvgPool2d | None

    def __init__(self, key, n_residual_blocks: int, pool: bool, n_channels: int,
                 bottleneck_channels: int, bottleneck_kernel_size: int):
        keys = jax.random.split(key, max(n_residual_blocks, 1))
        self.residuals = tuple(
            BottleneckBlock(keys[i], n_channels, n_channels,
                            bottleneck_channels, bottleneck_kernel_size,
                            is_residual=True)
            for i in range(n_residual_blocks))
        self.pool = AvgPool2d(2, 2) if pool else None

    def __call__(self, x):
        for block in self.residuals:
            x = block(x)
        features = x
        if self.pool is not None:
            x = self.pool(features)
        return x, features


class DecoderStack(core.Module):
    """TopDownBlocks (+ optional nearest-neighbor 2x unpool on entry)."""

    topdowns: tuple
    unpool: bool = core.static_field()

    def __init__(self, key, n_topdown_blocks: int, unpool: bool, n_channels: int,
                 latent_channels: int, bottleneck_channels: int,
                 bottleneck_kernel_size: int):
        keys = jax.random.split(key, max(n_topdown_blocks, 1))
        self.unpool = unpool
        self.topdowns = tuple(
            TopDownBlock(keys[i], n_channels, latent_channels,
                         bottleneck_channels, bottleneck_kernel_size)
            for i in range(n_topdown_blocks))

    def __call__(self, x, mixin, rng):
        if self.unpool:
            x = upsample_nearest_2x(x)
        kl_divs = []
        rngs = jax.random.split(rng, max(len(self.topdowns), 1))
        for topdown, block_rng in zip(self.topdowns, rngs):
            x, kl_div = topdown(x, mixin, block_rng)
            kl_divs.append(kl_div)
        return x, kl_divs


class VeryDeepVAE(base.VariationalAutoEncoder):
    """The Very Deep VAE model."""

    input_conv: Conv2d
    encoder: tuple
    biases: tuple
    decoder: tuple
    output_conv: Conv2d
    remat: bool = core.static_field()

    def __init__(self, key, in_channels: int = 1, out_channels: int = 1,
                 input_resolution: int = 32, stack_configs=DEFAULT_MODEL,
                 latent_channels: int = 4, hidden_channels: int = 16,
                 bottleneck_channels: int = 8, in_shape=None, sample_fn=None,
                 remat: bool = False):
        """Initializes a new VeryDeepVAE instance.

        Args:
            key: RNG key for parameter init.
            in_channels / out_channels: Image channels.
            input_resolution: Input side length; halved after every encoder stack.
            stack_configs: StackConfig per resolution.
            latent_channels / hidden_channels / bottleneck_channels: Widths.
            in_shape: (h, w, c); defaults to (input_resolution, ..., in_channels).
            sample_fn: See the base class.
            remat: Rematerialize each encoder/decoder stack in the backward
                pass (jax.checkpoint) — trades recompute FLOPs for activation
                memory on deep configs.
        """
        self.remat = remat
        stack_configs = tuple(stack_configs)
        in_shape = tuple(in_shape) if in_shape else (
            input_resolution, input_resolution, in_channels)
        super().__init__(in_shape=in_shape, sample_fn=sample_fn)

        n_stacks = len(stack_configs)
        keys = jax.random.split(key, 2 * n_stacks + 2)
        resolutions = [input_resolution // 2**i for i in range(n_stacks)]

        # --- Encoder (bottom-up) ---
        self.input_conv = Conv2d(keys[0], in_channels, hidden_channels, 3,
                                 padding=1)
        encoder_blocks = [c.n_encoder_blocks for c in stack_configs]
        total_encoder_blocks = sum(encoder_blocks)
        enc_scale = 1.0 / math.sqrt(total_encoder_blocks)
        encoder = []
        for i, (res, n_blocks) in enumerate(zip(resolutions, encoder_blocks)):
            stack = EncoderStack(
                keys[1 + i], n_residual_blocks=n_blocks,
                pool=i < n_stacks - 1, n_channels=hidden_channels,
                bottleneck_channels=bottleneck_channels,
                bottleneck_kernel_size=3 if res >= 3 else 1)
            stack = stack.replace(residuals=tuple(
                b.replace(conv4=_scale_last_weight(b.conv4, enc_scale))
                for b in stack.residuals))
            encoder.append(stack)
        self.encoder = tuple(encoder)

        # Bias tensors injected top-down; also the generation seeds (NHWC).
        self.biases = tuple(
            jnp.zeros((1, size, size, hidden_channels))
            for size in resolutions[1:] + [resolutions[-1]])

        # --- Decoder (top-down) ---
        decoder_blocks = [c.n_decoder_blocks for c in stack_configs]
        total_decoder_blocks = sum(decoder_blocks)
        dec_scale = 1.0 / math.sqrt(total_decoder_blocks)
        decoder = []
        for i, (res, n_blocks) in enumerate(
                zip(reversed(resolutions), reversed(decoder_blocks))):
            stack = DecoderStack(
                keys[1 + n_stacks + i], n_topdown_blocks=n_blocks, unpool=i > 0,
                n_channels=hidden_channels, latent_channels=latent_channels,
                bottleneck_channels=bottleneck_channels,
                bottleneck_kernel_size=3 if res >= 3 else 1)
            stack = stack.replace(topdowns=tuple(
                t.replace(
                    out=t.out.replace(
                        conv4=_scale_last_weight(t.out.conv4, dec_scale)),
                    latents=_scale_last_weight(t.latents, dec_scale))
                for t in stack.topdowns))
            decoder.append(stack)
        self.decoder = tuple(decoder)
        self.output_conv = Conv2d(keys[-1], hidden_channels, out_channels, 1)

    def forward(self, x, *, rng=None, training=False):
        """Returns (reconstruction, per-example KL divergence)."""
        del training
        if rng is None:
            rng = jax.random.PRNGKey(0)
        n = x.shape[0]

        # Bottom-up encoding.
        def run_enc(stack, h):
            return stack(h)

        if self.remat:
            run_enc = jax.checkpoint(run_enc)
        x = self.input_conv(x)
        mixins = []
        for stack in self.encoder:
            x, mixin = run_enc(stack, x)
            mixins.append(mixin)

        # Top-down decoding: start from zeros at the lowest resolution; add the
        # per-resolution bias *before* each stack (which unpools internally).
        def run_dec(stack, h, mixin, stack_rng):
            return stack(h, mixin, stack_rng)

        if self.remat:
            run_dec = jax.checkpoint(run_dec)
        # Match the (possibly bf16-cast) parameter dtype — a f32 zeros here
        # would promote the whole top-down pass back to f32 under
        # compute_dtype=bfloat16.
        x = jnp.zeros((n,) + self.biases[-1].shape[1:],
                      self.biases[-1].dtype)
        kl_divs = []
        rngs = jax.random.split(rng, len(self.decoder))
        for stack, mixin, bias, stack_rng in zip(
                self.decoder, reversed(mixins), reversed(self.biases), rngs):
            x = x + bias
            x, divs = run_dec(stack, x, mixin, stack_rng)
            kl_divs.extend(divs)

        kl_div = sum(div.sum(axis=(1, 2, 3)) for div in kl_divs)
        return self.output_conv(x), kl_div

    def _sample(self, rng, n_samples):
        x = jnp.zeros((n_samples,) + self.biases[-1].shape[1:],
                      self.biases[-1].dtype)
        rngs = jax.random.split(rng, len(self.decoder))
        for stack, bias, stack_rng in zip(self.decoder, reversed(self.biases),
                                          rngs):
            x = x + bias
            x, _ = stack(x, None, stack_rng)
        return self.output_conv(x)


def reproduce(n_epochs=500, batch_size=128, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (vd_vae.py:415-491): ELBO <= 80.72
    nats on binarized, padded-to-32 MNIST."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models, trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True, resize_to_32=True)

    stack_configs = (
        StackConfig(n_encoder_blocks=3, n_decoder_blocks=5),
        StackConfig(n_encoder_blocks=3, n_decoder_blocks=5),
        StackConfig(n_encoder_blocks=2, n_decoder_blocks=4),
        StackConfig(n_encoder_blocks=2, n_decoder_blocks=3),
        StackConfig(n_encoder_blocks=2, n_decoder_blocks=2),
        StackConfig(n_encoder_blocks=1, n_decoder_blocks=1),
    )

    model = models.VeryDeepVAE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1,
        input_resolution=32, stack_configs=stack_configs, latent_channels=16,
        hidden_channels=64, bottleneck_channels=32, in_shape=(32, 32, 1))
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
