"""Common modules and math used by the VAE family.

Parity surface: /root/reference/pytorch_generative/models/vae/vaes.py. The
torch.jit.script'ed Gaussian helpers become plain jnp functions (XLA fuses them);
the Encoder/Decoder keep the reference's exact channel-halving strided topology.
All KL conventions (including gaussian_kl_div's 2*var factor, vaes.py:22-27) are
reproduced verbatim — they define the reported ELBOs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.nn import Conv2d, ConvTranspose2d, VectorQuantizer


# ---------------------------------------------------------------------------
# Gaussian math (vaes.py:16-66)
# ---------------------------------------------------------------------------

def to_var(log_std):
    """Variance from log standard deviation."""
    return jnp.exp(log_std) ** 2


def unit_gaussian_kl_div(mean, log_std):
    """KL(p || N(0, 1)) for diagonal-covariance Gaussian p (elementwise)."""
    return -0.5 * (1 + 2 * log_std - to_var(log_std) - mean**2)


def gaussian_kl_div(p_mean, p_log_std, q_mean, q_log_std):
    """KL(p || q) for diagonal Gaussians, with the reference's exact algebra
    (including its 2*to_var(q_log_std) denominator, vaes.py:22-27)."""
    mean_delta = (p_mean - q_mean) ** 2
    log_std_delta = q_log_std - p_log_std
    p_var, q_var = to_var(p_log_std), 2 * to_var(q_log_std)
    return -0.5 + log_std_delta + (p_var + mean_delta) / q_var


def sample_from_gaussian(rng, mu, log_sig):
    """Reparameterized sample from a diagonal Gaussian."""
    return mu + jnp.exp(log_sig) * jax.random.normal(rng, log_sig.shape,
                                                     log_sig.dtype)


def _unflatten_tril(x):
    """Unflattens (N, dim*(dim+1)/2) vectors into lower-triangular matrices."""
    n, flat = x.shape
    dim = int((math.isqrt(8 * flat + 1) - 1) // 2)
    rows, cols = jnp.tril_indices(dim)
    tril = jnp.zeros((n, dim, dim), x.dtype)
    return tril.at[:, rows, cols].set(x)


def gaussian_log_prob(x, mu, chol_sig):
    """Log likelihood of x under a full-covariance Gaussian.

    ``chol_sig`` is the flattened lower-triangular Cholesky factor of the
    covariance. (Unused by the models — kept for API parity, vaes.py:36-66,
    including the reference's use of logdet(x) rather than logdet(sig).)
    """
    dim = x.shape[0]
    chol = _unflatten_tril(chol_sig)
    sig = chol @ jnp.swapaxes(chol, -1, -2)
    const = -0.5 * dim * jnp.log(jnp.asarray(2 * jnp.pi))
    log_det = -0.5 * jnp.linalg.slogdet(x)[1]
    diff = x - mu
    exp = -0.5 * (diff.T @ jnp.linalg.inv(sig) @ diff)
    return const + log_det + exp


# ---------------------------------------------------------------------------
# Building blocks (vaes.py:69-264)
# ---------------------------------------------------------------------------

class ResidualBlock(core.Module):
    """x + conv1x1(relu(conv3x3(relu(x))))."""

    conv1: Conv2d
    conv2: Conv2d

    def __init__(self, key, n_channels: int, hidden_channels: int):
        k1, k2 = jax.random.split(key)
        self.conv1 = Conv2d(k1, n_channels, hidden_channels, 3, padding=1)
        self.conv2 = Conv2d(k2, hidden_channels, n_channels, 1)

    def __call__(self, x):
        h = self.conv1(jax.nn.relu(x))
        h = self.conv2(jax.nn.relu(h))
        return x + h


class ResidualStack(core.Module):
    """A stack of ResidualBlocks followed by a ReLU."""

    blocks: tuple

    def __init__(self, key, n_channels: int, hidden_channels: int,
                 n_residual_blocks: int = 1):
        keys = jax.random.split(key, n_residual_blocks)
        self.blocks = tuple(ResidualBlock(keys[i], n_channels, hidden_channels)
                            for i in range(n_residual_blocks))

    def __call__(self, x):
        for block in self.blocks:
            x = block(x)
        return jax.nn.relu(x)


class Encoder(core.Module):
    """Downsampling encoder: stride//2 conv-stride-2 stages (channel-halving
    pattern) -> ResidualStack -> 3x3 conv."""

    down_convs: tuple
    residual_stack: ResidualStack
    out_conv: Conv2d

    def __init__(self, key, in_channels: int, out_channels: int,
                 hidden_channels: int, n_residual_blocks: int,
                 residual_channels: int, stride: int):
        assert stride % 2 == 0, '"stride" must be even.'
        n_stages = stride // 2
        keys = jax.random.split(key, n_stages + 2)
        convs = []
        for i in range(n_stages):
            first, last = 0, n_stages - 1
            in_c = in_channels if i == first else hidden_channels // 2
            out_c = hidden_channels // 2 if i < last else hidden_channels
            convs.append(Conv2d(keys[i], in_c, out_c, 4, stride=2, padding=1))
        self.down_convs = tuple(convs)
        self.residual_stack = ResidualStack(
            keys[-2], hidden_channels, residual_channels, n_residual_blocks)
        self.out_conv = Conv2d(keys[-1], hidden_channels, out_channels, 3,
                               padding=1)

    def __call__(self, x):
        for conv in self.down_convs:
            x = jax.nn.relu(conv(x))
        x = self.residual_stack(x)
        return self.out_conv(x)


class Decoder(core.Module):
    """Upsampling decoder: 3x3 conv -> ResidualStack -> stride//2 transpose-conv
    stages (ReLU between all but the last)."""

    in_conv: Conv2d
    residual_stack: ResidualStack
    up_convs: tuple

    def __init__(self, key, in_channels: int, out_channels: int,
                 hidden_channels: int, n_residual_blocks: int,
                 residual_channels: int, stride: int):
        assert stride % 2 == 0, '"stride" must be even.'
        n_stages = stride // 2
        keys = jax.random.split(key, n_stages + 2)
        self.in_conv = Conv2d(keys[0], in_channels, hidden_channels, 3, padding=1)
        self.residual_stack = ResidualStack(
            keys[1], hidden_channels, residual_channels, n_residual_blocks)
        convs = []
        for i in range(n_stages):
            first, last = 0, n_stages - 1
            in_c = hidden_channels if i == first else hidden_channels // 2
            out_c = hidden_channels // 2 if i < last else out_channels
            convs.append(ConvTranspose2d(keys[2 + i], in_c, out_c, 4, stride=2,
                                         padding=1))
        self.up_convs = tuple(convs)

    def __call__(self, x):
        x = self.in_conv(x)
        x = self.residual_stack(x)
        last = len(self.up_convs) - 1
        for i, conv in enumerate(self.up_convs):
            x = conv(x)
            if i < last:
                x = jax.nn.relu(x)
        return x


class Quantizer(core.Module):
    """1x1 conv into a VectorQuantizer (handles arbitrary input channels)."""

    conv: Conv2d
    vq: VectorQuantizer

    def __init__(self, key, in_channels: int, n_embeddings: int,
                 embedding_dim: int):
        k1, k2 = jax.random.split(key)
        self.conv = Conv2d(k1, in_channels, embedding_dim, 1)
        self.vq = VectorQuantizer(k2, n_embeddings, embedding_dim)

    def __call__(self, x, training: bool = False):
        quantized, loss, new_vq = self.vq(self.conv(x), training=training)
        return quantized, loss, self.replace(vq=new_vq)
