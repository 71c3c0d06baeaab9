"""(Convolutional) ImageGPT [1]: a decoder-only Transformer over pixels.

Parity surface:
/root/reference/pytorch_generative/models/autoregressive/image_gpt.py. Notable
reference behaviors preserved: the learnable positional embedding is added to the
*input image* (image_gpt.py:86, 106); each TransformerBlock has internal pre-LN
residuals AND the model adds an extra skip around every block (image_gpt.py:105-109).

[1]: https://cdn.openai.com/papers/Generative_Pretraining_from_Pixels_V2.pdf
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.nn import (
    CausalAttention,
    CausalConv2d,
    ChannelLayerNorm,
    Conv2d,
)


def _fused_kernels_default(n_channels: int) -> bool:
    """Whether the fused LN/MLP Pallas kernels should run (see
    TransformerBlock.__init__ for the measurements behind the gate)."""
    import os

    env = os.environ.get("PGT_FUSED_MLP")
    want = n_channels % 128 == 0 if env is None else env == "1"
    return want and jax.default_backend() == "tpu"


class TransformerBlock(core.Module):
    """An ImageGPT Transformer block (pre-LN attention + 4x GELU MLP)."""

    ln1: ChannelLayerNorm
    ln2: ChannelLayerNorm
    attn: CausalAttention
    mlp_conv1: Conv2d
    mlp_conv2: Conv2d
    use_fused_mlp: bool = core.static_field()

    def __init__(self, key, n_channels: int, n_attention_heads: int):
        k1, k2, k3 = jax.random.split(key, 3)
        # Fused LN2+MLP+residual Pallas kernel (ops/mlp_pallas.py): one pass
        # over row blocks instead of XLA materializing the (R, 4C)
        # pre-activation + GELU (+ their backward temps) in HBM — and, with
        # ln1 fused too (ops/ln_pallas.py), the whole block body is custom
        # calls so XLA has no layout freedom left between them. Default ON
        # where measured to win on v5e (C % 128 == 0, full lanes): C=512
        # bf16 bs64 675->698 samples/s (d_k=128) / 562->578 (d_k=64).
        # At C=64 the kernels LOSE (half-empty lanes + boundary copies:
        # 3301->3283 fused-MLP-only, ->2600 with fused LN), hence the gate.
        # PGT_FUSED_MLP=1/0 forces it either way. The kernel also wins on
        # *memory*: only x (+ the bf16 pre-activation) is saved for
        # backward, no (R, 4C) GELU output — matters at long sequence.
        self.use_fused_mlp = _fused_kernels_default(n_channels)
        self.ln1 = ChannelLayerNorm(n_channels, fused=self.use_fused_mlp)
        self.ln2 = ChannelLayerNorm(n_channels)
        self.attn = CausalAttention(
            k1, in_channels=n_channels, n_heads=n_attention_heads,
            embed_channels=n_channels, out_channels=n_channels)
        self.mlp_conv1 = Conv2d(k2, n_channels, 4 * n_channels, 1)
        self.mlp_conv2 = Conv2d(k3, 4 * n_channels, n_channels, 1)

    def __call__(self, x):
        x = x + self.attn(self.ln1(x))
        if self.use_fused_mlp:
            from pytorch_generative_tpu.ops.mlp_pallas import ln_mlp_residual

            return ln_mlp_residual(
                x, self.ln2.scale, self.ln2.offset,
                self.mlp_conv1.weight[0, 0], self.mlp_conv1.bias,
                self.mlp_conv2.weight[0, 0], self.mlp_conv2.bias,
                self.ln2.eps)
        h = self.mlp_conv2(jax.nn.gelu(self.mlp_conv1(self.ln2(x)), approximate=False))
        return x + h


class ImageGPT(base.AutoregressiveModel):
    """The ImageGPT model (operating on images, with per-block output skips)."""

    pos: jax.Array
    input_conv: CausalConv2d
    blocks: tuple
    ln: ChannelLayerNorm
    out_conv: Conv2d
    remat: bool = core.static_field()

    def __init__(self, key, in_channels: int = 1, out_channels: int = 1,
                 in_size: int = 28, n_transformer_blocks: int = 8,
                 n_attention_heads: int = 4, n_embedding_channels: int = 16,
                 in_shape=None, sample_fn=None, remat: bool = False):
        """Initializes a new ImageGPT instance.

        Args:
            key: RNG key for parameter init.
            in_channels / out_channels: Input/output channels.
            in_size: Side length of (square) inputs, for the positional embedding
                (overridden by in_shape when given).
            n_transformer_blocks / n_attention_heads / n_embedding_channels:
                Transformer hyperparameters.
            in_shape: (h, w, c) of training images.
            sample_fn: See the base class.
            remat: Rematerialize each transformer block in the backward pass
                (jax.checkpoint) — trades ~1 extra forward of FLOPs for O(1)
                stored block activations, unblocking big-batch / wide-channel
                configs that otherwise exhaust HBM (e.g. C=512 at batch 256
                on a 16GB v5e).
        """
        in_shape = tuple(in_shape) if in_shape else (in_size, in_size, in_channels)
        super().__init__(in_shape=in_shape, sample_fn=sample_fn)
        keys = jax.random.split(key, n_transformer_blocks + 2)
        h, w, c = in_shape
        self.pos = jnp.zeros((1, h, w, c))
        self.input_conv = CausalConv2d(
            keys[0], True, in_channels, n_embedding_channels, 3, padding=1)
        self.blocks = tuple(
            TransformerBlock(keys[1 + i], n_embedding_channels, n_attention_heads)
            for i in range(n_transformer_blocks))
        self.ln = ChannelLayerNorm(
            n_embedding_channels,
            fused=_fused_kernels_default(n_embedding_channels))
        self.out_conv = Conv2d(keys[-1], n_embedding_channels, out_channels, 1)
        self.remat = remat

    def forward(self, x, *, rng=None, training=False):
        del rng, training
        x = self.input_conv(x + self.pos)
        # Run the transformer middle on flat (N, L, C) sequences: one reshape
        # here instead of per-block rank-4<->rank-3 round-trips, which XLA
        # turned into a layout-conversion copy at every block boundary
        # (profile-measured on v5e; see CausalAttention.__call__).
        n, h, w, c = x.shape
        x = x.reshape(n, h * w, c)
        run_block = lambda block, x: x + block(x)
        if self.remat:
            run_block = jax.checkpoint(run_block)
        for block in self.blocks:
            x = run_block(block, x)
        return self.out_conv(self.ln(x.reshape(n, h, w, c)))

    def sample(self, rng, n_samples=None, conditioned_on=None):
        """KV-cache incremental decoding: O(C^2 + L*C) per pixel instead of a
        full forward (see ops/sampling.py; equivalence tested)."""
        from pytorch_generative_tpu.ops.sampling import image_gpt_sample_fast

        return image_gpt_sample_fast(self, rng, n_samples=n_samples,
                                     conditioned_on=conditioned_on)

    def sample_naive(self, rng, n_samples=None, conditioned_on=None):
        """The generic full-forward-per-pixel raster sampler (base class)."""
        return super().sample(rng, n_samples=n_samples,
                              conditioned_on=conditioned_on)


def reproduce(n_epochs=457, batch_size=64, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """Training script with reference defaults (image_gpt.py:113-175): 79.17 nats."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models
    from pytorch_generative_tpu import optim as optim_tpu
    from pytorch_generative_tpu import trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True)

    model = models.ImageGPT(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=28,
        n_transformer_blocks=8, n_attention_heads=2, n_embedding_channels=64,
        in_shape=(28, 28, 1))
    optimizer = optim_tpu.adam_multiplicative(5e-3, 0.999977)

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
