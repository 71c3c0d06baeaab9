"""ImageGPT-MoE: the ImageGPT decoder with mixture-of-experts MLPs.

A capability extension beyond the reference (which ships only dense models —
SURVEY.md section 2.4): each transformer block's 4x GELU MLP is replaced by a
Switch-style top-1 ``SparseMoE`` (nn/moe.py), scaling parameter count without
scaling per-token FLOPs. Architecture otherwise matches ImageGPT exactly
(/root/reference/pytorch_generative/models/autoregressive/image_gpt.py:86-109):
positional embedding added to the input image, pre-LN attention residuals, and
the extra per-block output skip.

Expert parallelism: ``forward`` takes an optional (mesh, axis_name) so the
expert MLPs execute sharded over an 'expert' mesh axis via two all_to_all
collectives (parallel/ep.py) — dp x ep combined, the GShard layout.
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
from pytorch_generative_tpu.nn.moe import SparseMoE


class MoETransformerBlock(core.Module):
    """Pre-LN attention + top-1 MoE MLP, with ImageGPT's residual wiring."""

    ln1: ChannelLayerNorm
    ln2: ChannelLayerNorm
    attn: CausalAttention
    moe: SparseMoE

    def __init__(self, key, n_channels: int, n_attention_heads: int,
                 n_experts: int, capacity_factor: float = 2.0,
                 n_selected: int = 1, group_size: int | None = None):
        k1, k2 = jax.random.split(key)
        self.ln1 = ChannelLayerNorm(n_channels)
        self.ln2 = ChannelLayerNorm(n_channels)
        self.attn = CausalAttention(
            k1, in_channels=n_channels, n_heads=n_attention_heads,
            embed_channels=n_channels, out_channels=n_channels)
        self.moe = SparseMoE(k2, n_channels, 4 * n_channels, n_experts,
                             capacity_factor, n_selected=n_selected,
                             group_size=group_size)

    def __call__(self, x, mesh=None, axis_name: str = "expert"):
        x = x + self.attn(self.ln1(x))
        if mesh is None:
            h, aux = self.moe(self.ln2(x))
        else:
            from pytorch_generative_tpu.parallel.ep import (
                moe_forward_expert_parallel,
            )

            h, aux = moe_forward_expert_parallel(
                self.moe, self.ln2(x), mesh, axis_name)
        return x + h, aux


class ImageGPTMoE(base.AutoregressiveModel):
    """ImageGPT with MoE MLPs; forward returns (logits, aux_loss).

    ``aux_loss`` is the mean Switch load-balancing loss over blocks; add it to
    the task loss with a small coefficient (0.01 in ``reproduce``).
    """

    pos: jax.Array
    input_conv: CausalConv2d
    blocks: tuple
    ln: ChannelLayerNorm
    out_conv: Conv2d

    def __init__(self, key, in_channels: int = 1, out_channels: int = 1,
                 in_size: int = 28, n_transformer_blocks: int = 8,
                 n_attention_heads: int = 2, n_embedding_channels: int = 64,
                 n_experts: int = 8, capacity_factor: float = 2.0,
                 n_selected: int = 1, group_size: int | None = None,
                 in_shape=None, sample_fn=None):
        in_shape = tuple(in_shape) if in_shape else (
            in_size, in_size, in_channels)
        super().__init__(in_shape=in_shape, sample_fn=sample_fn)
        keys = jax.random.split(key, n_transformer_blocks + 2)
        h, w, c = in_shape
        self.pos = jnp.zeros((1, h, w, c))
        self.input_conv = CausalConv2d(
            keys[0], True, in_channels, n_embedding_channels, 3, padding=1)
        self.blocks = tuple(
            MoETransformerBlock(keys[1 + i], n_embedding_channels,
                                n_attention_heads, n_experts, capacity_factor,
                                n_selected=n_selected, group_size=group_size)
            for i in range(n_transformer_blocks))
        self.ln = ChannelLayerNorm(n_embedding_channels)
        self.out_conv = Conv2d(keys[-1], n_embedding_channels, out_channels, 1)

    def forward(self, x, *, rng=None, training=False, mesh=None,
                axis_name: str = "expert"):
        del rng, training
        h = self.input_conv(x + self.pos)
        n, hh, ww, c = h.shape
        h = h.reshape(n, hh * ww, c)  # flat middle; see ImageGPT.forward
        aux_total = 0.0
        for block in self.blocks:
            out, aux = block(h, mesh=mesh, axis_name=axis_name)
            h = h + out
            aux_total = aux_total + aux
        logits = self.out_conv(self.ln(h.reshape(n, hh, ww, c)))
        return logits, aux_total / len(self.blocks)

    def _forward_logits(self, x):
        return self.forward(x)[0]

    def sample(self, rng, n_samples=None, conditioned_on=None):
        """KV-cache incremental decoding with drop-free top-1 expert MLPs
        (see ops/sampling.py::image_gpt_moe_sample_fast; equivalence with the
        naive sampler tested in the no-drop capacity regime)."""
        from pytorch_generative_tpu.ops.sampling import (
            image_gpt_moe_sample_fast,
        )

        return image_gpt_moe_sample_fast(self, rng, n_samples=n_samples,
                                         conditioned_on=conditioned_on)

    def sample_naive(self, rng, n_samples=None, conditioned_on=None):
        """The generic full-forward-per-pixel raster sampler (base class)."""
        return super().sample(rng, n_samples=n_samples,
                              conditioned_on=conditioned_on)


def reproduce(n_epochs=457, batch_size=64, log_dir="/tmp/run", n_devices=1,
              device_id=None, debug_loader=None):
    """ImageGPT training recipe (image_gpt.py:113-175 hyperparameters) with
    8-expert MoE MLPs and the 0.01-weighted load-balancing loss."""
    del device_id
    import optax

    from pytorch_generative_tpu import datasets, models
    from pytorch_generative_tpu import optim as optim_tpu
    from pytorch_generative_tpu import trainer

    train_loader, test_loader = debug_loader, debug_loader
    if train_loader is None:
        train_loader, test_loader = datasets.get_mnist_loaders(
            batch_size, dynamically_binarize=True)

    model = models.ImageGPTMoE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=28,
        n_transformer_blocks=8, n_attention_heads=2, n_embedding_channels=64,
        n_experts=8, in_shape=(28, 28, 1))
    optimizer = optim_tpu.adam_multiplicative(5e-3, 0.999977)

    def loss_fn(x, _, preds):
        logits, aux = preds
        n = x.shape[0]
        bce = optax.sigmoid_binary_cross_entropy(
            logits.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()
        return {"loss": bce + 0.01 * aux, "bce": bce, "moe_aux": aux}

    model_trainer = trainer.Trainer(
        model=model, loss_fn=loss_fn, optimizer=optimizer,
        train_loader=train_loader, eval_loader=test_loader, log_dir=log_dir,
        n_devices=n_devices)
    model_trainer.interleaved_train_and_eval(n_epochs)
    return model_trainer
