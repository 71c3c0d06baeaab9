"""Sequence parallelism (SP) for transformer models: train with the pixel
sequence sharded across devices.

The transformer middle of ImageGPT — every O(L^2) attention and O(L*C^2) MLP —
runs on L/n_dev sequence shards inside one shard_map; attention is the
flash-kernel ring (parallel/ring_attention.py: k/v shards rotate over the ICI
ring, each step is a fused Pallas tile pass, values AND gradients equal the
single-device kernel). The cheap embedding (3x3 causal conv + positional) and
the output head run replicated: they are O(L*C) and keeping them outside the
shard_map avoids halo exchanges for the spatial conv.

The reference has no sequence parallelism (its max sequence is 1024 pixels,
SURVEY.md section 2.8); this trains contexts where a single device cannot hold
the (L, L) score matrix.

Usage:
    sp_model = SequenceParallelImageGPT(gpt, mesh)   # mesh axis "seq"
    Trainer(model=sp_model, ...)                     # trains end-to-end
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pytorch_generative_tpu import core
from pytorch_generative_tpu.models import base
from pytorch_generative_tpu.parallel.ring_attention import (
    ring_flash_attention_packed,
)


def _sp_attention(attn, x_loc, axis_name: str):
    """nn.CausalAttention applied to a local sequence shard (projections are
    1x1 and shard-local; the attention core is the flash ring)."""
    q = attn.q_proj(x_loc)
    kv = attn.kv_proj(x_loc)
    out = ring_flash_attention_packed(
        q, kv[..., : attn.embed_channels], kv[..., attn.embed_channels:],
        attn.mask_center, attn.n_heads, axis_name)
    return attn.out_proj(out)


def image_gpt_sp_forward(model, x, mesh: Mesh, axis_name: str = "seq",
                         data_axis: str | None = None):
    """ImageGPT forward with the transformer middle sequence-sharded.

    Matches model.forward exactly (same per-block arithmetic, including the
    extra per-block skip, image_gpt.py:105-109) with the (N, L, C) sequence
    axis split over ``axis_name``.

    With ``data_axis`` set (a second mesh axis), the batch axis is
    additionally sharded over it — the FSDP x SP composition: parameters
    enter the manual region replicated (in_specs P()), so ZeRO-3-sharded
    leaves are all-gathered right before use and the parameter cotangent is
    psum'd over BOTH axes (data = gradient sum over batch shards, seq =
    gradient sum over sequence shards), which GSPMD then reduce-scatters
    back into the FSDP layout at the optimizer.
    """
    h0 = model.input_conv(x + model.pos)
    n, h, w, c = h0.shape
    l = h * w
    n_dev = mesh.shape[axis_name]
    assert l % n_dev == 0, (
        f"sequence length {l} must divide by the {axis_name!r} axis size "
        f"{n_dev}")
    seq = h0.reshape(n, l, c)

    def shard_fn(blocks, t):
        for block in blocks:
            a = _sp_attention(block.attn, block.ln1(t), axis_name)
            u = t + a
            m = block.mlp_conv2(jax.nn.gelu(block.mlp_conv1(block.ln2(u)),
                                            approximate=False))
            # x + block(x): block(x) = u + m with u = x + attn(ln1(x)).
            t = t + (u + m)
        return t

    spec = P(data_axis, axis_name, None)
    bspec = jax.tree_util.tree_map(lambda _: P(), model.blocks)
    out = jax.shard_map(shard_fn, mesh=mesh, in_specs=(bspec, spec),
                        out_specs=spec, check_vma=False)(model.blocks, seq)
    return model.out_conv(model.ln(out.reshape(n, h, w, c)))


class SequenceParallelImageGPT(base.AutoregressiveModel):
    """ImageGPT wrapper whose forward is sequence-parallel over a mesh.

    A drop-in GenerativeModel: the Trainer trains it unchanged (parameters
    stay replicated; every O(L^2)/O(L*C^2) activation inside the blocks is
    sequence-sharded by the shard_map), and sampling delegates to the wrapped
    model's KV-cache decoder.
    """

    model: object
    mesh: Mesh = core.static_field()
    axis_name: str = core.static_field()
    data_axis: str | None = core.static_field()

    def __init__(self, model, mesh: Mesh, axis_name: str = "seq",
                 data_axis: str | None = None):
        super().__init__(in_shape=model.in_shape, sample_fn=model.sample_fn)
        self.model = model
        self.mesh = mesh
        self.axis_name = axis_name
        self.data_axis = data_axis

    def forward(self, x, *, rng=None, training=False):
        del rng, training
        return image_gpt_sp_forward(self.model, x, self.mesh, self.axis_name,
                                    data_axis=self.data_axis)

    def sample(self, rng, n_samples=None, conditioned_on=None):
        return self.model.sample(rng, n_samples=n_samples,
                                 conditioned_on=conditioned_on)
