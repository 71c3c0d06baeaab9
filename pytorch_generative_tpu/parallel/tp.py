"""Tensor parallelism via GSPMD sharding annotations over a 2-D mesh.

The recipe: build a Mesh with ('data', 'model') axes, annotate parameter
leaves with PartitionSpecs (rules matched on the pytree path), shard the batch
over 'data', and jit the unmodified train step — XLA GSPMD partitions the
computation and inserts the ICI collectives (all-gather / reduce-scatter /
psum) automatically. No NCCL, no manual communication.

The reference has no TP at all (SURVEY.md section 2.8); this module adds it the
TPU-native way. The default ImageGPT rules shard the transformer MLP
Megatron-style: conv1's output (hidden) dimension and conv2's input dimension
live on 'model', so the GELU runs fully sharded and conv2 produces a partial
sum that GSPMD reduces over ICI.
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"


def make_2d_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """A ('data', 'model') mesh over the first n_data*n_model devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(f"Requested {n} devices, have {len(devices)}.")
    return Mesh(np.asarray(devices[:n]).reshape(n_data, n_model),
                ("data", MODEL_AXIS))


# (path regex, PartitionSpec) — first match wins; default replicated.
# Conv2d weights are HWIO: dim 2 = in channels, dim 3 = out channels.
IMAGE_GPT_TP_RULES = (
    # Megatron MLP: hidden dim sharded; conv2 input sharded -> partial sums
    # reduced by GSPMD.
    (r"mlp_conv1\.weight", P(None, None, None, MODEL_AXIS)),
    (r"mlp_conv1\.bias", P(MODEL_AXIS)),
    (r"mlp_conv2\.weight", P(None, None, MODEL_AXIS, None)),
)

# PixelSNAIL: each ResidualBlock is input_conv (c->c) -> elu -> output_conv
# (c->2c) -> gate; the elementwise elu makes (input_conv out, output_conv in)
# a Megatron pair — the block's inner channels live on 'model' and GSPMD
# reduces output_conv's partial sums over ICI. The attention channels
# (key 4 / value 32 in reproduce()) are too small to be worth sharding.
PIXEL_SNAIL_TP_RULES = (
    (r"residual_blocks\[\d+\]\.input_conv\.weight",
     P(None, None, None, MODEL_AXIS)),
    (r"residual_blocks\[\d+\]\.input_conv\.bias", P(MODEL_AXIS)),
    (r"residual_blocks\[\d+\]\.output_conv\.weight",
     P(None, None, MODEL_AXIS, None)),
)

# VD-VAE: every BottleneckBlock is conv1 (1x1 c->b) -> gelu -> conv2 (3x3) ->
# gelu -> conv3 (3x3) -> gelu -> conv4 (1x1 b->c); sharding the bottleneck
# width as two Megatron pairs (conv1/conv2 and conv3/conv4) keeps all GELUs
# fully sharded and reduces each pair's partial sums once.
# Anchored on the BottleneckBlock contexts (encoder residuals, decoder
# prior/posterior/out) so a future field merely *ending* in conv1..conv4
# (cf. PixelSNAIL's output_conv1) can never silently pick up these specs.
_VD_VAE_BLOCK = r"(residuals\[\d+\]|prior|posterior|out)\."
VD_VAE_TP_RULES = (
    (_VD_VAE_BLOCK + r"conv1\.weight", P(None, None, None, MODEL_AXIS)),
    (_VD_VAE_BLOCK + r"conv1\.bias", P(MODEL_AXIS)),
    (_VD_VAE_BLOCK + r"conv2\.weight", P(None, None, MODEL_AXIS, None)),
    (_VD_VAE_BLOCK + r"conv3\.weight", P(None, None, None, MODEL_AXIS)),
    (_VD_VAE_BLOCK + r"conv3\.bias", P(MODEL_AXIS)),
    (_VD_VAE_BLOCK + r"conv4\.weight", P(None, None, MODEL_AXIS, None)),
)

TP_RULES_BY_MODEL = {
    "image_gpt": IMAGE_GPT_TP_RULES,
    "pixel_snail": PIXEL_SNAIL_TP_RULES,
    "vd_vae": VD_VAE_TP_RULES,
}


def tree_shardings(tree, mesh: Mesh, rules=IMAGE_GPT_TP_RULES):
    """A sharding pytree for `tree`: rule-matched leaves get their spec,
    everything else is replicated."""
    compiled = [(re.compile(pattern), spec) for pattern, spec in rules]

    def spec_for(path, leaf):
        if leaf is None or not hasattr(leaf, "ndim"):
            return NamedSharding(mesh, P())
        path_str = jax.tree_util.keystr(path)
        for pattern, spec in compiled:
            if pattern.search(path_str):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, tree,
                                            is_leaf=lambda x: x is None)


def shard_tree(tree, mesh: Mesh, rules=IMAGE_GPT_TP_RULES):
    """Places `tree` on the mesh according to the rules."""
    shardings = tree_shardings(tree, mesh, rules)
    return jax.tree_util.tree_map(
        lambda x, s: x if x is None else jax.device_put(x, s), tree, shardings,
        is_leaf=lambda x: x is None)


def shard_batch_2d(batch, mesh: Mesh):
    """Shards the leading axis over 'data' (replicated over 'model')."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))
