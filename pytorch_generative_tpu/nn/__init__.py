"""Neural-network building blocks (pytree modules, NHWC layout).

Exports the same surface as /root/reference/pytorch_generative/nn/__init__.py:1-13,
plus the dense-layer primitives the TPU build adds.
"""

from pytorch_generative_tpu.nn.attention import (
    CausalAttention,
    LinearCausalAttention,
    image_positional_encoding,
    positional_encoding,
)
from pytorch_generative_tpu.nn.convolution import (
    AvgPool2d,
    CausalConv2d,
    ChannelLayerNorm,
    Conv2d,
    ConvTranspose2d,
    GatedActivation,
    NCHWLayerNorm,
    upsample_nearest_2x,
)
from pytorch_generative_tpu.nn.linear import Linear, MaskedLinear
from pytorch_generative_tpu.nn.moe import SparseMoE
from pytorch_generative_tpu.nn.utils import ReZeroWrapper, VectorQuantizer

__all__ = [
    "CausalAttention",
    "LinearCausalAttention",
    "image_positional_encoding",
    "positional_encoding",
    "AvgPool2d",
    "CausalConv2d",
    "ChannelLayerNorm",
    "Conv2d",
    "ConvTranspose2d",
    "GatedActivation",
    "NCHWLayerNorm",
    "upsample_nearest_2x",
    "Linear",
    "MaskedLinear",
    "SparseMoE",
    "ReZeroWrapper",
    "VectorQuantizer",
]
