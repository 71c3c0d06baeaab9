"""Dense layers (pytree modules).

Initialization matches torch.nn.Linear defaults so reproduce() likelihoods line up
with the reference (see ops/init.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.ops import init as init_ops


class Linear(core.Module):
    """y = x @ W + b with torch default init. Weight shape (in, out)."""

    weight: jax.Array
    bias: jax.Array | None

    def __init__(self, key, in_features: int, out_features: int, use_bias: bool = True,
                 weight_init=None, bias_init=None):
        wkey, bkey = jax.random.split(key)
        fan_in = max(in_features, 1)
        weight_init = weight_init or init_ops.torch_default_weight
        self.weight = weight_init(wkey, (in_features, out_features), fan_in)
        if use_bias:
            bias_init = bias_init or init_ops.torch_default_bias
            self.bias = bias_init(bkey, (out_features,), fan_in)
        else:
            self.bias = None

    def __call__(self, x):
        y = x @ self.weight
        if self.bias is not None:
            y = y + self.bias
        return y


class MaskedLinear(core.Module):
    """Linear layer whose weight is elementwise-masked for AR connectivity.

    Functional equivalent of the reference's in-place ``weight.data *= mask``
    (/root/reference/pytorch_generative/models/autoregressive/made.py:22-34): the
    mask is a constant buffer multiplied into the weight inside the jitted forward,
    so gradients to masked-out entries are identically zero and the dense matmul
    still runs on the MXU.
    """

    weight: jax.Array
    bias: jax.Array | None
    mask: jax.Array = core.buffer_field()

    def __init__(self, key, in_features: int, out_features: int, mask=None,
                 use_bias: bool = True):
        wkey, bkey = jax.random.split(key)
        fan_in = max(in_features, 1)
        self.weight = init_ops.torch_default_weight(
            wkey, (in_features, out_features), fan_in)
        self.bias = (init_ops.torch_default_bias(bkey, (out_features,), fan_in)
                     if use_bias else None)
        if mask is None:
            mask = jnp.ones((in_features, out_features), jnp.float32)
        self.mask = jnp.asarray(mask, jnp.float32)

    def __call__(self, x, mask=None):
        m = self.mask if mask is None else mask
        y = x @ (self.weight * m)
        if self.bias is not None:
            y = y + self.bias
        return y
