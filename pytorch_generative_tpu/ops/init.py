"""Parameter initializers matching PyTorch defaults.

Likelihood parity with the reference (see BASELINE.md) depends on matching its
initialization distributions: torch.nn.Linear/Conv2d default to
``kaiming_uniform_(weight, a=sqrt(5))`` with a fan-in uniform bias, and a few
reference modules call ``kaiming_normal_`` / ``kaiming_uniform_`` explicitly
(e.g. /root/reference/pytorch_generative/models/autoregressive/nade.py:33-40,
/root/reference/pytorch_generative/nn/utils.py:43-45).
"""

import math

import jax
import jax.numpy as jnp


def calculate_gain(nonlinearity: str, param=None) -> float:
    """Mirrors torch.nn.init.calculate_gain."""
    if nonlinearity in ("linear", "identity", "sigmoid", "conv2d"):
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3.0
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        negative_slope = 0.01 if param is None else param
        return math.sqrt(2.0 / (1.0 + negative_slope**2))
    if nonlinearity == "selu":
        return 3.0 / 4.0
    raise ValueError(f"Unsupported nonlinearity {nonlinearity}")


def kaiming_uniform(key, shape, fan_in, a=0.0, nonlinearity="leaky_relu",
                    dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ (fan_in mode)."""
    gain = calculate_gain(nonlinearity, a)
    std = gain / math.sqrt(fan_in)
    bound = math.sqrt(3.0) * std
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_normal(key, shape, fan_in, a=0.0, nonlinearity="leaky_relu",
                   dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_ (fan_in mode)."""
    gain = calculate_gain(nonlinearity, a)
    std = gain / math.sqrt(fan_in)
    return std * jax.random.normal(key, shape, dtype)


def torch_default_weight(key, shape, fan_in, dtype=jnp.float32):
    """The torch.nn.Linear/Conv2d default: kaiming_uniform with a=sqrt(5).

    Equivalent to U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    """
    return kaiming_uniform(key, shape, fan_in, a=math.sqrt(5), dtype=dtype)


def torch_default_bias(key, shape, fan_in, dtype=jnp.float32):
    """The torch.nn.Linear/Conv2d default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)
