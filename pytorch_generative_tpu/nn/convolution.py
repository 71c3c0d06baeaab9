"""Convolutional building blocks (NHWC, TPU-native layout).

The whole framework runs NHWC with HWIO kernels — the layout XLA:TPU tiles best
onto the MXU — instead of the reference's CUDA-idiomatic NCHW. The public surface
mirrors /root/reference/pytorch_generative/nn/convolution.py.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core
from pytorch_generative_tpu.ops import init as init_ops
from pytorch_generative_tpu.ops.masks import causal_conv_mask


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _use_fused_ln(x, fused):
    """Route LayerNorm through the Pallas kernel (ops/ln_pallas.py).

    Off unless the layer was constructed with fused=True (models opt in
    where it's measured to win — see ChannelLayerNorm docstring); PGT_FUSED_LN
    forces it ("1" on / "0" off) for experiments. Only worth a kernel launch
    on TPU with enough rows (per-pixel decode slices stay on the jnp path)."""
    import os

    env = os.environ.get("PGT_FUSED_LN")
    want = fused if env is None else env == "1"
    rows = x.size // x.shape[-1] if x.shape[-1] else 0
    return (want and jax.default_backend() == "tpu"
            and rows >= 1024 and x.shape[-1] >= 8)


class Conv2d(core.Module):
    """2-D convolution over NHWC inputs with HWIO weights, torch default init."""

    weight: jax.Array
    bias: jax.Array | None
    stride: Any = core.static_field()
    padding: Any = core.static_field()
    dilation: Any = core.static_field()

    def __init__(self, key, in_channels: int, out_channels: int, kernel_size,
                 stride=1, padding=0, dilation=1, use_bias: bool = True,
                 weight_init=None, bias_init=None):
        kh, kw = _pair(kernel_size)
        wkey, bkey = jax.random.split(key)
        fan_in = in_channels * kh * kw
        weight_init = weight_init or init_ops.torch_default_weight
        self.weight = weight_init(wkey, (kh, kw, in_channels, out_channels), fan_in)
        if use_bias:
            bias_init = bias_init or init_ops.torch_default_bias
            self.bias = bias_init(bkey, (out_channels,), fan_in)
        else:
            self.bias = None
        self.stride = _pair(stride)
        self.dilation = _pair(dilation)
        if isinstance(padding, str):
            self.padding = padding
        else:
            ph, pw = _pair(padding)
            self.padding = ((ph, ph), (pw, pw))

    def _conv(self, x, weight):
        # 1x1 convs lower to a plain feature-dim matmul: XLA's convolution
        # layout assignment otherwise interleaves layout-conversion copies
        # between channel-mixing layers (measured on v5e: the copies around
        # pointwise convs cost more than the matmuls themselves).
        if (weight.shape[0] == 1 and weight.shape[1] == 1
                and self.stride == (1, 1) and self.dilation == (1, 1)
                and self.padding in (((0, 0), (0, 0)), "VALID", "SAME")):
            return jax.lax.dot_general(
                x, weight[0, 0], (((x.ndim - 1,), (0,)), ((), ())))
        return jax.lax.conv_general_dilated(
            x, weight, window_strides=self.stride, padding=self.padding,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def __call__(self, x):
        y = self._conv(x, self.weight)
        if self.bias is not None:
            y = y + self.bias
        return y


class ConvTranspose2d(core.Module):
    """2-D transposed convolution (NHWC), matching torch.nn.ConvTranspose2d.

    Implemented as ``lax.conv_general_dilated`` with lhs (input) dilation — the
    gradient-of-conv formulation XLA lowers natively to the MXU. Output spatial
    size is ``(in - 1) * stride - 2 * padding + kernel``.
    """

    weight: jax.Array
    bias: jax.Array | None
    stride: Any = core.static_field()
    padding: Any = core.static_field()

    def __init__(self, key, in_channels: int, out_channels: int, kernel_size,
                 stride=1, padding=0, use_bias: bool = True):
        kh, kw = _pair(kernel_size)
        wkey, bkey = jax.random.split(key)
        # torch's ConvTranspose2d weight is (in, out, kh, kw) with fan_in computed
        # from out_channels * kernel area.
        fan_in = out_channels * kh * kw
        self.weight = init_ops.torch_default_weight(
            wkey, (kh, kw, out_channels, in_channels), fan_in)
        self.bias = (init_ops.torch_default_bias(bkey, (out_channels,), fan_in)
                     if use_bias else None)
        self.stride = _pair(stride)
        self.padding = _pair(padding)

    def __call__(self, x):
        kh, kw = self.weight.shape[:2]
        sh, sw = self.stride
        ph, pw = self.padding
        # Transposed conv = dilate input by stride, pad by (k - 1 - p), then run a
        # convolution with the spatially-flipped kernel and in/out swapped to HWIO.
        weight = jnp.swapaxes(jnp.flip(self.weight, axis=(0, 1)), 2, 3)
        y = jax.lax.conv_general_dilated(
            x, weight,
            window_strides=(1, 1),
            padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.bias is not None:
            y = y + self.bias
        return y


class CausalConv2d(Conv2d):
    """Conv2d masked to respect the raster-scan autoregressive property.

    ``mask_center=True`` (type-A) also masks the current pixel. The mask is a
    constant buffer applied as ``conv(x, w * mask)`` inside jit — functionally
    identical to the reference's in-place masking
    (/root/reference/pytorch_generative/nn/convolution.py:12-43) but pure, and XLA
    fuses the multiply into the convolution's operand. No channel masking.
    """

    mask: jax.Array = core.buffer_field()

    def __init__(self, key, mask_center: bool, in_channels: int, out_channels: int,
                 kernel_size, stride=1, padding=0, dilation=1, use_bias: bool = True):
        super().__init__(key, in_channels, out_channels, kernel_size, stride=stride,
                         padding=padding, dilation=dilation, use_bias=use_bias)
        self.mask = causal_conv_mask(_pair(kernel_size), mask_center,
                                     self.weight.dtype)

    def __call__(self, x):
        y = self._conv(x, self.weight * self.mask)
        if self.bias is not None:
            y = y + self.bias
        return y


class GatedActivation(core.Module):
    """activation_fn(top half of channels) * sigmoid(bottom half).

    Channel-last split; mirrors
    /root/reference/pytorch_generative/nn/convolution.py:46-66.
    """

    activation_fn: Callable = core.static_field()

    def __init__(self, activation_fn=jnp.tanh):
        self.activation_fn = activation_fn

    def __call__(self, x):
        c = x.shape[-1]
        assert c % 2 == 0, "x must have an even number of channels."
        top, gate = x[..., : c // 2], x[..., c // 2:]
        return self.activation_fn(top) * jax.nn.sigmoid(gate)


class ChannelLayerNorm(core.Module):
    """LayerNorm over the channel (last) axis of NHWC tensors.

    In the TPU-native NHWC layout this needs no permutes — the reference's
    NCHWLayerNorm (/root/reference/pytorch_generative/nn/convolution.py:69-75)
    permutes NCHW->NHWC and back around a torch LayerNorm.

    ``fused=True`` routes TPU execution through the single-pass Pallas kernel
    (ops/ln_pallas.py). Not a default: a standalone LN kernel is an XLA fusion
    barrier, so it only wins when its neighbors are already custom calls —
    measured on v5e ImageGPT bf16 bs64: C=512 alongside the fused MLP kernel
    675->698 samples/s (H=4) / 562->578 (H=8), but *alone* 675->629, and at
    C=64 (half-empty lanes) 3301->2600. Models set it where it wins.
    """

    scale: jax.Array
    offset: jax.Array
    eps: float = core.static_field()
    fused: bool = core.static_field()

    def __init__(self, n_channels: int, eps: float = 1e-5,
                 fused: bool = False):
        self.scale = jnp.ones((n_channels,), jnp.float32)
        self.offset = jnp.zeros((n_channels,), jnp.float32)
        self.eps = eps
        self.fused = fused

    def __call__(self, x):
        if _use_fused_ln(x, self.fused):
            from pytorch_generative_tpu.ops.ln_pallas import channel_layernorm

            return channel_layernorm(x, self.scale, self.offset, self.eps)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * self.scale + self.offset


# API-parity alias: the reference exports this block as NCHWLayerNorm.
NCHWLayerNorm = ChannelLayerNorm


class AvgPool2d(core.Module):
    """Average pooling (NHWC)."""

    kernel_size: Any = core.static_field()
    stride: Any = core.static_field()

    def __init__(self, kernel_size, stride=None):
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride) if stride is not None else self.kernel_size

    def __call__(self, x):
        kh, kw = self.kernel_size
        y = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, kh, kw, 1), (1, *self.stride, 1), "VALID")
        return y / (kh * kw)


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x spatial upsampling (NHWC)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)
