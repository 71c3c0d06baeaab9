"""Autoregressive masks for convolutions and attention.

All masks are built once at module-construction time as constant buffers — unlike
the reference, which multiplies ``weight.data`` in place on every forward
(/root/reference/pytorch_generative/nn/convolution.py:41-43). Here the mask is
folded into the conv weight functionally (``w * mask``) inside the jitted forward,
which XLA constant-folds into a single fused multiply feeding the MXU convolution.
"""

import functools

import jax.numpy as jnp
import numpy as np


def causal_conv_mask(kernel_size, mask_center: bool, dtype=jnp.float32):
    """Raster-scan causal mask for a conv kernel, shape (kh, kw, 1, 1) (HWIO).

    Rows above the center are kept; on the center row, columns strictly left of
    center are kept, plus the center itself when ``mask_center=False`` (type-B).
    Matches /root/reference/pytorch_generative/nn/convolution.py:35-39 (which builds
    the same per-tap pattern in OIHW layout). No channel masking.
    """
    kh, kw = kernel_size
    mask = np.zeros((kh, kw), dtype=np.float32)
    mask[: kh // 2, :] = 1.0
    mask[kh // 2, : kw // 2 + int(not mask_center)] = 1.0
    return jnp.asarray(mask, dtype).reshape(kh, kw, 1, 1)


@functools.lru_cache(maxsize=32)
def causal_attention_mask(size: int, mask_center: bool):
    """Lower-triangular attention mask of shape (size, size), bool.

    ``mask_center=True`` excludes the diagonal (pixel cannot attend to itself),
    mirroring tril(ones, diagonal=-int(mask_center)) at
    /root/reference/pytorch_generative/nn/attention.py:60-63. Row 0 is then fully
    masked; the attention op zeroes that row's output.

    Returns a NumPy array (safe to cache across jit traces; XLA hoists it to a
    compile-time constant at each use site).
    """
    offset = -1 if mask_center else 0
    return np.tri(size, size, offset, dtype=bool)


def made_masks(seed: int, in_dim: int, hidden_dims):
    """Connectivity masks for MADE (one per MaskedLinear) plus the output ordering.

    Byte-for-byte reproduction of the construction at
    /root/reference/pytorch_generative/models/autoregressive/made.py:62-95
    (including its quirks: hidden degrees drawn from randint(low, in_dim - 1) with
    an exclusive upper bound, and `low` read from two layers back): the input
    ordering is a random permutation; hidden layer i draws degrees uniformly in
    [0 if i == 0 else min(conn[i-1]), in_dim - 2]; layer masks are
    ``conn_prev[j] <= conn_cur[k]`` with strict ``<`` for the output layer, whose
    degrees equal the input ordering.

    Returns:
        (masks, ordering): masks[i] has shape (fan_in, fan_out) for layer i,
        matching this framework's (in, out) weight layout.
    """
    rng = np.random.RandomState(seed=seed)
    conn = [rng.permutation(in_dim)]
    for i, dim in enumerate(hidden_dims):
        low = 0 if i == 0 else int(np.min(conn[i - 1]))
        high = in_dim - 1
        conn.append(rng.randint(low, high, size=dim))
    conn.append(np.copy(conn[0]))

    masks = [
        (conn[i - 1][:, None] <= conn[i][None, :]).astype(np.float32)
        for i in range(1, len(conn) - 1)
    ]
    masks.append((conn[-2][:, None] < conn[-1][None, :]).astype(np.float32))
    return [jnp.asarray(m) for m in masks], conn[-1]
