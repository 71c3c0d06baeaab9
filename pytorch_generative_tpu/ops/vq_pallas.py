"""Fused vector-quantization Pallas kernel.

One pass over the inputs produces everything the VQ-VAE forward needs:
nearest-codebook assignment (distance matmul + argmax on the MXU/VPU),
the quantized vectors (one-hot @ codebook, MXU), and the EMA batch statistics
(cluster counts and per-cluster input sums) — without ever materializing the
(M, n_embeddings) score matrix or the (M, n_embeddings) one-hot matrix in HBM.
Replaces the three separate ops the reference runs
(/root/reference/pytorch_generative/nn/utils.py:62-90).

Grid cells iterate over M-tiles; the stats outputs map every cell to the same
block and accumulate across the (sequential, on TPU) grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 512


def _vq_kernel(x_ref, cb_ref, q_ref, counts_ref, sums_ref, *, block_m,
               n_valid):
    mi = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)          # (block_m, D)
    cb = cb_ref[:].astype(jnp.float32)        # (K, D)
    k = cb.shape[0]

    # argmin ||x - e||^2 == argmax (2 x.e - ||e||^2); ||x||^2 is row-constant.
    scores = 2.0 * jax.lax.dot_general(
        x, cb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    scores = scores - jnp.sum(cb * cb, axis=1)[None, :]
    idx = jnp.argmax(scores, axis=1)          # (block_m,)

    # Rows beyond the true M (padding) must not contribute to anything.
    row_ids = mi * block_m + jax.lax.broadcasted_iota(
        jnp.int32, (block_m, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_m, k), 1)
    one_hot = jnp.where(
        (col_ids == idx[:, None]) & (row_ids < n_valid), 1.0, 0.0)

    q_ref[:] = jax.lax.dot_general(
        one_hot, cb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(q_ref.dtype)

    counts = jnp.sum(one_hot, axis=0)                       # (K,)
    counts_tile = jnp.broadcast_to(counts[None, :], (8, k))
    sums = jax.lax.dot_general(                              # (K, D)
        one_hot, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(mi == 0)
    def _init():
        counts_ref[:] = counts_tile
        sums_ref[:] = sums

    @pl.when(mi > 0)
    def _accumulate():
        counts_ref[:] = counts_ref[:] + counts_tile
        sums_ref[:] = sums_ref[:] + sums


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def vq_quantize_fused(flat_x, codebook, block_m: int = BLOCK_M,
                      interpret: bool = False):
    """Fused nearest-codebook quantization + batch statistics.

    Args:
        flat_x: (M, D) inputs.
        codebook: (K, D) embeddings.
    Returns:
        (quantized (M, D), counts (K,), sums (K, D)): counts/sums are exactly
        the EMA batch statistics one_hot.sum(0) and one_hot.T @ flat_x.
    """
    m, d = flat_x.shape
    k = codebook.shape[0]
    block_m = min(block_m, max(8, 1 << (max(m - 1, 1)).bit_length()))
    m_pad = -(-m // block_m) * block_m
    if m_pad != m:
        flat_x = jnp.pad(flat_x, ((0, m_pad - m), (0, 0)))

    kernel = functools.partial(_vq_kernel, block_m=block_m, n_valid=m)
    quantized, counts, sums = pl.pallas_call(
        kernel,
        grid=(m_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, d), flat_x.dtype),
            jax.ShapeDtypeStruct((8, k), jnp.float32),
            jax.ShapeDtypeStruct((k, d), jnp.float32),
        ),
        interpret=interpret,
    )(flat_x, codebook)
    return quantized[:m], counts[0], sums
