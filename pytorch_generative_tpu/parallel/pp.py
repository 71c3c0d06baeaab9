"""Pipeline parallelism (GPipe-style) for homogeneous transformer stacks.

The TPU-native construction: stack the per-block parameters of a homogeneous
transformer into one pytree with a leading block axis, shard that axis over a
'stage' mesh axis (each device holds only its blocks' weights), and run the
classic GPipe schedule inside shard_map — at tick t, stage s processes
microbatch (t - s), then the activation rotates to stage s+1 over the ICI ring
via ``ppermute``. Bubble fraction is (S - 1) / (S - 1 + M) for S stages and M
microbatches. jax.grad differentiates straight through the schedule (ppermute
is linear), so the same construction trains.

The reference has no pipeline parallelism (SURVEY.md section 2.8); together
with parallel/mesh.py (dp), parallel/tp.py (tp), and
parallel/ring_attention.py (sp) this completes the parallelism portfolio.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_blocks(blocks):
    """Stacks a tuple of identically-structured Modules along a new leading
    axis (one pytree whose array leaves have shape (n_blocks, ...))."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_apply(stacked_blocks, block_fn, x_micro, mesh: Mesh,
                   axis_name: str = "stage"):
    """Runs microbatches through stage-sharded blocks with a GPipe schedule.

    Args:
        stacked_blocks: Block parameters stacked on a leading axis of size
            n_blocks; n_blocks must equal the 'stage' mesh axis size (one block
            per stage; group blocks before stacking for multi-block stages).
        block_fn: fn(block, x) -> x applying one stage's block.
        x_micro: (n_micro, micro_batch, ...) microbatched activations (the
            model-level pre-block embedding).
        mesh: Mesh with ``axis_name``.
    Returns:
        (n_micro, micro_batch, ...) outputs after all stages.
    """
    n_stages = mesh.shape[axis_name]
    n_micro = x_micro.shape[0]
    n_ticks = n_micro + n_stages - 1

    def shard_fn(blocks_local, x_all):
        # blocks_local: this stage's block (leading axis 1); x_all: all
        # microbatches (replicated). Stage 0 feeds the pipe; others receive.
        stage = jax.lax.axis_index(axis_name)
        block = jax.tree_util.tree_map(lambda a: a[0], blocks_local)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        carry = jnp.zeros_like(x_all[0])
        outputs = jnp.zeros_like(x_all)
        for t in range(n_ticks):
            # Stage 0 ingests microbatch t (if any) instead of the ring input.
            feed_idx = min(t, n_micro - 1)
            x_in = jnp.where(stage == 0, x_all[feed_idx], carry)
            y = block_fn(block, x_in)
            # Last stage emits microbatch (t - n_stages + 1).
            out_idx = t - (n_stages - 1)
            if out_idx >= 0:
                emit = jnp.where(stage == n_stages - 1, y,
                                 jnp.zeros_like(y))
                outputs = outputs.at[out_idx].add(emit)
            carry = jax.lax.ppermute(y, axis_name, perm)
        # Each microbatch's output lives only on the last stage; sum-reduce to
        # replicate it everywhere (all other stages contributed zeros).
        return jax.lax.psum(outputs, axis_name)

    blocks_spec = jax.tree_util.tree_map(lambda _: P(axis_name),
                                         stacked_blocks)
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(blocks_spec, P()), out_specs=P(), check_vma=False)
    return fn(stacked_blocks, x_micro)


def image_gpt_pipeline_forward(model, x, mesh: Mesh, n_micro: int,
                               axis_name: str = "stage"):
    """ImageGPT forward with the transformer blocks pipeline-sharded.

    The (cheap) input conv and output head run replicated; the per-block work —
    including the model's extra skip x + block(x) (image_gpt.py:105-109) —
    pipelines across stages.
    """
    n_stages = mesh.shape[axis_name]
    assert len(model.blocks) % n_stages == 0
    per_stage = len(model.blocks) // n_stages
    groups = [model.blocks[i * per_stage: (i + 1) * per_stage]
              for i in range(n_stages)]
    stacked = stack_blocks([stack_blocks(g) for g in groups])

    def group_fn(group, h):
        def one(i, h):
            block = jax.tree_util.tree_map(lambda a: a[i], group)
            return h + block(h)
        return jax.lax.fori_loop(0, per_stage, one, h) if per_stage > 1 \
            else one(0, h)

    n = x.shape[0]
    assert n % n_micro == 0
    h = model.input_conv(x + model.pos)
    h_micro = h.reshape(n_micro, n // n_micro, *h.shape[1:])
    out = pipeline_apply(stacked, group_fn, h_micro, mesh, axis_name)
    out = out.reshape(n, *h.shape[1:])
    return model.out_conv(model.ln(out))
