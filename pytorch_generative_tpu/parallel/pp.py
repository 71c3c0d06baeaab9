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
                   axis_name: str = "stage", extras_micro=None):
    """Runs microbatches through stage-sharded blocks with a GPipe schedule.

    Args:
        stacked_blocks: Block parameters stacked on a leading axis of size
            n_blocks; n_blocks must equal the 'stage' mesh axis size (one block
            per stage; group blocks before stacking for multi-block stages).
        block_fn: fn(block, x) -> x applying one stage's block — or
            fn(block, x, extras) -> x when ``extras_micro`` is given.
        x_micro: (n_micro, micro_batch, ...) microbatched activations (the
            model-level pre-block embedding).
        mesh: Mesh with ``axis_name``.
        extras_micro: Optional pytree of per-microbatch side inputs with
            leading axis n_micro (e.g. PixelSNAIL's raw image conditioning);
            sharded like ``x_micro`` and fed/rotated alongside the
            activations, so stage s always attends over the extras belonging
            to the microbatch it is processing.
    Returns:
        (n_micro, micro_batch, ...) outputs after all stages (a global array
        sharded on ``axis_name`` over the microbatch axis).

    Memory profile: both the *weights* (each stage holds only its block) and
    the *activations* are partitioned — the microbatch axis of the inputs and
    outputs is sharded over ``axis_name`` (requiring n_micro % n_stages == 0),
    each stage's live working set is one microbatch (plus its 1/n_stages input
    and output shards), and microbatches move exclusively over the ICI ring:
    the owning stage feeds microbatch t to stage 0 at tick t, activations
    rotate stage-to-stage via ``ppermute``, and the last stage sends each
    finished microbatch back to its owner. Per-device activation residency is
    O(batch / n_stages), not O(batch).
    """
    n_stages = mesh.shape[axis_name]
    n_micro = x_micro.shape[0]
    lead_sizes = {a.shape[0] for a in jax.tree_util.tree_leaves(stacked_blocks)
                  if hasattr(a, "shape") and a.ndim}
    assert lead_sizes == {n_stages}, (
        f"stacked_blocks' leading axis must equal the {axis_name!r} mesh axis "
        f"size ({n_stages}); got {sorted(lead_sizes)}. Group blocks with "
        f"group_and_stack (or use pipeline_forward) for multi-block stages — "
        f"a larger leading axis would silently run only the first block per "
        f"stage.")
    assert n_micro % n_stages == 0, (
        f"n_micro ({n_micro}) must be a multiple of the {axis_name!r} mesh "
        f"axis size ({n_stages}) so the microbatch axis shards evenly across "
        f"stages (use n_micro >= n_stages anyway: the GPipe bubble fraction "
        f"is (S-1)/(S-1+M)).")
    m_per = n_micro // n_stages  # microbatches owned per stage
    n_ticks = n_micro + n_stages - 1
    has_extras = extras_micro is not None
    if not has_extras:
        extras_micro = ()  # empty pytree: no dead operand through shard_map
    tree_map = jax.tree_util.tree_map

    def shard_fn(blocks_local, x_local, extras_local):
        # blocks_local: this stage's block (leading axis 1); x_local /
        # extras_local: the m_per microbatches this stage owns (contiguous
        # shard of the microbatch axis: stage owns micros [stage*m_per, ...)).
        stage = jax.lax.axis_index(axis_name)
        block = tree_map(lambda a: a[0], blocks_local)
        ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        carry = jnp.zeros_like(x_local[0])
        ex_carry = tree_map(lambda e: jnp.zeros_like(e[0]), extras_local)
        out_local = jnp.zeros_like(x_local)
        for t in range(n_ticks):
            ex_in = ex_carry
            if t < n_micro:
                # The owner of microbatch t sends it to stage 0 (one
                # micro-sized ICI hop; every other device receives zeros and
                # keeps its ring carry instead).
                owner, slot = divmod(t, m_per)
                feed = jax.lax.ppermute(x_local[slot], axis_name,
                                        [(owner, 0)])
                x_in = jnp.where(stage == 0, feed, carry)
                if has_extras:
                    ex_feed = tree_map(
                        lambda e: jax.lax.ppermute(e[slot], axis_name,
                                                   [(owner, 0)]),
                        extras_local)
                    ex_in = tree_map(
                        lambda f, c: jnp.where(stage == 0, f, c),
                        ex_feed, ex_carry)
            else:
                x_in = carry  # drain phase: nothing new enters the pipe
            y = (block_fn(block, x_in, ex_in) if has_extras
                 else block_fn(block, x_in))
            # The last stage finishes microbatch (t - n_stages + 1); send it
            # straight back to its owning stage's output shard.
            out_idx = t - (n_stages - 1)
            if out_idx >= 0:
                owner_out, slot_out = divmod(out_idx, m_per)
                emit = jax.lax.ppermute(y, axis_name,
                                        [(n_stages - 1, owner_out)])
                out_local = out_local.at[slot_out].set(
                    jnp.where(stage == owner_out, emit,
                              out_local[slot_out]))
            if t < n_ticks - 1:
                carry = jax.lax.ppermute(y, axis_name, ring)
                if has_extras:
                    ex_carry = tree_map(
                        lambda e: jax.lax.ppermute(e, axis_name, ring), ex_in)
        return out_local

    blocks_spec = tree_map(lambda _: P(axis_name), stacked_blocks)
    extras_spec = tree_map(lambda _: P(axis_name), extras_micro)
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(blocks_spec, P(axis_name), extras_spec),
        out_specs=P(axis_name),
        check_vma=False)
    return fn(stacked_blocks, x_micro, extras_micro)


def group_and_stack(blocks, n_stages: int):
    """Groups a homogeneous block tuple into n_stages equal stacked groups
    (leading axes: (n_stages, per_stage, ...))."""
    assert len(blocks) % n_stages == 0, (
        f"{len(blocks)} blocks not divisible into {n_stages} stages")
    per_stage = len(blocks) // n_stages
    groups = [blocks[i * per_stage: (i + 1) * per_stage]
              for i in range(n_stages)]
    return stack_blocks([stack_blocks(g) for g in groups]), per_stage


def pipeline_forward(blocks, apply_block, x, mesh: Mesh, n_micro: int,
                     axis_name: str = "stage", extras=None):
    """Generic GPipe forward over any homogeneous residual block stack.

    Args:
        blocks: Tuple of identically-structured block Modules.
        apply_block: fn(block, h) -> h — or fn(block, h, extras) -> h — the
            per-block computation (include residual/skip arithmetic here).
        x: (N, ...) pre-block activations.
        mesh: Mesh with ``axis_name`` (n_stages = its size; must divide
            len(blocks) — consecutive blocks are grouped per stage).
        n_micro: Number of microbatches (must divide N).
        extras: Optional pytree of (N, ...) side inputs passed to every block
            (microbatched alongside x).
    Returns:
        (N, ...) activations after all blocks.
    """
    n_stages = mesh.shape[axis_name]
    stacked, per_stage = group_and_stack(blocks, n_stages)
    has_extras = extras is not None

    def group_fn(group, h, *extra_args):
        def one(i, h):
            block = jax.tree_util.tree_map(lambda a: a[i], group)
            return apply_block(block, h, *extra_args)
        return jax.lax.fori_loop(0, per_stage, one, h) if per_stage > 1 \
            else one(0, h)

    n = x.shape[0]
    assert n % n_micro == 0, f"batch {n} not divisible into {n_micro} micros"
    micro = lambda a: a.reshape(n_micro, n // n_micro, *a.shape[1:])
    extras_micro = (jax.tree_util.tree_map(micro, extras)
                    if has_extras else None)
    out = pipeline_apply(stacked, group_fn, micro(x), mesh, axis_name,
                         extras_micro=extras_micro)
    return out.reshape(n, *x.shape[1:])


def image_gpt_pipeline_forward(model, x, mesh: Mesh, n_micro: int,
                               axis_name: str = "stage"):
    """ImageGPT forward with the transformer blocks pipeline-sharded.

    The (cheap) input conv and output head run replicated; the per-block work —
    including the model's extra skip x + block(x) (image_gpt.py:105-109) —
    pipelines across stages.
    """
    h = model.input_conv(x + model.pos)
    out = pipeline_forward(model.blocks, lambda block, h: h + block(h), h,
                           mesh, n_micro, axis_name)
    return model.out_conv(model.ln(out))


def pixel_snail_pipeline_forward(model, x, mesh: Mesh, n_micro: int,
                                 axis_name: str = "stage"):
    """PixelSNAIL forward with its blocks pipeline-sharded.

    Each PixelSNAILBlock also consumes the raw input image (attention extra-kv
    conditioning, pixel_snail.py:118-123); it rides the ring as a per-
    microbatch extra so every stage attends over the image belonging to the
    microbatch it is processing.
    """
    h = model.input_conv(x)
    out = pipeline_forward(
        model.pixel_snail_blocks,
        lambda block, h, img: h + block(h, img), h, mesh, n_micro, axis_name,
        extras=x)
    return model.output_conv2(model.output_conv1(out))
