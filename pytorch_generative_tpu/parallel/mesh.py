"""Data parallelism over a TPU device mesh (shard_map + ICI collectives).

This replaces the reference's NCCL/DDP path
(/root/reference/train.py:27-43, /root/reference/pytorch_generative/trainer.py:75-82)
with the single-controller JAX model: one process drives a
``jax.sharding.Mesh`` of chips, the train step is ``shard_map``-ped with the batch
sharded over the ``data`` axis, and gradients are ``psum``-ed over ICI. VQ-EMA
batch statistics are also psum'd (see nn/utils.py), fixing the reference's
unsynchronized-buffer defect under DDP.

Multi-host extends this transparently via ``jax.distributed.initialize`` — the
mesh then spans hosts over DCN with no code changes here.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over the first n_devices devices.

    Under ``jax.distributed`` (multi-host) ``jax.devices()`` is the GLOBAL
    device list, so the same call builds a DCN-spanning mesh — each host's
    controller runs the identical program over its addressable slice.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"Requested {n_devices} devices, have {len(devices)}.")
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


def _put(tree, sharding):
    """device_put that also works on multi-host (non-fully-addressable)
    shardings: every process holds the same host value (identical loaders /
    identical init on all hosts — the SPMD contract), and each materializes
    only its addressable shards."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def to_global(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(to_global, tree)


def replicate(tree, mesh: Mesh):
    """Places every array of `tree` fully replicated on the mesh."""
    return _put(tree, NamedSharding(mesh, P()))


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Shards the leading (batch) axis of `batch` across the mesh."""
    return _put(batch, NamedSharding(mesh, P(axis_name)))


def pmean_tree(tree, axis_name: str = DATA_AXIS):
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, axis_name) if x is not None else None,
        tree, is_leaf=lambda x: x is None)


def psum_tree(tree, axis_name: str = DATA_AXIS):
    return jax.tree_util.tree_map(
        lambda x: jax.lax.psum(x, axis_name) if x is not None else None,
        tree, is_leaf=lambda x: x is None)


def set_vq_axis_name(module, axis_name: str | None):
    """Recursively sets ``axis_name`` on every VectorQuantizer in a module tree.

    Called by the Trainer when data parallelism is enabled so the quantizers psum
    their EMA batch statistics over the mesh axis.
    """
    from pytorch_generative_tpu import core
    from pytorch_generative_tpu.nn.utils import VectorQuantizer

    def rewrite(value):
        if isinstance(value, VectorQuantizer):
            return value.replace(axis_name=axis_name)
        if isinstance(value, core.Module):
            updates = {}
            for name in type(value)._child_fields:
                new = rewrite(getattr(value, name))
                if new is not getattr(value, name):
                    updates[name] = new
            return value.replace(**updates) if updates else value
        if isinstance(value, (list, tuple)):
            return type(value)(rewrite(v) for v in value)
        if isinstance(value, dict):
            return {k: rewrite(v) for k, v in value.items()}
        return value

    return rewrite(module)
