"""Fully-sharded data parallelism (ZeRO-3) via GSPMD sharding annotations.

The reference's only distribution mode keeps a full replica of the model and
optimizer state on every rank (DDP, /root/reference/train.py:27-43). This
module shards parameters, gradients, AND optimizer state over the 'data' mesh
axis, so per-device state memory shrinks ~linearly with the mesh — the
TPU-native ZeRO-3: no parameter-flattening hooks, no bucketing engine, no
manual all-gathers. Each leaf gets a PartitionSpec that splits its largest
divisible axis across 'data'; the train step itself is jitted UNMODIFIED with
those shardings on its state arguments, and XLA GSPMD inserts the ICI
collectives (all-gather parameters right before use, reduce-scatter gradients
right after the backward) automatically, overlapping them with compute.

Composable with tensor parallelism: on a ('data', 'model') mesh, pass
``tp_rules`` and leaves matching a TP rule keep their TP spec while FSDP
shards one of the remaining (None) dimensions over 'data' — the standard
2-D "FSDP + TP" layout.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_generative_tpu.parallel.mesh import DATA_AXIS

# Below this many elements a leaf is replicated: all-gathering tiny arrays
# costs more in latency than the memory it saves.
DEFAULT_MIN_SIZE = 2 ** 11


def fsdp_spec(shape, n_shards: int, axis_name: str = DATA_AXIS,
              min_size: int = DEFAULT_MIN_SIZE, taken=()):
    """The FSDP PartitionSpec for one array shape: shard the largest axis that
    divides evenly by ``n_shards``; replicate if none does or the array is
    small.

    Args:
        shape: Array shape tuple.
        taken: Axis indices already owned by another mesh axis (TP); FSDP
            only considers the remaining dimensions.
    Returns:
        A PartitionSpec with ``axis_name`` on at most one dimension.
    """
    size = 1
    for d in shape:
        size *= d
    if not shape or size < min_size:
        return P()
    candidates = sorted(
        (d for d in range(len(shape)) if d not in taken),
        key=lambda d: shape[d], reverse=True)
    for d in candidates:
        if shape[d] % n_shards == 0 and shape[d] >= n_shards:
            spec = [None] * len(shape)
            spec[d] = axis_name
            return P(*spec)
    return P()


def fsdp_shardings(tree, mesh: Mesh, axis_name: str = DATA_AXIS,
                   min_size: int = DEFAULT_MIN_SIZE, tp_rules=()):
    """A sharding pytree for ``tree`` under FSDP (+ optional TP).

    Every array leaf gets :func:`fsdp_spec` on ``axis_name``. When
    ``tp_rules`` (tp.py-style ``(path_regex, PartitionSpec)`` pairs) are
    given, a leaf matching a rule keeps the rule's model-axis placement and
    FSDP shards one of its remaining dimensions — yielding 2-D sharded
    weights like P('data', None, None, 'model').
    """
    n_shards = mesh.shape[axis_name]
    compiled = [(re.compile(pattern), spec) for pattern, spec in tp_rules]

    def spec_for(path, leaf):
        if leaf is None or not hasattr(leaf, "ndim"):
            return NamedSharding(mesh, P())
        path_str = jax.tree_util.keystr(path)
        for pattern, tp_spec in compiled:
            if pattern.search(path_str):
                # Truncate as well as pad: optimizer state can mirror a param
                # path at reduced rank (e.g. factored second moments), and an
                # over-long spec would fail device_put with a rank mismatch.
                entries = (list(tp_spec) + [None] * leaf.ndim)[: leaf.ndim]
                taken = tuple(d for d, e in enumerate(entries)
                              if e is not None)
                dp = fsdp_spec(leaf.shape, n_shards, axis_name, min_size,
                               taken=taken)
                merged = [e if e is not None else dp[d] if d < len(dp)
                          else None for d, e in enumerate(entries)]
                return NamedSharding(mesh, P(*merged))
        return NamedSharding(
            mesh, fsdp_spec(leaf.shape, n_shards, axis_name, min_size))

    return jax.tree_util.tree_map_with_path(spec_for, tree,
                                            is_leaf=lambda x: x is None)


def shard_tree_fsdp(tree, mesh: Mesh, axis_name: str = DATA_AXIS,
                    min_size: int = DEFAULT_MIN_SIZE, tp_rules=()):
    """Places ``tree`` on the mesh with FSDP shardings."""
    shardings = fsdp_shardings(tree, mesh, axis_name, min_size, tp_rules)
    return jax.tree_util.tree_map(
        lambda x, s: x if x is None else jax.device_put(x, s),
        tree, shardings, is_leaf=lambda x: x is None)


def fsdp_jit_train_step(train_step, params, opt_state, mesh: Mesh,
                        axis_name: str = DATA_AXIS,
                        min_size: int = DEFAULT_MIN_SIZE, tp_rules=(),
                        donate: bool = True, batch_spec=None):
    """Jits ``train_step(params, opt_state, batch) -> (params, opt_state,
    aux)`` with FSDP in/out shardings on the state and the batch sharded over
    ``axis_name``.

    The returned function expects (and returns) params/opt_state laid out per
    :func:`fsdp_shardings` — place them once with :func:`shard_tree_fsdp`
    before the first call. ``aux`` comes back replicated. Donation recycles
    the old state buffers, so peak memory stays at ~one sharded copy.

    ``batch_spec`` overrides the batch PartitionSpec (default
    ``P(axis_name)``) — pass ``P(('replica', 'data'))`` for hybrid sharded
    data parallelism (HSDP): gradients sum over both axes while the state
    shards only over ``axis_name``.
    """
    state_in = (fsdp_shardings(params, mesh, axis_name, min_size, tp_rules),
                fsdp_shardings(opt_state, mesh, axis_name, min_size, tp_rules))
    batch_sharding = NamedSharding(
        mesh, P(axis_name) if batch_spec is None else batch_spec)
    return jax.jit(
        train_step,
        in_shardings=(*state_in, batch_sharding),
        out_shardings=(*state_in, NamedSharding(mesh, P())),
        donate_argnums=(0, 1) if donate else ())
