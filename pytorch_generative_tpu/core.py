"""A tiny pytree-native module system — the functional substrate of the framework.

Design (TPU-first, idiomatic JAX):
  * A ``Module`` is an immutable dataclass registered as a JAX pytree. Array-valued
    fields (and nested Modules) are pytree *children*; configuration fields declared
    with ``static_field()`` live in the treedef (hashable aux data), so passing a
    Module through ``jax.jit`` specializes the compiled program on its architecture
    while its arrays remain traced values.
  * There is no lazy shape inference and no in-place mutation: parameters are built
    eagerly in ``__init__`` from explicit shapes + an RNG key, and "mutable state"
    (e.g. VQ-EMA codebooks) is expressed by returning an *updated copy* of the module
    (``module.replace(...)``) from the forward pass.
  * ``partition``/``combine`` split a module into (trainable, non-trainable) halves so
    ``jax.grad`` differentiates only true parameters. Non-trainable arrays are
    declared with ``buffer_field()`` (masks, EMA statistics, constants).

This replaces the reference's torch.nn.Module/state_dict machinery
(/root/reference/pytorch_generative/models/base.py) with a functional design that
composes with jit/grad/vmap/shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

_STATIC = "pgt_static"
_BUFFER = "pgt_buffer"
_STATE = "pgt_state"


def field(*, static: bool = False, buffer: bool = False, state: bool = False,
          **kwargs):
    """Declares a Module dataclass field.

    Args:
        static: If True the field is architecture/config data stored in the pytree
            treedef (must be hashable); it is invisible to jit tracing and grad.
        buffer: If True the field holds non-trainable arrays (pytree children that
            `partition` routes to the non-trainable half).
        state: If True the field is a *stateful* buffer (accumulated statistics
            like VQ-EMA cluster sizes) that must keep full precision: mixed-
            precision casts (:func:`cast_floating`) leave it untouched. Implies
            buffer.
    """
    metadata = dict(kwargs.pop("metadata", None) or {})
    metadata[_STATIC] = static
    metadata[_BUFFER] = buffer or state
    metadata[_STATE] = state
    return dataclasses.field(metadata=metadata, **kwargs)


def static_field(**kwargs):
    return field(static=True, **kwargs)


def buffer_field(**kwargs):
    return field(buffer=True, **kwargs)


def state_field(**kwargs):
    """A stateful buffer (EMA statistics etc.) exempt from compute-dtype casts."""
    return field(state=True, **kwargs)


def _is_static(f: dataclasses.Field) -> bool:
    return bool(f.metadata.get(_STATIC, False))


def _is_buffer(f: dataclasses.Field) -> bool:
    return bool(f.metadata.get(_BUFFER, False))


def _is_state(f: dataclasses.Field) -> bool:
    return bool(f.metadata.get(_STATE, False))


class Module:
    """Base class for all modules. Subclasses become dataclass pytrees.

    Subclasses declare fields as class annotations and may define a custom
    ``__init__`` (the dataclass decorator does not overwrite an explicit one).
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        # init=False: modules always define (or inherit) an explicit __init__;
        # dataclass only supplies field introspection for the pytree machinery.
        dataclasses.dataclass(cls, init=False, eq=False, repr=False)

        fields = dataclasses.fields(cls)
        child_names = tuple(f.name for f in fields if not _is_static(f))
        static_names = tuple(f.name for f in fields if _is_static(f))
        cls._child_fields = child_names
        cls._static_fields = static_names
        cls._buffer_fields = frozenset(
            f.name for f in fields if _is_buffer(f) and not _is_static(f)
        )
        cls._state_fields = frozenset(
            f.name for f in fields if _is_state(f) and not _is_static(f)
        )

        def flatten_with_keys(obj):
            children = tuple(
                (jax.tree_util.GetAttrKey(name), getattr(obj, name))
                for name in cls._child_fields
            )
            aux = tuple(getattr(obj, name) for name in cls._static_fields)
            return children, aux

        def flatten(obj):
            children = tuple(getattr(obj, name) for name in cls._child_fields)
            aux = tuple(getattr(obj, name) for name in cls._static_fields)
            return children, aux

        def unflatten(aux, children):
            obj = object.__new__(cls)
            for name, value in zip(cls._child_fields, children):
                object.__setattr__(obj, name, value)
            for name, value in zip(cls._static_fields, aux):
                object.__setattr__(obj, name, value)
            return obj

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten
        )

    def replace(self, **updates) -> "Module":
        """Returns a copy of this module with the given fields replaced."""
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        for name, value in updates.items():
            if name not in {f.name for f in dataclasses.fields(type(self))}:
                raise AttributeError(f"{type(self).__name__} has no field {name!r}")
            object.__setattr__(new, name, value)
        return new

    def __repr__(self):
        cls = type(self)
        parts = []
        for f in dataclasses.fields(cls):
            v = getattr(self, f.name, None)
            if isinstance(v, (jax.Array, np.ndarray)):
                parts.append(f"{f.name}={v.dtype}{list(v.shape)}")
            else:
                parts.append(f"{f.name}={v!r}")
        return f"{cls.__name__}({', '.join(parts)})"


def _is_module(x) -> bool:
    return isinstance(x, Module)


def _partition_value(value: Any, in_buffer: bool):
    """Recursively splits `value` into (trainable, non_trainable) halves.

    Excluded leaves become None (an empty pytree node), so both halves share one
    treedef when traversed with ``is_leaf=lambda x: x is None`` — the equinox trick.
    """
    if isinstance(value, Module):
        cls = type(value)
        train_kw, rest_kw = {}, {}
        for name in cls._child_fields:
            buf = in_buffer or (name in cls._buffer_fields)
            t, r = _partition_value(getattr(value, name), buf)
            train_kw[name] = t
            rest_kw[name] = r
        statics = {name: getattr(value, name) for name in cls._static_fields}

        def build(child_kw):
            obj = object.__new__(cls)
            for k, v in child_kw.items():
                object.__setattr__(obj, k, v)
            for k, v in statics.items():
                object.__setattr__(obj, k, v)
            return obj

        return build(train_kw), build(rest_kw)
    if isinstance(value, (list, tuple)):
        pairs = [_partition_value(v, in_buffer) for v in value]
        mk = type(value)
        if pairs:
            t, r = zip(*pairs)
        else:
            t, r = (), ()
        return mk(t), mk(r)
    if isinstance(value, dict):
        keys = list(value.keys())
        t, r = {}, {}
        for k in keys:
            t[k], r[k] = _partition_value(value[k], in_buffer)
        return t, r
    # Leaf (array or None or scalar).
    if value is None:
        return None, None
    if in_buffer:
        return None, value
    return value, None


def partition(module):
    """Splits a module pytree into (params, rest).

    ``params`` holds trainable arrays, ``rest`` holds buffer arrays; each half has
    None where the other half's leaves live. Recombine with :func:`combine`.
    """
    return _partition_value(module, in_buffer=False)


def _none_merge(a, b):
    return b if a is None else a


def combine(*trees):
    """Merges partitioned halves back into one pytree (None-aware)."""
    return jax.tree_util.tree_map(
        lambda *vals: _none_merge_many(vals), *trees, is_leaf=lambda x: x is None
    )


def _none_merge_many(vals):
    for v in vals:
        if v is not None:
            return v
    return None


def n_parameters(module) -> int:
    """Total number of trainable scalar parameters."""
    params, _ = partition(module)
    return sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "shape")
    )


def cast_floating(value: Any, dtype, cast_state: bool = False):
    """Casts floating-point arrays in a module tree to ``dtype``.

    Stateful buffers (declared with :func:`state_field`, e.g. VQ-EMA cluster
    statistics) are left in their stored precision unless ``cast_state=True``:
    they accumulate across the whole run, so casting them to a 16-bit compute
    dtype would compound rounding error step over step. Everything else —
    parameters, constant buffers like causality masks (binary, hence exact in
    bfloat16) and positional encodings — is cast for MXU-native compute.
    """
    import jax.numpy as jnp

    def cast_leaf(x):
        if x is not None and hasattr(x, "dtype") and \
                jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    def walk(v, skip):
        if isinstance(v, Module):
            cls = type(v)
            new = object.__new__(cls)
            for name in cls._child_fields:
                child_skip = skip or (not cast_state
                                      and name in cls._state_fields)
                object.__setattr__(new, name, walk(getattr(v, name), child_skip))
            for name in cls._static_fields:
                object.__setattr__(new, name, getattr(v, name))
            return new
        if isinstance(v, (list, tuple)):
            return type(v)(walk(item, skip) for item in v)
        if isinstance(v, dict):
            return {k: walk(item, skip) for k, item in v.items()}
        return v if skip else cast_leaf(v)

    return walk(value, skip=False)


def tree_equal(a, b) -> bool:
    """True if two pytrees have identical structure and allclose leaves."""
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    if ta != tb or len(la) != len(lb):
        return False
    return all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))
