"""Checkpoint serialization for pytree state (model + optimizer + counters).

Same observable semantics as the reference Trainer's torch.save checkpoints
(/root/reference/pytorch_generative/trainer.py:98-148): epoch-suffixed files named
``trainer_state_{epoch}.ckpt``, latest-epoch discovery by filename regex, full
state restore. Format: a single .npz of flattened pytree leaves plus a JSON
metadata blob (no pickle — safe to load).
"""

from __future__ import annotations

import glob
import json
import os
import re

import jax
import numpy as np

CHECKPOINT_PATTERN = "trainer_state_[0-9]*.ckpt"


def save_checkpoint(path: str, tree, metadata: dict | None = None):
    """Saves a pytree (arrays only at the leaves) and JSON metadata to `path`."""
    leaves = jax.tree_util.tree_leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__metadata__"] = np.frombuffer(
        json.dumps(metadata or {}).encode("utf-8"), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def restore_checkpoint(path: str, template):
    """Restores a pytree saved by :func:`save_checkpoint`.

    Args:
        path: Checkpoint file.
        template: A pytree with the same structure as the saved one; its treedef
            is used to unflatten (arrays in the template are ignored).
    Returns:
        (tree, metadata) tuple.
    """
    with np.load(path) as data:
        metadata = json.loads(bytes(data["__metadata__"]).decode("utf-8"))
        n = len([k for k in data.files if k.startswith("leaf_")])
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    template_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(template_leaves) != len(leaves):
        raise ValueError(
            f"Checkpoint has {len(leaves)} leaves but template has "
            f"{len(template_leaves)} — model/optimizer architecture mismatch.")
    restored = []
    for saved, tmpl in zip(leaves, template_leaves):
        if hasattr(tmpl, "dtype"):
            saved = saved.astype(tmpl.dtype)
        restored.append(saved)
    return jax.tree_util.tree_unflatten(treedef, restored), metadata


# ---------------------------------------------------------------------------
# Sharded (ZeRO-3) checkpoints: never gather the full state on one host.
#
# Under FSDP each large leaf is a GSPMD-sharded jax.Array; ``jax.device_get``
# of the whole tree would reassemble every shard into a single full-size host
# allocation, defeating the ZeRO-3 memory story at any scale where FSDP
# matters. Instead each device's shards are written to
# ``{path}.shard{device_id}.npz`` (host copies are shard-sized only) and
# ``path`` holds a JSON index; restore places each shard directly back onto
# its device via ``jax.make_array_from_single_device_arrays``.
# ---------------------------------------------------------------------------

def _shard_slices(shard, shape):
    """Serializes a shard's global-slice index as [[start, stop], ...]."""
    out = []
    for sl, dim in zip(shard.index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append([start, stop])
    return out


def snapshot_sharded(tree):
    """Copies a sharded pytree to host, shard by shard (no full-size buffer).

    Returns an opaque payload for :func:`write_sharded` — split out so the
    (cheap, shard-sized) device reads happen synchronously before buffers can
    be donated to the next train step, while file writes may run on a
    background thread.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    per_device, entries = {}, []
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_replicated:
            shards = []
            for s in leaf.addressable_shards:
                per_device.setdefault(int(s.device.id), {})[
                    f"leaf_{i}"] = np.asarray(s.data)
                shards.append({"device": int(s.device.id),
                               "index": _shard_slices(s, leaf.shape)})
            entries.append({"kind": "sharded", "shape": list(leaf.shape),
                            "dtype": str(leaf.dtype), "shards": shards})
        else:
            per_device.setdefault("rep", {})[f"leaf_{i}"] = np.asarray(leaf)
            entries.append({"kind": "replicated"})
    return {"per_device": per_device, "entries": entries}


def write_sharded(path: str, payload, metadata: dict | None = None):
    """Writes a :func:`snapshot_sharded` payload (tmp+rename per file)."""
    for dev, arrays in payload["per_device"].items():
        shard_path = f"{path}.shard{dev}.npz"
        with open(shard_path + ".tmp", "wb") as f:
            np.savez(f, **arrays)
        os.replace(shard_path + ".tmp", shard_path)
    index = {"format": "pgt-sharded-ckpt-v1", "metadata": metadata or {},
             "leaves": payload["entries"],
             "devices": sorted(str(d) for d in payload["per_device"])}
    with open(path + ".tmp", "w") as f:
        json.dump(index, f)
    os.replace(path + ".tmp", path)


def save_checkpoint_sharded(path: str, tree, metadata: dict | None = None):
    """Sharded save (see module comment): snapshot + write in one call."""
    write_sharded(path, snapshot_sharded(tree), metadata)


def is_sharded_checkpoint(path: str) -> bool:
    """True when ``path`` is a sharded-checkpoint JSON index (not an npz)."""
    with open(path, "rb") as f:
        return f.read(1) == b"{"


def restore_checkpoint_sharded(path: str, template):
    """Restores a sharded checkpoint directly onto the template's devices.

    Args:
        path: The JSON index written by :func:`save_checkpoint_sharded`.
        template: A pytree of *live, already-sharded* arrays (e.g. the
            Trainer's current state): supplies the treedef, target shardings,
            and dtypes. The target sharding's device->slice mapping must match
            the saved one (same mesh layout across save/restore).
    Returns:
        (tree, metadata); no full-size host allocation is made for sharded
        leaves — each shard goes straight to its device.
    """
    with open(path) as f:
        index = json.load(f)
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(index["leaves"]):
        raise ValueError(
            f"Checkpoint has {len(index['leaves'])} leaves but template has "
            f"{len(t_leaves)} — model/optimizer architecture mismatch.")
    files = {}

    def shard_file(dev):
        if dev not in files:
            files[dev] = np.load(f"{path}.shard{dev}.npz")
        return files[dev]

    restored = []
    for i, (entry, tmpl) in enumerate(zip(index["leaves"], t_leaves)):
        if entry["kind"] == "sharded":
            if not isinstance(tmpl, jax.Array):
                raise ValueError(
                    f"leaf {i} was saved sharded but the template leaf is "
                    f"{type(tmpl)} — restore with the same FSDP/mesh config.")
            saved = {s["device"]: s["index"] for s in entry["shards"]}
            bufs = []
            for s in tmpl.addressable_shards:
                dev = int(s.device.id)
                if dev not in saved:
                    raise ValueError(
                        f"leaf {i}: no saved shard for device {dev} — the "
                        f"mesh layout changed between save and restore.")
                if saved[dev] != _shard_slices(s, tuple(entry["shape"])):
                    raise ValueError(
                        f"leaf {i}: device {dev}'s shard covers "
                        f"{_shard_slices(s, tuple(entry['shape']))} now but "
                        f"{saved[dev]} was saved — the sharding layout "
                        f"changed between save and restore.")
                data = shard_file(dev)[f"leaf_{i}"].astype(tmpl.dtype)
                bufs.append(jax.device_put(data, s.device))
            restored.append(jax.make_array_from_single_device_arrays(
                tuple(entry["shape"]), tmpl.sharding, bufs))
        else:
            data = shard_file("rep")[f"leaf_{i}"]
            if hasattr(tmpl, "dtype"):
                data = data.astype(tmpl.dtype)
            if isinstance(tmpl, jax.Array):
                data = jax.device_put(data, tmpl.sharding)
            restored.append(data)
    return jax.tree_util.tree_unflatten(treedef, restored), index["metadata"]


def find_latest_epoch(log_dir: str) -> int:
    """Latest checkpoint epoch in log_dir, or raises FileNotFoundError."""
    files = glob.glob(os.path.join(log_dir, CHECKPOINT_PATTERN))
    epochs = sorted(int(re.findall(r"\d+", os.path.basename(f))[0]) for f in files)
    if not epochs:
        raise FileNotFoundError(f"No checkpoints found in {log_dir}.")
    print(f"Found {len(epochs)} saved checkpoints.")
    return epochs[-1]
