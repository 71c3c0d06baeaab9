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


def find_latest_epoch(log_dir: str) -> int:
    """Latest checkpoint epoch in log_dir, or raises FileNotFoundError."""
    files = glob.glob(os.path.join(log_dir, CHECKPOINT_PATTERN))
    epochs = sorted(int(re.findall(r"\d+", os.path.basename(f))[0]) for f in files)
    if not epochs:
        raise FileNotFoundError(f"No checkpoints found in {log_dir}.")
    print(f"Found {len(epochs)} saved checkpoints.")
    return epochs[-1]
