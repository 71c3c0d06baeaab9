"""Metrics logging: JSONL always; TensorBoard when available.

Replicates the reference Trainer's observability channels
(/root/reference/pytorch_generative/trainer.py:93, 159-163, 244-265): scalar tags
``metrics/<key>`` (train/eval sub-tags), ``metrics/lr``, ``speed/*``, and sample
image grids, plus purge-after-restore semantics (purge_step).
"""

from __future__ import annotations

import json
import os

import numpy as np

try:
    from torch.utils.tensorboard import SummaryWriter as _TBWriter
except Exception:  # pragma: no cover - tensorboard optional
    _TBWriter = None


class MetricsWriter:
    """Writes scalars/images to metrics.jsonl and (optionally) TensorBoard."""

    def __init__(self, log_dir: str, purge_step: int | None = None,
                 use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl_path = os.path.join(log_dir, "metrics.jsonl")
        if purge_step is not None and os.path.exists(self._jsonl_path):
            self._purge(purge_step)
        self._jsonl = open(self._jsonl_path, "a")
        self._tb = None
        if use_tensorboard and _TBWriter is not None:
            try:
                self._tb = _TBWriter(log_dir, max_queue=100, purge_step=purge_step)
            except Exception:
                self._tb = None

    def _purge(self, purge_step: int):
        """Drops JSONL records with step >= purge_step (stale after a restore)."""
        with open(self._jsonl_path) as f:
            lines = f.readlines()
        kept = []
        for line in lines:
            try:
                if json.loads(line).get("step", 0) < purge_step:
                    kept.append(line)
            except json.JSONDecodeError:
                continue
        with open(self._jsonl_path, "w") as f:
            f.writelines(kept)

    def add_scalar(self, tag: str, value, step: int):
        record = {"tag": tag, "value": float(value), "step": int(step)}
        self._jsonl.write(json.dumps(record) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_scalars(self, tag: str, values: dict, step: int):
        record = {"tag": tag, "step": int(step)}
        record.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        if self._tb is not None:
            self._tb.add_scalars(tag, {k: float(v) for k, v in values.items()}, step)

    def add_images(self, tag: str, images, step: int):
        """Logs an NHWC uint8/float batch of images as a grid."""
        images = np.asarray(images)
        if self._tb is not None:
            self._tb.add_images(tag, images, step, dataformats="NHWC")
        # Always persist a grid as .npy so samples survive without TensorBoard.
        path = os.path.join(self.log_dir, f"{tag.replace('/', '_')}_{step}.npy")
        np.save(path, images)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
