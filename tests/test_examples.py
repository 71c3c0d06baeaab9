"""Smoke tests: the examples/ scripts run end-to-end (tiny configs, CPU).

The examples are the repo's user-facing quickstarts (examples/train_mnist.py
mirrors the reference's README training loop, train.py:1-138 CLI style;
examples/train_production.py is the kitchen-sink scaling config) — these
tests pin that both actually execute: train, checkpoint, evaluate, sample.
"""

import argparse
import importlib.util
import os

import pytest


def _load_example(name):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"examples_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_train_mnist_example_tiny(tmp_path):
    mod = _load_example("train_mnist")
    mod.main(argparse.Namespace(
        synthetic=True, epochs=1, batch_size=64, devices=1,
        logdir=str(tmp_path), tiny=True))
    assert (tmp_path / "metrics.jsonl").exists()
    assert any(p.suffix == ".ckpt" for p in tmp_path.iterdir())


@pytest.mark.parametrize("devices", [1, 2])
def test_train_production_example_tiny(tmp_path, devices):
    mod = _load_example("train_production")
    mod.main(argparse.Namespace(
        synthetic=True, epochs=1, batch_size=64, grad_accumulation=2,
        devices=devices, logdir=str(tmp_path), tiny=True))
    assert (tmp_path / "metrics.jsonl").exists()
