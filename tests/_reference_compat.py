"""Helpers for loading the PyTorch reference in this environment and copying
weights between the two frameworks (for numerical-parity tests).

The reference imports torchvision/PIL/sklearn at module scope; none are
installed, so they are stubbed before import (the parity tests never touch the
data paths)."""

from __future__ import annotations

import importlib.machinery
import sys
import types

import numpy as np
import torch

_REFERENCE_PATH = "/root/reference"


def _stub(name):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def load_reference():
    """Imports and returns the reference `pytorch_generative` package."""
    for name in ["torchvision", "torchvision.datasets",
                 "torchvision.transforms", "torchvision.datasets.utils",
                 "torchvision.datasets.vision", "PIL", "sklearn",
                 "sklearn.datasets"]:
        _stub(name)
    sys.modules["PIL"].Image = _stub("PIL.Image")
    sys.modules["PIL"].__version__ = "10.0.0"
    tvd = sys.modules["torchvision.datasets"]
    tvd.utils = sys.modules["torchvision.datasets.utils"]
    tvd.vision = sys.modules["torchvision.datasets.vision"]
    sys.modules["torchvision.datasets.vision"].VisionDataset = object
    sys.modules["torchvision"].datasets = tvd
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    import pytorch_generative  # noqa: PLC0415

    return pytorch_generative


# ---------------------------------------------------------------------------
# Weight copying: ours (NHWC / HWIO / (in,out) linears) -> torch modules.
# ---------------------------------------------------------------------------

def copy_conv(ours, theirs: torch.nn.Conv2d):
    # HWIO -> OIHW.
    w = np.asarray(ours.weight).transpose(3, 2, 0, 1)
    theirs.weight.data = torch.tensor(w)
    if ours.bias is not None:
        theirs.bias.data = torch.tensor(np.asarray(ours.bias))


def copy_linear(ours, theirs: torch.nn.Linear):
    theirs.weight.data = torch.tensor(np.asarray(ours.weight).T)
    if ours.bias is not None:
        theirs.bias.data = torch.tensor(np.asarray(ours.bias))


def copy_layernorm(ours, theirs: torch.nn.LayerNorm):
    theirs.weight.data = torch.tensor(np.asarray(ours.scale))
    theirs.bias.data = torch.tensor(np.asarray(ours.offset))


def to_torch_nchw(x_nhwc) -> torch.Tensor:
    return torch.tensor(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def from_torch_nchw(t: torch.Tensor) -> np.ndarray:
    return t.detach().permute(0, 2, 3, 1).contiguous().numpy()
