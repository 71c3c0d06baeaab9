"""Drive the NLL evaluation utilities and check them against the reference.

The reference's quality tables report NLL in nats on binarized MNIST and
bits/dim for NICE (/root/reference/README.md:177-211). On a zero-egress box
the tables themselves are unreachable, but the *measurement pipeline* is
checkable: train identically-initialized models in both frameworks on the same
synthetic data, then assert both frameworks' example-weighted eval NLL agrees
— so when real data is present, this framework's reported nats are the
reference's nats.
"""

import jax
import numpy as np
import torch
import torch.nn.functional as F

from tests import _reference_compat as compat
from tests import test_reference_parity as parity
from tests.test_training_parity import (
    _bce_jax,
    _bce_torch,
    _batches,
    _train_ours,
    _train_theirs,
)

from pytorch_generative_tpu import models
from pytorch_generative_tpu.utils import evaluation

ref = compat.load_reference()

KEY = jax.random.PRNGKey(3)


def test_eval_nll_matches_reference_after_training():
    """Train both frameworks 8 identical steps, then compare the
    example-weighted eval NLL (nats) computed by utils/evaluation.py against
    a plain torch eval loop — the number the quality tables are made of."""
    ours = models.PixelCNN(KEY, in_channels=1, out_channels=1, n_residual=1,
                           residual_channels=4, head_channels=4,
                           in_shape=(8, 8, 1))
    theirs = ref.models.PixelCNN(in_channels=1, out_channels=1, n_residual=1,
                                 residual_channels=4, head_channels=4)
    parity.copy_pixel_cnn(ours, theirs)

    train_batches = _batches(8, (4, 8, 8, 1), seed=0)
    _, trained = _train_ours(ours, _bce_jax, train_batches, lr=1e-3,
                             return_model=True)
    _train_theirs(theirs, _bce_torch, train_batches, lr=1e-3)

    eval_batches = _batches(4, (8, 8, 8, 1), seed=99)
    loader = [(x, None) for x in eval_batches]

    got = evaluation.evaluate_loss(trained, lambda x, _, p: _bce_jax(x, p),
                                   loader)["loss"]

    theirs.eval()
    with torch.no_grad():
        total, n_total = 0.0, 0
        for x in eval_batches:
            xt = compat.to_torch_nchw(x)
            nll = F.binary_cross_entropy_with_logits(
                theirs(xt).reshape(x.shape[0], -1),
                xt.reshape(x.shape[0], -1), reduction="none").sum(1).mean()
            total += float(nll) * x.shape[0]
            n_total += x.shape[0]
    want = total / n_total

    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_nats_to_bits_per_dim_reference_conversion():
    """The NICE conversion must be the reference's exact formula
    (README.md:206-207): (nll/784 + log 256) / log 2."""
    import math

    nll = 1234.5
    got = evaluation.nats_to_bits_per_dim(nll, 784, dequantized=True)
    want = (nll / 784 + math.log(256.0)) / math.log(2.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # Binarized models: plain nats -> bits conversion.
    got = evaluation.nats_to_bits_per_dim(80.0, 784)
    np.testing.assert_allclose(got, 80.0 / 784 / math.log(2.0), rtol=1e-12)
