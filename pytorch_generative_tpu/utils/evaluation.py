"""Likelihood evaluation utilities (nats / bits-per-dim, reference formulas).

The reference reports NLL in nats on dynamically binarized MNIST and converts
NICE's dequantized-MNIST NLL to bits/dim as ``(nll / 784 + log 256) / log 2``
(/root/reference/README.md:206-207). These helpers reproduce those numbers from
a trained model + eval loader, example-weighted exactly like the Trainer's eval
loop (trainer.py:269-277).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_loss(model, loss_fn, loader, seed: int = 0) -> dict:
    """Example-weighted mean of loss_fn metrics over a loader (eval mode)."""

    @jax.jit
    def eval_step(model, x, rng):
        preds, _ = model.forward_with_state(x, rng=rng, training=False)
        metrics = loss_fn(x, None, preds)
        if not isinstance(metrics, dict):
            metrics = {"loss": metrics}
        return metrics

    rng = jax.random.PRNGKey(seed)
    total, n_total = {}, 0
    for x, _ in loader:
        x = jnp.asarray(np.asarray(x, np.float32))
        rng, sub = jax.random.split(rng)
        metrics = jax.device_get(eval_step(model, x, sub))
        n = x.shape[0]
        n_total += n
        for k, v in metrics.items():
            total[k] = total.get(k, 0.0) + float(v) * n
    return {k: v / max(n_total, 1) for k, v in total.items()}


def nats_to_bits_per_dim(nll_nats: float, n_dims: int,
                         dequantized: bool = False) -> float:
    """Converts an NLL in nats to bits per dimension.

    With ``dequantized=True`` applies the reference's NICE conversion for
    models trained on (x*255 + u)/256 inputs: (nll/n_dims + log 256) / log 2.
    """
    per_dim = nll_nats / n_dims
    if dequantized:
        per_dim = per_dim + math.log(256.0)
    return per_dim / math.log(2.0)
