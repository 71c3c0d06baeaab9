"""Optimizers as optax gradient transformations.

Includes a *working* AdaBelief — the reference's version crashes on its first
step() due to a tuple-unpacking bug (/root/reference/pytorch_generative/optim.py:45
unpacks `group["betas"], group["lr"]` into three names) — plus the Adam +
per-step multiplicative LR decay combo every reproduce() uses.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdaBeliefState(NamedTuple):
    count: jax.Array
    ema_avg: optax.Updates
    ema_var: optax.Updates


def adabelief(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-10) -> optax.GradientTransformation:
    """AdaBelief (Zhuang et al. 2020): Adam with gradient-variance second moment.

    Matches the reference algorithm (/root/reference/pytorch_generative/optim.py:
    ema_var tracks (g - ema_avg)^2 with an additive 1e-10, both moments are
    bias-corrected, and the step is lr * avg_hat / (sqrt(var_hat) + 1e-10)).
    """

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdaBeliefState(count=jnp.zeros([], jnp.int32), ema_avg=zeros(),
                              ema_var=zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        ema_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.ema_avg, updates)
        ema_var = jax.tree_util.tree_map(
            lambda v, g, m: b2 * v + (1 - b2) * (g - m) ** 2 + eps,
            state.ema_var, updates, ema_avg)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(count - 1) if callable(learning_rate) else learning_rate
        steps = jax.tree_util.tree_map(
            lambda m, v: -lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
            ema_avg, ema_var)
        return steps, AdaBeliefState(count=count, ema_avg=ema_avg, ema_var=ema_var)

    return optax.GradientTransformation(init_fn, update_fn)


def adam(learning_rate=1e-3, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """torch.optim.Adam-equivalent. Returns (transformation, lr_schedule_fn)."""
    schedule = learning_rate if callable(learning_rate) else (lambda _: learning_rate)
    return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps), schedule


def adam_multiplicative(learning_rate: float, lr_multiplier: float = 1.0,
                        b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Adam with per-*step* multiplicative LR decay: lr_t = lr * multiplier^t.

    The reference's reproduce() recipes pair torch.optim.Adam with
    lr_scheduler.MultiplicativeLR stepped per batch (e.g.
    /root/reference/pytorch_generative/models/autoregressive/pixel_cnn.py:156-157).
    Returns (transformation, lr_schedule_fn) so the Trainer can log the LR.
    """
    if lr_multiplier == 1.0:
        return adam(learning_rate, b1=b1, b2=b2, eps=eps)
    schedule = optax.exponential_decay(
        init_value=learning_rate, transition_steps=1, decay_rate=lr_multiplier)
    return optax.adam(schedule, b1=b1, b2=b2, eps=eps), schedule
