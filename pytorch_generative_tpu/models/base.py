"""Base classes for generative models.

Parity surface: /root/reference/pytorch_generative/models/base.py. Divergences
(TPU-native by design):
  * Images are NHWC; ``in_shape`` is ``(h, w, c)`` passed at construction instead
    of being captured as buffers on first forward (jit needs static shapes; the
    shape round-trips through checkpoints because reproduce() rebuilds the model
    from the same config).
  * RNG is explicit: ``sample(rng, ...)`` takes a jax.random key.
  * The autoregressive sampler is a single jitted ``lax.scan`` over the H*W pixel
    sequence (one compiled forward reused every step) instead of a Python loop of
    H*W eager forwards (base.py:97-120) — the conditional-inpainting contract
    (pixels >= 0 in ``conditioned_on`` are preserved; only pixels < 0 are sampled)
    is preserved exactly.
"""

from __future__ import annotations

import abc
import functools

import jax
import jax.numpy as jnp

from pytorch_generative_tpu import core


def _default_sample_fn(rng, logits):
    """Bernoulli(logits) sample, matching base.py:9-10."""
    return jax.random.bernoulli(rng, jax.nn.sigmoid(logits)).astype(logits.dtype)


def auto_reshape(fn):
    """Flattens NHWC image inputs to (N, H*W*C) before fn; reshapes back after.

    Lets vector models (NADE/MADE/NICE) transparently accept images
    (base.py:13-25).
    """

    @functools.wraps(fn)
    def wrapped_fn(self, x, *args, **kwargs):
        original_shape = x.shape
        x = x.reshape(original_shape[0], -1)
        y = fn(self, x, *args, **kwargs)
        return y.reshape(original_shape)

    return wrapped_fn


class GenerativeModel(core.Module):
    """Abstract base for all generative models.

    Subclass __init__ methods must call ``super().__init__(in_shape=...)`` (or set
    the fields directly) and implement ``forward`` and ``sample``.
    """

    in_shape: tuple = core.static_field()      # (h, w, c) of training images.
    sample_fn: object = core.static_field()    # fn(rng, logits) -> sample.

    def __init__(self, in_shape=None, sample_fn=None):
        self.in_shape = tuple(in_shape) if in_shape is not None else None
        self.sample_fn = sample_fn or _default_sample_fn

    # --- forward ---------------------------------------------------------
    def forward(self, x, *, rng=None, training=False):
        raise NotImplementedError

    def __call__(self, x, *, rng=None, training=False):
        return self.forward(x, rng=rng, training=training)

    def forward_with_state(self, x, *, rng=None, training=False):
        """Forward pass that also returns the (possibly updated) module.

        Models with non-gradient state (VQ-EMA codebooks) override this; all other
        models return themselves unchanged. The Trainer always routes through here.
        """
        return self.forward(x, rng=rng, training=training), self

    # --- sampling --------------------------------------------------------
    @abc.abstractmethod
    def sample(self, rng, n_samples):
        ...


class AutoregressiveModel(GenerativeModel):
    """Base class for autoregressive models: generic raster-scan sampling."""

    def _forward_logits(self, x):
        """Forward pass restricted to per-pixel logits. Models whose forward
        returns extra outputs (e.g. ImageGPTMoE's aux loss) override this so
        the generic sampler still applies."""
        return self.forward(x)

    def _get_conditioned_on(self, n_samples, conditioned_on):
        assert (n_samples is not None) or (conditioned_on is not None), (
            'Must provide one, and only one, of "n_samples" or "conditioned_on"')
        if conditioned_on is None:
            h, w, c = self.in_shape
            conditioned_on = -jnp.ones((n_samples, h, w, c), jnp.float32)
        return conditioned_on

    def sample(self, rng, n_samples=None, conditioned_on=None):
        """Generates samples pixel-by-pixel in raster order (jit-compatible).

        Args:
            rng: jax.random key.
            n_samples: Number of unconditional samples (mutually exclusive with
                conditioned_on).
            conditioned_on: (N, H, W, C) partial images; entries < 0 are sampled,
                entries >= 0 are kept (inpainting semantics of base.py:97-120).
        """
        conditioned_on = self._get_conditioned_on(n_samples, conditioned_on)
        n, h, w, c = conditioned_on.shape

        def step(canvas, inputs):
            idx, step_rng = inputs
            row, col = idx // w, idx % w
            out = self._forward_logits(canvas)
            logits = jax.lax.dynamic_slice(
                out, (0, row, col, 0), (n, 1, 1, out.shape[-1]))
            sampled = self.sample_fn(step_rng, logits.reshape(n, -1))
            sampled = sampled.reshape(n, 1, 1, c)
            current = jax.lax.dynamic_slice(canvas, (0, row, col, 0), (n, 1, 1, c))
            merged = jnp.where(current < 0, sampled, current)
            canvas = jax.lax.dynamic_update_slice(canvas, merged, (0, row, col, 0))
            return canvas, None

        idxs = jnp.arange(h * w)
        rngs = jax.random.split(rng, h * w)
        canvas, _ = jax.lax.scan(step, conditioned_on, (idxs, rngs))
        return canvas


class VariationalAutoEncoder(GenerativeModel):
    """Base class for VAEs: sample() = sample_fn(decode(prior sample))."""

    @abc.abstractmethod
    def _sample(self, rng, n_samples):
        ...

    def sample(self, rng, n_samples):
        prior_rng, out_rng = jax.random.split(rng)
        return self.sample_fn(out_rng, self._sample(prior_rng, n_samples))
