"""Functional ops: masks, attention math, VQ search, initializers, samplers.

jnp implementations define semantics; Pallas kernels (``*_pallas``) provide fused
TPU fast paths and are numerics-tested against the jnp versions.
"""

from pytorch_generative_tpu.ops import attention, init, masks, vq  # noqa: F401
