"""pytorch_generative_tpu: a TPU-native (JAX/XLA/Pallas) generative-modeling
framework with the full capability surface of EugenHotaj/pytorch-generative.

Top-level layout mirrors /root/reference/pytorch_generative/__init__.py
(datasets, debug, models, nn, trainer + conditional colab_utils), plus the
TPU-native subsystems: ops (functional kernels), parallel (mesh/shard_map
data parallelism), utils (checkpointing/metrics), core (the pytree module
system), and optim (optax optimizers).
"""

from pytorch_generative_tpu import (  # noqa: F401
    core,
    datasets,
    debug,
    models,
    nn,
    ops,
    optim,
    parallel,
    trainer,
    utils,
)

try:  # Display helpers need matplotlib; keep them optional like the reference.
    from pytorch_generative_tpu import colab_utils  # noqa: F401
except ModuleNotFoundError:  # pragma: no cover
    pass

__version__ = "0.1.0"
