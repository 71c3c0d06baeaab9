from pytorch_generative_tpu.utils import (  # noqa: F401
    checkpoint,
    evaluation,
    metrics,
)
